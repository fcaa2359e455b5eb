"""Borůvka spanning forest + distributed maximal matching vs the reference.

The reference is the golden oracle (conftest): with all-distinct weights
the MSF is unique, so edge sets must match Kruskal's exactly; matchings
are validated with the reference's own ``is_maximal_matching``.
"""

import random

import networkx as nx
import pytest

from networkx_spark.algorithms.mst import (maximal_matching,
                                           maximum_spanning_edges,
                                           minimum_spanning_edges,
                                           minimum_spanning_tree)
from networkx_spark.graph import Graph


def _wgraph(seed, n=40, p=0.12, components=1):
    """Seeded random weighted graph with all-distinct weights."""
    rng = random.Random(seed)
    G = nx.Graph()
    weights = rng.sample(range(1, 100_000), k=10_000)
    w = iter(weights)
    for c in range(components):
        off = c * n
        G.add_nodes_from(range(off, off + n))
        for u in range(off, off + n):
            for v in range(u + 1, off + n):
                if rng.random() < p:
                    G.add_edge(u, v, weight=next(w))
        # ensure each block is connected so "forest" vs "tree" is exercised
        nodes = list(range(off, off + n))
        for u, v in zip(nodes, nodes[1:]):
            if not G.has_edge(u, v):
                G.add_edge(u, v, weight=next(w))
    return G


def _spark_graph(spark, G):
    return Graph.from_edge_list(
        spark, [(u, v, d["weight"]) for u, v, d in G.edges(data=True)],
        directed=False, nodes=list(G.nodes))


def _edge_set(df):
    return {(min(r.src, r.dst), max(r.src, r.dst), r.weight)
            for r in df.collect()}


def _ref_set(G, maximum=False):
    fn = nx.maximum_spanning_edges if maximum else nx.minimum_spanning_edges
    return {(str(min(u, v, key=str)), str(max(u, v, key=str)), float(d["weight"]))
            for u, v, d in fn(G, algorithm="kruskal", data=True)}


@pytest.mark.parametrize("seed", [1, 7])
def test_msf_matches_reference(spark, seed):
    G = _wgraph(seed, components=2)
    got = _edge_set(minimum_spanning_edges(_spark_graph(spark, G)))
    assert got == _ref_set(G)


def test_maximum_spanning_matches_reference(spark):
    G = _wgraph(3)
    got = _edge_set(maximum_spanning_edges(_spark_graph(spark, G)))
    assert got == _ref_set(G, maximum=True)


def test_mst_tree_shape(spark):
    G = _wgraph(5)
    t = minimum_spanning_tree(_spark_graph(spark, G))
    assert t.edges.count() == G.number_of_nodes() - 1
    assert t.vertices().count() == G.number_of_nodes()
    # total weight equals the reference's
    ref = sum(d["weight"] for _, _, d in
              nx.minimum_spanning_tree(G).edges(data=True))
    got = sum(w for _, _, w in _edge_set(t.edges))
    assert got == pytest.approx(ref)


def test_mst_directed_raises(spark):
    g = Graph.from_edge_list(spark, [(1, 2)], directed=True)
    with pytest.raises(ValueError):
        minimum_spanning_edges(g)


def test_mst_selfloop_ignored(spark):
    g = Graph.from_edge_list(spark, [(1, 1, 5.0), (1, 2, 2.0)], directed=False)
    got = _edge_set(minimum_spanning_edges(g))
    assert got == {("1", "2", 2.0)}


@pytest.mark.parametrize("seed", [2, 11])
def test_maximal_matching_valid(spark, seed):
    G = _wgraph(seed, n=30, p=0.15)
    rows = maximal_matching(_spark_graph(spark, G)).collect()
    m = {(int(r.src), int(r.dst)) for r in rows}
    Gi = nx.relabel_nodes(G, {n: int(n) for n in G.nodes})
    assert nx.is_matching(Gi, m)
    assert nx.is_maximal_matching(Gi, m)


def test_maximal_matching_deterministic(spark):
    G = _wgraph(4, n=25, p=0.2)
    g = _spark_graph(spark, G)
    a = {(r.src, r.dst) for r in maximal_matching(g).collect()}
    b = {(r.src, r.dst) for r in maximal_matching(g).collect()}
    assert a == b and a

"""Minors + Prüfer coding vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.operators.minors import (
    contracted_edge, contracted_nodes, quotient_graph)
from networkx_spark.algorithms.tree_coding import (
    from_prufer_sequence, to_prufer_sequence)


def _edges(g):
    out = set()
    for r in g.edges.collect():
        a, b = r["src"], r["dst"]
        out.add((a, b) if g.directed else tuple(sorted((a, b))))
    return out


def _nx_edges(H, directed):
    out = set()
    for u, v in H.edges:
        u, v = str(u), str(v)
        out.add((u, v) if directed else tuple(sorted((u, v))))
    return out


def test_contracted_nodes(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    G = nx.Graph(edges)
    for sl in (True, False):
        got = contracted_nodes(g, 1, 3, self_loops=sl)
        want = nx.contracted_nodes(G, 1, 3, self_loops=sl)
        assert _edges(got) == _nx_edges(want, False), sl
    # directed
    gd = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    Gd = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    got = contracted_nodes(gd, 0, 2, self_loops=True)
    want = nx.contracted_nodes(Gd, 0, 2, self_loops=True)
    assert _edges(got) == _nx_edges(want, True)


def test_contracted_edge(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    G = nx.Graph(edges)
    got = contracted_edge(g, (0, 1), self_loops=False)
    want = nx.contracted_edge(G, (0, 1), self_loops=False)
    assert _edges(got) == _nx_edges(want, False)
    with pytest.raises(ValueError):
        contracted_edge(g, (0, 3))


def test_quotient_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    part = spark.createDataFrame(
        [("0", "a"), ("1", "a"), ("2", "b"), ("3", "b"), ("4", "c")],
        "id string, block string")
    q = quotient_graph(g, part)
    G = nx.Graph(edges)
    want = nx.quotient_graph(G, [{0, 1}, {2, 3}, {4}], relabel=False)
    want_edges = {tuple(sorted((str(min(a)), str(min(b)))))
                  for a, b in want.edges}
    assert _edges(q) == want_edges
    with pytest.raises(ValueError):   # not a cover
        quotient_graph(g, part.filter("id <> '4'"))


def test_prufer_round_trip(spark):
    G = nx.random_labeled_tree(9, seed=7)
    g = Graph.from_edge_list(spark, list(G.edges), directed=False,
                             nodes=list(G))
    seq = to_prufer_sequence(g)
    assert seq == nx.to_prufer_sequence(G)
    back = from_prufer_sequence(spark, seq)
    assert _edges(back) == _nx_edges(G, False)
    with pytest.raises(ValueError):   # non-tree
        to_prufer_sequence(Graph.from_edge_list(
            spark, [(0, 1), (1, 2), (2, 0)], directed=False))

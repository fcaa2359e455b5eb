"""CNM greedy modularity vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.modularity_max import (
    greedy_modularity_communities)
from networkx_spark.generators import KARATE_EDGES


def _got(spark, edges, directed=False, weighted=False, **kw):
    g = Graph.from_edge_list(spark, edges, directed=directed)
    df = greedy_modularity_communities(g, weighted=weighted, **kw)
    by = {}
    for r in df.collect():
        by.setdefault(r["community"], set()).add(r["id"])
    return [frozenset(by[k]) for k in sorted(by)]


def _want(G, **kw):
    parts = nx.community.greedy_modularity_communities(G, **kw)
    return [frozenset(str(v) for v in p) for p in parts]


def test_karate_default(spark):
    got = _got(spark, KARATE_EDGES)
    want = _want(nx.karate_club_graph())
    assert got == want


def test_karate_cutoff_best_n(spark):
    G = nx.karate_club_graph()
    assert _got(spark, KARATE_EDGES, cutoff=4) == _want(G, cutoff=4)
    assert _got(spark, KARATE_EDGES, best_n=2) == _want(G, best_n=2)


def test_weighted(spark):
    edges = [(0, 1, 5.0), (1, 2, 1.0), (2, 3, 5.0), (3, 0, 1.0),
             (4, 5, 4.0), (3, 4, 0.5)]
    G = nx.Graph()
    G.add_weighted_edges_from(edges)
    got = _got(spark, edges, weighted=True)
    want = _want(G, weight="weight")
    assert got == want


def test_directed(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    got = _got(spark, edges, directed=True)
    want = _want(nx.DiGraph(edges))
    assert got == want


def test_param_validation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    with pytest.raises(ValueError):
        greedy_modularity_communities(g, cutoff=0)
    with pytest.raises(ValueError):
        greedy_modularity_communities(g, cutoff=2, best_n=1)

"""find_cliques / k_clique_communities vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.cliques import find_cliques, k_clique_communities
from networkx_spark.generators import KARATE_EDGES


def _got_cliques(spark, edges, nodes=None):
    g = Graph.from_edge_list(spark, edges, directed=False, nodes=nodes)
    return {frozenset(r["clique"]) for r in find_cliques(g).collect()}


def _want_cliques(G):
    return {frozenset(str(v) for v in c) for c in nx.find_cliques(G)}


def test_karate_maximal_cliques(spark):
    got = _got_cliques(spark, KARATE_EDGES)
    want = _want_cliques(nx.karate_club_graph())
    assert got == want


def test_small_graphs(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5), (2, 4)]
    assert _got_cliques(spark, edges) == _want_cliques(nx.Graph(edges))
    # isolated vertex -> singleton clique
    G = nx.Graph([(0, 1)])
    G.add_node(9)
    assert _got_cliques(spark, [(0, 1)], nodes=[0, 1, 9]) == _want_cliques(G)


def _got_comms(spark, edges, k):
    g = Graph.from_edge_list(spark, edges, directed=False)
    by = {}
    for r in k_clique_communities(g, k).collect():
        by.setdefault(r["community"], set()).add(r["id"])
    return {frozenset(v) for v in by.values()}


def _want_comms(G, k):
    return {frozenset(str(v) for v in c)
            for c in nx.community.k_clique_communities(G, k)}


def test_k_clique_communities_karate(spark):
    G = nx.karate_club_graph()
    for k in (3, 4, 5):
        assert _got_comms(spark, KARATE_EDGES, k) == _want_comms(G, k), k


def test_k_clique_validation_and_empty(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        k_clique_communities(g, 1)
    assert _got_comms(spark, [(0, 1), (1, 2)], 3) == set()

"""Percolation centrality vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.percolation import percolation_centrality
from networkx_spark.generators import KARATE_EDGES


def _check(spark, edges, states, G=None, directed=False):
    g = Graph.from_edge_list(spark, edges, directed=directed)
    got = {r["id"]: r["percolation"]
           for r in percolation_centrality(g, states).collect()}
    if G is None:
        G = (nx.DiGraph if directed else nx.Graph)(edges)
    want = nx.percolation_centrality(G, states=states)
    assert set(got) == {str(v) for v in want}
    for v, x in want.items():
        assert got[str(v)] == pytest.approx(x, abs=1e-9), v


def test_karate_uniform_states(spark):
    G = nx.karate_club_graph()
    states = {v: 0.5 for v in G}
    _check(spark, KARATE_EDGES, states, G=G)


def test_path_varied_states(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    states = {0: 1.0, 1: 0.2, 2: 0.5, 3: 0.8, 4: 0.1}
    _check(spark, edges, states)


def test_directed(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)]
    states = {0: 0.9, 1: 0.1, 2: 0.4, 3: 0.7}
    _check(spark, edges, states, directed=True)

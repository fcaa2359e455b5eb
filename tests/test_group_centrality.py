"""Group centrality vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.group import (
    group_closeness_centrality, group_degree_centrality,
    group_in_degree_centrality, group_out_degree_centrality)
from networkx_spark.generators import KARATE_EDGES


def test_group_closeness_karate(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    G = nx.karate_club_graph()
    for S in ({0, 33}, {5}, {0, 1, 2}):
        got = group_closeness_centrality(g, S)
        want = nx.group_closeness_centrality(G, S)
        assert got == pytest.approx(want, abs=1e-9), S


def test_group_closeness_directed_unreachable(spark):
    edges = [(0, 1), (1, 2), (3, 2)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    G = nx.DiGraph(edges)
    for S in ({2}, {1}):
        assert group_closeness_centrality(g, S) == pytest.approx(
            nx.group_closeness_centrality(G, S), abs=1e-9), S


def test_group_degree(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    G = nx.karate_club_graph()
    for S in ({0}, {0, 33}, {11, 12}):
        assert group_degree_centrality(g, S) == pytest.approx(
            nx.group_degree_centrality(G, S)), S


def test_group_in_out_degree(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 1)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    G = nx.DiGraph(edges)
    S = {1, 2}
    assert group_out_degree_centrality(g, S) == pytest.approx(
        nx.group_out_degree_centrality(G, S))
    assert group_in_degree_centrality(g, S) == pytest.approx(
        nx.group_in_degree_centrality(G, S))
    gu = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        group_out_degree_centrality(gu, {0})

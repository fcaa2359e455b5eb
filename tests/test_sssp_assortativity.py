"""Weighted SSSP + degree assortativity vs the reference oracle."""

import math

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.assortativity import (
    degree_assortativity_coefficient)
from networkx_spark.algorithms.bfs import NodeNotFound, bfs_distances
from networkx_spark.algorithms.sssp import sssp_distances
from networkx_spark.generators import KARATE_EDGES
from tests.conftest import as_dict


def _wkarate():
    """Deterministic integer weights on the karate club edges."""
    return [(u, v, float(1 + (u * 31 + v * 17) % 5)) for u, v in KARATE_EDGES]


def test_sssp_matches_reference_dijkstra(spark):
    g = Graph.from_edge_list(spark, _wkarate(), directed=False)
    got = as_dict(sssp_distances(g, 0), "id", "distance")
    G = nx.Graph()
    G.add_weighted_edges_from(_wkarate())
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert got == {str(k): float(v) for k, v in want.items()}


def test_sssp_weighted_path_beats_hop_path(spark):
    # 0-1-2-3 all weight 1 vs direct 0-3 weight 10: weighted distance 3,
    # hop distance 1 — proves weights are honored, not hop counts
    g = Graph.from_edge_list(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 10.0)],
        directed=False)
    d = as_dict(sssp_distances(g, 0), "id", "distance")
    assert d["3"] == 3.0
    hops = as_dict(bfs_distances(g, "0"), "id", "distance")
    assert hops["3"] == 1


def test_sssp_directed_reachable_only(spark):
    g = Graph.from_edge_list(spark, [(0, 1, 2.0), (1, 2, 3.0), (3, 0, 1.0)],
                             directed=True)
    d = as_dict(sssp_distances(g, 0), "id", "distance")
    assert d == {"0": 0.0, "1": 2.0, "2": 5.0}     # 3 unreachable → absent


def test_sssp_unweighted_equals_bfs(spark):
    g = Graph.from_edge_list(spark, _wkarate(), directed=False)
    d = as_dict(sssp_distances(g, 0, weight=False), "id", "distance")
    b = as_dict(bfs_distances(g, "0"), "id", "distance")
    assert d == {k: float(v) for k, v in b.items()}


def test_sssp_missing_source_and_negative_weights(spark):
    g = Graph.from_edge_list(spark, [(0, 1, -1.0)], directed=True)
    with pytest.raises(NodeNotFound):
        sssp_distances(g, 99)
    with pytest.raises(ValueError):
        sssp_distances(g, 0)
    # Bellman-Ford mode: negative edges on a DAG converge to the reference
    g2 = Graph.from_edge_list(spark, [(0, 1, 5.0), (1, 2, -3.0), (0, 2, 4.0)],
                              directed=True)
    d = as_dict(sssp_distances(g2, 0, allow_negative=True), "id", "distance")
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 5.0), (1, 2, -3.0), (0, 2, 4.0)])
    want = nx.single_source_bellman_ford_path_length(G, 0)
    assert d == {str(k): float(v) for k, v in want.items()}


def test_assortativity_matches_reference_undirected(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = degree_assortativity_coefficient(g)
    want = nx.degree_assortativity_coefficient(nx.karate_club_graph())
    assert got == pytest.approx(want, abs=1e-9)


def test_assortativity_matches_reference_directed(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 4), (4, 1)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    got = degree_assortativity_coefficient(g)
    want = nx.degree_assortativity_coefficient(nx.DiGraph(edges))
    assert got == pytest.approx(want, abs=1e-9)


def test_assortativity_regular_graph_nan(spark):
    # 4-cycle: every degree 2 → zero variance → NaN (scipy behaviour)
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)],
                             directed=False)
    assert math.isnan(degree_assortativity_coefficient(g))


def test_undirected_in_degrees_routes_to_degrees(spark):
    # reportviews.py:521-528 — all degree views agree, self-loop counts twice
    g = Graph.from_edge_list(spark, [(1, 2), (1, 1)], directed=False)
    assert as_dict(g.in_degrees(), "id", "degree") == {"1": 3, "2": 1}
    assert as_dict(g.in_degrees(), "id", "degree") == \
        as_dict(g.out_degrees(), "id", "degree")


def test_triangles_raises_on_directed(spark):
    from networkx_spark.algorithms.triangles import triangles, transitivity
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    with pytest.raises(ValueError):
        triangles(g)
    # transitivity keeps the engine's symmetrized posture (documented)
    assert transitivity(g) == 1.0

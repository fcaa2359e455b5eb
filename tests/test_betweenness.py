"""Betweenness centrality vs the reference oracle."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.betweenness import betweenness_centrality
from networkx_spark.generators import KARATE_EDGES
from tests.conftest import as_dict


def _check(spark, edges, directed, normalized, G=None):
    g = Graph.from_edge_list(spark, edges, directed=directed)
    got = as_dict(betweenness_centrality(g, normalized=normalized),
                  "id", "betweenness")
    if G is None:
        G = (nx.DiGraph if directed else nx.Graph)(edges)
    want = nx.betweenness_centrality(G, normalized=normalized)
    assert set(got) == {str(v) for v in want}
    for v, b in want.items():
        assert got[str(v)] == pytest.approx(b, abs=1e-9), v


def test_karate_exact_normalized(spark):
    _check(spark, KARATE_EDGES, False, True, G=nx.karate_club_graph())


def test_karate_exact_unnormalized(spark):
    _check(spark, KARATE_EDGES, False, False, G=nx.karate_club_graph())


def test_path_and_star(spark):
    _check(spark, [(0, 1), (1, 2), (2, 3)], False, True)
    _check(spark, [(0, i) for i in range(1, 6)], False, False)


def test_directed_exact(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 4), (4, 1)]
    _check(spark, edges, True, True)
    _check(spark, edges, True, False)


def test_disconnected(spark):
    _check(spark, [(0, 1), (1, 2), (3, 4)], False, True)


def test_sampled_mode_bounds(spark):
    # sampled estimate on karate: deterministic for fixed seed; should
    # correlate with the exact ranking (top vertex 0 or 33 by construction)
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    est1 = as_dict(betweenness_centrality(g, k=12, seed=5), "id", "betweenness")
    est2 = as_dict(betweenness_centrality(g, k=12, seed=5), "id", "betweenness")
    assert est1 == est2                       # seed-deterministic
    exact = nx.betweenness_centrality(nx.karate_club_graph())
    top_exact = max(exact, key=exact.get)
    top_est = max(est1, key=est1.get)
    assert top_est in {str(top_exact), "0", "33"}
    # mean absolute error within a loose bound for k=12/34 sources
    mae = sum(abs(est1[str(v)] - b) for v, b in exact.items()) / len(exact)
    assert mae < 0.05


def _check_edges(spark, edges, directed, normalized, G=None):
    from networkx_spark.algorithms.betweenness import edge_betweenness_centrality
    g = Graph.from_edge_list(spark, edges, directed=directed)
    rows = edge_betweenness_centrality(g, normalized=normalized).collect()
    got = {(r["src"], r["dst"]): r["betweenness"] for r in rows}
    if G is None:
        G = (nx.DiGraph if directed else nx.Graph)(edges)
    want = nx.edge_betweenness_centrality(G, normalized=normalized)
    canon = {}
    for (u, v), b in want.items():
        u, v = str(u), str(v)
        if not directed and u > v:
            u, v = v, u
        canon[(u, v)] = b
    assert set(got) == set(canon)
    for e, b in canon.items():
        assert got[e] == pytest.approx(b, abs=1e-9), e


def test_edge_karate_normalized(spark):
    _check_edges(spark, KARATE_EDGES, False, True, G=nx.karate_club_graph())


def test_edge_karate_unnormalized(spark):
    _check_edges(spark, KARATE_EDGES, False, False, G=nx.karate_club_graph())


def test_edge_directed(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 4), (4, 1)]
    _check_edges(spark, edges, True, True)
    _check_edges(spark, edges, True, False)


def test_edge_disconnected_and_path(spark):
    _check_edges(spark, [(0, 1), (1, 2), (3, 4)], False, True)
    _check_edges(spark, [(0, 1), (1, 2), (2, 3)], False, False)

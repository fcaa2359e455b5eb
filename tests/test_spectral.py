"""Spectral bisection / Fiedler / algebraic connectivity vs numpy
eigendecomposition (linalg/algebraicconnectivity.py)."""

import networkx as nx
import numpy as np
import pytest

from networkx_spark.algorithms.spectral import (
    algebraic_connectivity, fiedler_vector, spectral_bisection)
from networkx_spark.graph import Graph


def _graph(spark, nxg):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=False)


def _lambda2(nxg):
    nodes = sorted(nxg)
    a = np.zeros((len(nodes), len(nodes)))
    for u, v in nxg.edges():
        i, j = nodes.index(u), nodes.index(v)
        a[i, j] = a[j, i] = 1.0
    lap = np.diag(a.sum(1)) - a
    return float(np.sort(np.linalg.eigvalsh(lap))[1])


def test_bisection_splits_barbell(spark):
    nxg = nx.barbell_graph(5, 2)     # cliques 0-4 and 7-11, path 5-6
    sides = {r.id: r.side for r in
             spectral_bisection(_graph(spark, nxg), iterations=40).collect()}
    left = {sides[i] for i in range(5)}
    right = {sides[i] for i in range(7, 12)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_fiedler_orders_path(spark):
    f = {r.id: r.f for r in
         fiedler_vector(_graph(spark, nx.path_graph(6)),
                        iterations=60).collect()}
    vals = [f[i] for i in range(6)]
    # the path's Fiedler vector is strictly monotone along the path
    diffs = np.diff(vals)
    assert all(d > 0 for d in diffs) or all(d < 0 for d in diffs)


@pytest.mark.parametrize("nxg", [nx.barbell_graph(5, 2), nx.cycle_graph(8)],
                         ids=["barbell", "cycle"])
def test_algebraic_connectivity_close(spark, nxg):
    got = algebraic_connectivity(_graph(spark, nxg), iterations=60)
    want = _lambda2(nxg)
    # Rayleigh quotient upper-bounds lambda_2 and tightens quadratically
    assert want - 1e-9 <= got <= want * 1.10


def test_algebraic_connectivity_upper_bound_hub_graph(spark):
    # karate's hub degree makes c = 2*d_max large, so plain power
    # iteration converges slowly there — the Rayleigh estimate is still a
    # guaranteed upper bound and must improve with more iterations
    nxg = nx.karate_club_graph()
    want = _lambda2(nxg)
    a = algebraic_connectivity(_graph(spark, nxg), iterations=20)
    b = algebraic_connectivity(_graph(spark, nxg), iterations=80)
    assert a >= want - 1e-9 and b >= want - 1e-9
    assert b <= a + 1e-12          # monotone improvement
    assert b - want < a - want     # strictly closer


def test_fiedler_unit_norm_and_centered(spark):
    f = fiedler_vector(_graph(spark, nx.cycle_graph(8)), iterations=30)
    vals = np.array([r.f for r in f.collect()])
    assert abs(np.linalg.norm(vals) - 1.0) < 1e-9
    assert abs(vals.sum()) < 1e-9

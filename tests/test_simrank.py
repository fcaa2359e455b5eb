"""SimRank vs the reference implementation."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.simrank import (
    ExceededMaxIterations, simrank_similarity)


def _got(spark, edges, directed, **kw):
    g = Graph.from_edge_list(spark, edges, directed=directed)
    rows = simrank_similarity(g, **kw).collect()
    return {(r["u"], r["v"]): r["similarity"] for r in rows}


def _want(G, **kw):
    # the engine mirrors the reference's dict recurrence exactly
    # (``_simrank_similarity_python``); the public entry point dispatches to
    # a numpy variant whose result differs within the convergence tolerance
    sim = nx.similarity._simrank_similarity_python(G, **kw)
    return {(str(u), str(v)): s for u, nbrs in sim.items()
            for v, s in nbrs.items()}


def _check(spark, edges, directed, G=None, tol=1e-9, **kw):
    got = _got(spark, edges, directed, **kw)
    if G is None:
        G = (nx.DiGraph if directed else nx.Graph)(edges)
    want = _want(G, **kw)
    assert set(got) == set(want)
    for p, s in want.items():
        assert got[p] == pytest.approx(s, abs=tol), p
    public = nx.simrank_similarity(G, **kw)
    for u, nbrs in public.items():
        for v, s in nbrs.items():
            assert got[(str(u), str(v))] == pytest.approx(s, abs=5e-3)


def test_cycle_and_path(spark):
    _check(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], False)
    _check(spark, [(0, 1), (1, 2), (2, 3)], False)


def test_directed(spark):
    _check(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], True)


def test_star_and_importance_factor(spark):
    _check(spark, [(0, i) for i in range(1, 5)], False,
           importance_factor=0.8)


def test_nonconvergence_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    with pytest.raises(ExceededMaxIterations):
        simrank_similarity(g, max_iterations=1)


def test_vertex_cap(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    with pytest.raises(ValueError):
        simrank_similarity(g, max_vertices=2)

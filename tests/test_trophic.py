"""Trophic levels/differences/incoherence vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.trophic import (
    trophic_differences, trophic_incoherence_parameter, trophic_levels)


def _ref_levels(G, weight=None):
    """The reference's dense formula (trophic.py:55-70) in plain numpy —
    nx.trophic_levels itself needs scipy, absent in this container."""
    import numpy as np
    nodes = list(G)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    a = np.zeros((n, n))
    for u, v, w in G.edges(data=weight, default=1):
        a[idx[v], idx[u]] += w          # transposed adjacency: in-edges
    rowsum = a.sum(axis=1)
    nz = rowsum != 0
    p = a[nz][:, nz] / rowsum[nz][:, None]
    y = np.linalg.inv(np.eye(p.shape[0]) - p).sum(axis=1) + 1
    levels = {}
    for v in nodes:
        if G.in_degree(v) == 0:
            levels[v] = 1.0
    for i, v in enumerate(v for v in nodes if G.in_degree(v) != 0):
        levels[v] = float(y[i])
    return levels


def _check_levels(spark, edges, weighted=False):
    g = Graph.from_edge_list(spark, edges, directed=True)
    got = {r["id"]: r["trophic_level"]
           for r in trophic_levels(g, weight=weighted).collect()}
    G = nx.DiGraph()
    if weighted:
        G.add_weighted_edges_from(edges)
    else:
        G.add_edges_from(edges)
    want = _ref_levels(G, weight="weight" if weighted else None)
    assert set(got) == {str(v) for v in want}
    for v, s in want.items():
        assert got[str(v)] == pytest.approx(s, abs=1e-9), v


def test_chain_and_tree(spark):
    _check_levels(spark, [(0, 1), (1, 2), (2, 3)])
    _check_levels(spark, [(0, 2), (1, 2), (2, 3), (1, 3)])


def test_weighted_and_cycle(spark):
    _check_levels(spark, [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0), (2, 3, 1.0)],
                  weighted=True)
    # cycle fed by a basal node still converges
    _check_levels(spark, [(0, 1), (1, 2), (2, 1), (2, 3)])


def test_differences_and_incoherence(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 2)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    G = nx.DiGraph(edges)
    import numpy as np
    got = {(r["src"], r["dst"]): r["trophic_difference"]
           for r in trophic_differences(g).collect()}
    lv = _ref_levels(G)
    want = {(str(u), str(v)): lv[v] - lv[u] for u, v in G.edges}
    for e, x in want.items():
        assert got[e] == pytest.approx(x, abs=1e-9), e
    # incoherence = population std of diffs (trophic.py:168-173);
    # cannibalism=False strips self-loops BEFORE recomputing levels
    G2 = G.copy()
    G2.remove_edges_from(nx.selfloop_edges(G2))
    lv2 = _ref_levels(G2)
    no_self = [lv2[v] - lv2[u] for u, v in G2.edges]
    assert trophic_incoherence_parameter(g) == pytest.approx(
        float(np.std(no_self)), abs=1e-9)
    assert trophic_incoherence_parameter(g, cannibalism=True) == pytest.approx(
        float(np.std(list(want.values()))), abs=1e-9)


def test_no_basal_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0)], directed=True)
    with pytest.raises(ValueError):
        trophic_levels(g, max_iter=200)


def test_undirected_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        trophic_levels(g)

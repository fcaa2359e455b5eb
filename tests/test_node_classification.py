"""Harmonic function / local-and-global consistency label spreading.

The reference implementation needs scipy (absent here), so the oracle is
a dense numpy replay of the exact published recurrences the reference
codes (node_classification.py:94-104, :170-181)."""

import networkx as nx
import numpy as np
import pytest

from networkx_spark.algorithms.node_classification import (
    harmonic_function, harmonic_scores, local_and_global_consistency)
from networkx_spark.graph import Graph


def _setup(spark, nxg, seed_labels):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                         directed=False)
    seeds = spark.createDataFrame(list(seed_labels.items()),
                                  "id long, label long")
    return g, seeds


def _numpy_harmonic(nxg, seed_labels, classes, iters):
    n = nxg.number_of_nodes()
    a = nx.to_numpy_array(nxg, nodelist=range(n), weight=None)
    d = a.sum(0)
    d[d == 0] = 1
    p = (np.diag(1.0 / d) @ a)
    p[list(seed_labels)] = 0
    b = np.zeros((n, classes))
    for v, l in seed_labels.items():
        b[v, l] = 1
    f = np.zeros((n, classes))
    for _ in range(iters):
        f = p @ f + b
    return f


def test_harmonic_scores_match_recurrence(spark):
    nxg = nx.karate_club_graph()
    seed_labels = {0: 0, 33: 1}
    g, seeds = _setup(spark, nxg, seed_labels)
    f = _numpy_harmonic(nxg, seed_labels, 2, 10)
    got = {(r.id, r.label): r.p
           for r in harmonic_scores(g, seeds, max_iter=10).collect()}
    for v in range(34):
        for l in range(2):
            assert got.get((v, l), 0.0) == pytest.approx(f[v, l], abs=1e-9)


def test_harmonic_prediction_splits_karate(spark):
    nxg = nx.karate_club_graph()
    seed_labels = {0: 0, 33: 1}
    g, seeds = _setup(spark, nxg, seed_labels)
    pred = {r.id: r.label
            for r in harmonic_function(g, seeds, max_iter=30).collect()}
    f = _numpy_harmonic(nxg, seed_labels, 2, 30)
    want = {v: int(np.argmax(f[v])) for v in range(34)}
    # where the numpy argmax is strict, we must agree
    for v, wl in want.items():
        if abs(f[v, 0] - f[v, 1]) > 1e-12:
            assert pred[v] == wl


def test_lgc_prediction(spark):
    nxg = nx.karate_club_graph()
    seed_labels = {0: 0, 33: 1}
    g, seeds = _setup(spark, nxg, seed_labels)
    alpha, iters = 0.9, 20
    n = 34
    a = nx.to_numpy_array(nxg, nodelist=range(n), weight=None)
    d = a.sum(0)
    d[d == 0] = 1
    s = np.diag(d ** -0.5) @ a @ np.diag(d ** -0.5)
    b = np.zeros((n, 2))
    for v, l in seed_labels.items():
        b[v, l] = 1
    f = np.zeros((n, 2))
    for _ in range(iters):
        f = alpha * (s @ f) + (1 - alpha) * b
    pred = {r.id: r.label for r in
            local_and_global_consistency(g, seeds, alpha=alpha,
                                         max_iter=iters).collect()}
    for v in range(n):
        if abs(f[v, 0] - f[v, 1]) > 1e-12:
            assert pred[v] == int(np.argmax(f[v]))


def test_no_seeds_raises(spark):
    g, seeds = _setup(spark, nx.path_graph(3), {})
    with pytest.raises(ValueError, match="labeled"):
        harmonic_function(g, seeds)

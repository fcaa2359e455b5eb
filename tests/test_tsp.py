"""TSP approximations vs the reference: greedy tour-for-tour parity on
distinct weights; Christofides validity + the 3/2 bound vs brute-force
optimum on metric instances."""

import itertools

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.tsp import christofides, greedy_tsp


def _metric_instance(n, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2))
    w = {}
    for i in range(n):
        for j in range(i + 1, n):
            w[(i, j)] = round(float(np.hypot(*(pts[i] - pts[j]))), 6)
    return w


def _G(w):
    G = nx.Graph()
    for (u, v), x in w.items():
        G.add_edge(u, v, weight=x)
    return G


def _g(spark, w):
    e = spark.createDataFrame([(u, v, x) for (u, v), x in w.items()],
                              "src long, dst long, weight double")
    return Graph.from_edges(e, directed=False, weight="weight",
                            combine="min")


def _opt(w, n):
    best = float("inf")
    for perm in itertools.permutations(range(1, n)):
        tour = (0,) + perm + (0,)
        best = min(best, sum(w[tuple(sorted(p))]
                             for p in zip(tour, tour[1:])))
    return best


@pytest.mark.parametrize("n,seed", [(6, 1), (7, 2), (8, 3)])
def test_christofides_bound_and_validity(spark, n, seed):
    w = _metric_instance(n, seed)
    cycle, total = christofides(_g(spark, w))
    assert cycle[0] == cycle[-1] and len(cycle) == n + 1
    assert sorted(cycle[:-1]) == list(range(n))       # Hamiltonian
    opt = _opt(w, n)
    assert total <= 1.5 * opt + 1e-9, (total, opt)
    # reference christofides obeys the same bound on the same instance
    ref = nx.approximation.christofides(_G(w))
    ref_w = sum(w[tuple(sorted(p))] for p in zip(ref, ref[1:]))
    assert ref_w <= 1.5 * opt + 1e-9


@pytest.mark.parametrize("n,seed", [(6, 4), (9, 5)])
def test_greedy_tsp_matches_reference(spark, n, seed):
    w = _metric_instance(n, seed)
    cycle, total = greedy_tsp(_g(spark, w), source=0)
    ref = nx.approximation.greedy_tsp(_G(w), source=0)
    ref_w = sum(w[tuple(sorted(p))] for p in zip(ref, ref[1:]))
    assert cycle == ref                                # tour-for-tour
    assert total == pytest.approx(ref_w)


def test_tsp_validation(spark):
    # incomplete graph rejected like the reference
    w = {(0, 1): 1.0, (1, 2): 1.0}
    with pytest.raises(ValueError, match="complete"):
        greedy_tsp(_g(spark, w))
    with pytest.raises(ValueError, match="complete"):
        christofides(_g(spark, w))

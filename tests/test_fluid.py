"""asyn_fluidc structural invariants + determinism."""

import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.fluid import asyn_fluidc
from networkx_spark.generators import KARATE_EDGES


def _comms(df):
    by = {}
    for r in df.collect():
        by.setdefault(r["community"], set()).add(r["id"])
    return by


def test_two_cliques_bridge_k2(spark):
    from itertools import combinations
    edges = ([(a, b) for a, b in combinations(range(4), 2)]
             + [(a, b) for a, b in combinations(range(4, 8), 2)]
             + [(3, 4)])
    g = Graph.from_edge_list(spark, edges, directed=False)
    by = _comms(asyn_fluidc(g, 2, seed=1))
    # full cover, exactly 2 communities
    assert sorted(x for s in by.values() for x in s) == [str(i) for i in range(8)]
    assert len(by) == 2
    # the bridge is the only inter-community edge for the natural split
    parts = sorted(sorted(map(int, s)) for s in by.values())
    assert parts == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_karate_deterministic_cover(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    a = sorted(map(tuple, asyn_fluidc(g, 3, seed=5).collect()))
    b = sorted(map(tuple, asyn_fluidc(g, 3, seed=5).collect()))
    assert a == b                       # seed-deterministic
    by = _comms(asyn_fluidc(g, 3, seed=5))
    assert sum(len(s) for s in by.values()) == 34
    assert 1 <= len(by) <= 3


def test_validation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError):        # disconnected
        asyn_fluidc(g, 2)
    g2 = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):        # k > n
        asyn_fluidc(g2, 5)
    g3 = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):        # directed
        asyn_fluidc(g3, 1)

"""local_efficiency / efficiency / closeness_vitality vs the reference."""

import math

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.distance_measures import (
    closeness_vitality, efficiency, local_efficiency)
from networkx_spark.generators import KARATE_EDGES


def test_efficiency_pair(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    G = nx.Graph(edges)
    assert efficiency(g, 0, 3) == pytest.approx(nx.efficiency(G, 0, 3))
    assert efficiency(g, 0, 1) == pytest.approx(nx.efficiency(G, 0, 1))
    # unreachable -> 0
    g2 = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    assert efficiency(g2, 0, 3) == 0.0


def test_local_efficiency_karate(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    want = nx.local_efficiency(nx.karate_club_graph())
    assert local_efficiency(g) == pytest.approx(want, abs=1e-9)


def test_local_efficiency_small(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    assert local_efficiency(g) == pytest.approx(
        nx.local_efficiency(nx.Graph(edges)), abs=1e-9)


def test_closeness_vitality_karate(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = {r["id"]: r["closeness_vitality"]
           for r in closeness_vitality(g).collect()}
    want = nx.closeness_vitality(nx.karate_club_graph())
    assert set(got) == {str(v) for v in want}
    for v, x in want.items():
        if math.isinf(x):
            assert math.isinf(got[str(v)])
        else:
            assert got[str(v)] == pytest.approx(x, abs=1e-9), v


def test_closeness_vitality_cut_vertex(spark):
    # removing the bridge endpoint disconnects -> -inf like the reference
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = {r["id"]: r["closeness_vitality"]
           for r in closeness_vitality(g).collect()}
    want = nx.closeness_vitality(nx.Graph(edges))
    for v, x in want.items():
        if math.isinf(x):
            assert math.isinf(got[str(v)]) and got[str(v)] < 0
        else:
            assert got[str(v)] == pytest.approx(x, abs=1e-9), v

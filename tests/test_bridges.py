"""Bridges / 2-edge-connected components vs the reference oracle
(algorithms/bridges.py)."""

import networkx as nx
import pytest

from networkx_spark.algorithms.bridges import (
    bfs_forest, bridge_labels, bridges, has_bridges,
    two_edge_connected_components)
from networkx_spark.graph import Graph

from conftest import as_partition


def _graph(spark, nxg):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    return Graph.from_edges(df, directed=False)


def _ref_bridges(nxg):
    return {tuple(sorted(e)) for e in nx.bridges(nxg)}


CASES = [
    nx.path_graph(6),                         # every edge a bridge
    nx.cycle_graph(5),                        # no bridges
    nx.karate_club_graph(),
    nx.barbell_graph(4, 2),                   # two cliques + a chain
    nx.lollipop_graph(5, 3),
]


@pytest.mark.parametrize("nxg", CASES, ids=["path", "cycle", "karate",
                                            "barbell", "lollipop"])
def test_bridges_fixtures(spark, nxg):
    got = {(r.u, r.v) for r in bridges(_graph(spark, nxg)).collect()}
    assert got == _ref_bridges(nxg)


def test_bridges_random_multi_component(spark):
    # seeded sparse graph: several components, chains, and cycles
    nxg = nx.gnm_random_graph(40, 44, seed=7)
    g = _graph(spark, nxg)
    got = {(r.u, r.v) for r in bridges(g).collect()}
    assert got == _ref_bridges(nxg)
    # full labeling covers every distinct non-loop edge
    lab = bridge_labels(g).collect()
    assert len(lab) == nxg.number_of_edges()
    assert has_bridges(g) == (len(_ref_bridges(nxg)) > 0)


def test_bfs_forest_is_bfs(spark):
    nxg = nx.karate_club_graph()
    f = {r.id: r for r in bfs_forest(_graph(spark, nxg)).collect()}
    dist = nx.single_source_shortest_path_length(nxg, 0)
    assert all(r.comp == 0 for r in f.values())
    for v, r in f.items():
        assert r.depth == dist[v]
        if v == 0:
            assert r.parent is None
        else:   # parent is a real neighbor one level up
            assert r.parent in nxg[v] and f[r.parent].depth == r.depth - 1


def test_two_edge_components(spark):
    nxg = nx.barbell_graph(4, 2)
    got = as_partition(two_edge_connected_components(_graph(spark, nxg)),
                       "id", "comp")
    want = frozenset(frozenset(c) for c in
                     nx.connectivity.bridge_components(nxg))
    # bridge endpoints that end up alone appear as singletons in ours too
    assert got == want


def test_two_edge_components_tree_is_singletons(spark):
    nxg = nx.path_graph(5)
    got = as_partition(two_edge_connected_components(_graph(spark, nxg)),
                       "id", "comp")
    assert got == frozenset(frozenset([v]) for v in range(5))

"""Weisfeiler-Lehman hashing vs the reference (graph_hashing.py)."""

import networkx as nx
import pytest

from networkx_spark.algorithms.graph_hashing import (
    weisfeiler_lehman_graph_hash, weisfeiler_lehman_subgraph_hashes,
    wl_colors)
from networkx_spark.graph import Graph


def _graph(spark, nxg):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=False)


CASES = [nx.path_graph(6), nx.cycle_graph(6), nx.karate_club_graph(),
         nx.lollipop_graph(4, 3)]
IDS = ["path", "cycle", "karate", "lollipop"]


@pytest.mark.parametrize("nxg", CASES, ids=IDS)
def test_graph_hash_blake2b_matches_reference(spark, nxg):
    got = weisfeiler_lehman_graph_hash(_graph(spark, nxg), digest="blake2b")
    assert got == nx.weisfeiler_lehman_graph_hash(nxg)


def test_subgraph_hashes_match_reference(spark):
    nxg = nx.karate_club_graph()
    df = weisfeiler_lehman_subgraph_hashes(_graph(spark, nxg), digest="blake2b")
    got = {}
    for r in df.collect():
        got.setdefault(r.id, {})[r.depth] = r.color
    want = nx.weisfeiler_lehman_subgraph_hashes(nxg)
    assert {v: [d[i] for i in sorted(d)] for v, d in got.items()} == want


def test_md5_mode_same_partition_as_reference(spark):
    # md5 digests differ from blake2b but the induced color PARTITION at
    # every depth must match the reference's refinement exactly
    nxg = nx.lollipop_graph(4, 3)
    df = wl_colors(_graph(spark, nxg), iterations=3, digest="md5")
    ref = nx.weisfeiler_lehman_subgraph_hashes(nxg)
    for depth in (1, 2, 3):
        ours, theirs = {}, {}
        for r in df.filter(f"depth = {depth}").collect():
            ours.setdefault(r.color, set()).add(r.id)
        for v, hashes in ref.items():
            theirs.setdefault(hashes[depth - 1], set()).add(v)
        assert (frozenset(map(frozenset, ours.values()))
                == frozenset(map(frozenset, theirs.values())))


def test_isomorphic_graphs_hash_equal(spark):
    g1 = nx.relabel_nodes(nx.karate_club_graph(), {i: i + 100 for i in range(34)})
    h1 = weisfeiler_lehman_graph_hash(_graph(spark, g1), digest="md5")
    h2 = weisfeiler_lehman_graph_hash(
        _graph(spark, nx.karate_club_graph()), digest="md5")
    assert h1 == h2
    h3 = weisfeiler_lehman_graph_hash(_graph(spark, nx.path_graph(34)),
                                      digest="md5")
    assert h3 != h1


def test_include_initial_is_degree_label(spark):
    nxg = nx.path_graph(4)
    df = wl_colors(_graph(spark, nxg), iterations=1, include_initial=True)
    init = {r.id: r.color for r in df.filter("depth = 0").collect()}
    assert init == {0: "1", 1: "2", 2: "2", 3: "1"}


def test_node_attr_initialization(spark):
    from networkx_spark.attributes import set_node_attributes
    nxg = nx.cycle_graph(4)
    g = _graph(spark, nxg)
    attrs = spark.createDataFrame([(i, "ab"[i % 2]) for i in range(4)],
                                  "id long, kind string")
    g = set_node_attributes(g, attrs)
    got = weisfeiler_lehman_graph_hash(g, digest="blake2b", node_attr="kind")
    for i in range(4):
        nxg.nodes[i]["kind"] = "ab"[i % 2]
    assert got == nx.weisfeiler_lehman_graph_hash(nxg, node_attr="kind")

"""Girvan–Newman vs the reference generator."""

import networkx as nx

from networkx_spark import Graph
from networkx_spark.algorithms.girvan_newman import girvan_newman


def _communities(df):
    """DataFrame (id, community) -> frozenset of frozensets of ids."""
    rows = df.collect()
    by = {}
    for r in rows:
        by.setdefault(r["component"], set()).add(r["id"])
    return frozenset(frozenset(s) for s in by.values())


def _ref_level(G, level):
    gen = nx.community.girvan_newman(G)
    for _ in range(level - 1):
        next(gen)
    part = next(gen)
    return frozenset(frozenset(str(v) for v in s) for s in part)


def test_two_triangles_bridge(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    [lvl1] = girvan_newman(g, levels=1)
    assert _communities(lvl1) == _ref_level(nx.Graph(edges), 1)


def test_path_two_levels(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    lvl1, lvl2 = girvan_newman(g, levels=2)
    G = nx.Graph(edges)
    assert _communities(lvl1) == _ref_level(G, 1)
    assert _communities(lvl2) == _ref_level(G, 2)


def test_directed_input_treated_undirected(spark):
    # reference copies to_undirected() first
    edges = [(0, 1), (1, 0), (1, 2), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    [lvl1] = girvan_newman(g, levels=1)
    assert _communities(lvl1) == _ref_level(nx.Graph([(0, 1), (1, 2), (3, 4)]), 1)

"""Bipartite projections vs the reference (bipartite/projection.py)."""

import networkx as nx
from networkx.algorithms import bipartite as nxb

from networkx_spark.algorithms.bipartite import (
    projected_graph, projection_weights, weighted_projected_graph)
from networkx_spark.graph import Graph


def _fixture(spark):
    # bottom 0-4, top 10-15; a hub (10) plus sparse attachments
    edges = [(0, 10), (1, 10), (2, 10), (2, 11), (3, 11), (3, 12),
             (4, 12), (4, 13), (0, 14)]
    nxg = nx.Graph(edges)
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                         directed=False)
    bottom = spark.createDataFrame([(i,) for i in range(5)], "id long")
    return nxg, g, bottom


def test_projection_weights_match_reference(spark):
    nxg, g, bottom = _fixture(spark)
    got = {(r.u, r.v): r.shared
           for r in projection_weights(g, bottom).collect()}
    ref = nxb.weighted_projected_graph(nxg, list(range(5)))
    want = {tuple(sorted(e)): d["weight"] for *e, d in ref.edges(data=True)}
    assert got == want


def test_overlap_jaccard_matches_reference(spark):
    nxg, g, bottom = _fixture(spark)
    got = {(r.u, r.v): round(r.jaccard, 6)
           for r in projection_weights(g, bottom).collect()}
    ref = nxb.overlap_weighted_projected_graph(nxg, list(range(5)))
    want = {tuple(sorted(e)): round(d["weight"], 6)
            for *e, d in ref.edges(data=True)}
    assert got == want


def test_projected_graph_edges(spark):
    nxg, g, bottom = _fixture(spark)
    pg = projected_graph(g, bottom)
    got = {(r.src, r.dst) for r in pg.edges.select("src", "dst").collect()}
    ref = nxb.projected_graph(nxg, list(range(5)))
    assert got == {tuple(sorted(e)) for e in ref.edges()}
    wg = weighted_projected_graph(g, bottom)
    assert wg.edges.columns[:3] == ["src", "dst", "weight"]

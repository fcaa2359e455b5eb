"""Dominating set, s-metric, mixing matrices, host graph — vs the reference."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.algorithms.dominating import dominating_set, is_dominating_set
from networkx_spark.algorithms.mixing import attribute_mixing, degree_mixing
from networkx_spark.algorithms.smetric import s_metric
from networkx_spark.webgraph import (
    host_degrees, host_graph, host_graph_as_graph)

PETERSEN = list(nx.petersen_graph().edges)
KARATE = list(nx.karate_club_graph().edges)


# ------------------------------------------------------------- dominating
def test_dominating_set_is_dominating_and_independent(spark):
    g = Graph.from_edge_list(spark, KARATE, directed=False)
    D = dominating_set(g, seed=3)
    ids = {int(r.id) for r in D.collect()}
    R = nx.karate_club_graph()
    assert nx.is_dominating_set(R, ids)
    # the MIS construction additionally yields an independent set
    assert all(not R.has_edge(u, v) for u in ids for v in ids if u != v)
    assert is_dominating_set(g, D)


def test_dominating_start_with_and_isolates(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    g = g.add_vertices(spark.createDataFrame([("9",)], "id string"))
    D = dominating_set(g, start_with=1)
    ids = {int(r.id) for r in D.collect()}
    assert 1 in ids and 9 in ids          # isolates always dominate
    assert is_dominating_set(g, D)


def test_is_dominating_set_negative(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 4)],
                             directed=False)
    only4 = spark.createDataFrame([("4",)], "id string")
    assert not is_dominating_set(g, only4)


def test_dominating_directed_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        dominating_set(g)


# --------------------------------------------------------------- s-metric
def test_s_metric_matches_reference_undirected(spark):
    R = nx.karate_club_graph()
    g = Graph.from_edge_list(spark, KARATE, directed=False)
    assert s_metric(g) == pytest.approx(
        float(sum(R.degree(u) * R.degree(v) for u, v in R.edges())))


def test_s_metric_directed_and_self_loop(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 2), (0, 2)]
    R = nx.DiGraph(edges)
    g = Graph.from_edge_list(spark, edges, directed=True)
    assert s_metric(g) == pytest.approx(
        float(sum(R.degree(u) * R.degree(v) for u, v in R.edges())))


def test_s_metric_empty(spark):
    g = Graph.from_edge_list(spark, [], directed=False)
    assert s_metric(g) == 0.0


# ----------------------------------------------------------------- mixing
def test_degree_mixing_matches_reference(spark):
    R = nx.petersen_graph()
    R.add_edge(0, 0)   # break regularity, add a self-loop
    g = Graph.from_edge_list(spark, list(R.edges), directed=False)
    got = {(int(r.x), int(r.y)): r.weight
           for r in degree_mixing(g).collect()}
    want = {}
    for a, inner in nx.degree_mixing_dict(R).items():
        for b, c in inner.items():
            want[(a, b)] = float(c)
    assert got == want


def test_degree_mixing_normalized_sums_to_one(spark):
    g = Graph.from_edge_list(spark, KARATE, directed=False)
    total = (degree_mixing(g, normalized=True)
             .agg(F.sum("weight")).collect()[0][0])
    assert total == pytest.approx(1.0)


def test_attribute_mixing_matches_reference(spark):
    R = nx.karate_club_graph()   # has the 'club' node attribute
    g = Graph.from_edge_list(spark, KARATE, directed=False)
    attrs = spark.createDataFrame(
        [(str(n), d["club"]) for n, d in R.nodes(data=True)],
        "id string, club string")
    g = g.with_vertex_attrs(attrs)
    got = {(r.x, r.y): r.weight for r in attribute_mixing(g, "club").collect()}
    want = {}
    for a, inner in nx.attribute_mixing_dict(R, "club").items():
        for b, c in inner.items():
            want[(a, b)] = float(c)
    assert got == want


# ------------------------------------------------------------- host graph
URL_EDGES = [
    ("https://a.test/p1", "https://b.test/x"),
    ("https://a.test/p2", "https://b.test/y"),
    ("https://a.test/p1", "https://a.test/p2"),
    ("https://b.test/x", "https://a.test/p1"),
]


def test_host_graph_weights(spark):
    e = spark.createDataFrame(URL_EDGES, "src string, dst string")
    got = {(r.src, r.dst): r.weight for r in host_graph(e).collect()}
    assert got == {("a.test", "b.test"): 2.0, ("a.test", "a.test"): 1.0,
                   ("b.test", "a.test"): 1.0}
    noself = {(r.src, r.dst) for r in host_graph(e, keep_self=False).collect()}
    assert noself == {("a.test", "b.test"), ("b.test", "a.test")}


def test_host_degrees(spark):
    e = spark.createDataFrame(URL_EDGES, "src string, dst string")
    got = {r.host: (r.out_pages, r.out_links, r.in_links)
           for r in host_degrees(e).collect()}
    assert got == {"a.test": (2, 3, 2), "b.test": (1, 1, 2)}


def test_host_graph_as_graph_runs_pagerank(spark):
    from networkx_spark.algorithms.pagerank import pagerank
    e = spark.createDataFrame(URL_EDGES, "src string, dst string")
    hg = host_graph_as_graph(e, keep_self=False)
    pr = {r.id: r.rank for r in pagerank(hg, max_iter=20).collect()}
    assert set(pr) == {"a.test", "b.test"}
    assert sum(pr.values()) == pytest.approx(1.0)

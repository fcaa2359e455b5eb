"""Core edge-table graph layer (SURVEY §2.2): canonicalization, degrees,
symmetrization, subgraphs, vids."""

import pytest
from pyspark.sql import functions as F

from networkx_spark import Graph
from tests.conftest import as_dict


def test_undirected_canonicalization_and_dedup(spark):
    g = Graph.from_edge_list(spark, [(2, 1), (1, 2), (3, 3), (1, 3)], directed=False)
    rows = {(r.src, r.dst): r.weight for r in g.edges.collect()}
    # (2,1) and (1,2) collapse into one canonical row, weights summed
    assert rows == {("1", "2"): 2.0, ("3", "3"): 1.0, ("1", "3"): 1.0}


def test_symmetrized_matches_reference_semantics(spark):
    # convert_matrix.py:600-613 — both directions, self-loop once
    g = Graph.from_edge_list(spark, [(1, 2), (3, 3)], directed=False)
    rows = sorted((r.src, r.dst) for r in g.symmetrized().collect())
    assert rows == [("1", "2"), ("2", "1"), ("3", "3")]


def test_undirected_degree_selfloop_counts_twice(spark):
    # reportviews.py:521-528
    g = Graph.from_edge_list(spark, [(1, 2), (1, 1)], directed=False)
    assert as_dict(g.degrees(), "id", "degree") == {"1": 3, "2": 1}


def test_directed_in_out_degrees(spark):
    g = Graph.from_edge_list(spark, [(1, 2), (1, 3), (2, 3)], directed=True)
    assert as_dict(g.out_degrees(), "id", "degree") == {"1": 2, "2": 1, "3": 0}
    assert as_dict(g.in_degrees(), "id", "degree") == {"1": 0, "2": 1, "3": 2}
    assert as_dict(g.degrees(), "id", "degree") == {"1": 2, "2": 2, "3": 2}


def test_weighted_degree(spark):
    g = Graph.from_edge_list(spark, [(1, 2, 2.5), (1, 3, 0.5)], directed=False)
    assert as_dict(g.degrees(weighted=True), "id", "degree") == \
        {"1": 3.0, "2": 2.5, "3": 0.5}


def test_isolates_and_vertices(spark):
    g = Graph.from_edge_list(spark, [(1, 2)], directed=False, nodes=[1, 2, 9])
    assert {r.id for r in g.vertices().collect()} == {"1", "2", "9"}
    assert {r.id for r in g.isolates().collect()} == {"9"}


def test_subgraph_induced(spark):
    g = Graph.from_edge_list(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    nodes = spark.createDataFrame([("1",), ("2",), ("3",)], "id string")
    sub = g.subgraph(nodes)
    assert sorted((r.src, r.dst) for r in sub.edges.collect()) == [("1", "2"), ("2", "3")]


def test_reverse_and_to_undirected(spark):
    g = Graph.from_edge_list(spark, [(1, 2), (2, 1), (2, 3)], directed=True)
    rev = {(r.src, r.dst) for r in g.reverse().edges.collect()}
    assert rev == {("2", "1"), ("1", "2"), ("3", "2")}
    und = g.to_undirected()
    rows = {(r.src, r.dst): r.weight for r in und.edges.collect()}
    assert rows == {("1", "2"): 2.0, ("2", "3"): 1.0}


def test_selfloops_density_size(spark):
    g = Graph.from_edge_list(spark, [(1, 1), (1, 2, 3.0)], directed=False)
    assert [(r.src, r.dst) for r in g.selfloops().collect()] == [("1", "1")]
    assert g.size() == 2.0 and g.size(weighted=True) == 4.0
    assert g.density() == pytest.approx(2 * 2 / (2 * 1))


def test_with_vids_dense_and_joinable(spark):
    g = Graph.from_edge_list(spark, [("b", "a"), ("c", "a")], directed=True)
    vmap, e = g.with_vids()
    m = as_dict(vmap, "id", "vid")
    assert sorted(m.values()) == [0, 1, 2]
    assert m["a"] < m["b"] < m["c"]  # ordered by id, deterministic
    pairs = {(r.src, r.dst) for r in e.collect()}
    assert pairs == {(m["b"], m["a"]), (m["c"], m["a"])}


def test_with_vids_two_level_no_single_partition_exchange(spark):
    # the dictionary build must never funnel all rows through one
    # partition (the classic global row_number bottleneck)
    from pyspark.sql import functions as F
    edges = spark.range(5000).select(
        F.col("id").alias("src"), ((F.col("id") * 7) % 4999).alias("dst"))
    g = Graph.from_edges(edges.filter("src <> dst"))
    vmap, _ = g.with_vids()
    plan = vmap._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    vids = [r.vid for r in vmap.collect()]
    assert sorted(vids) == list(range(len(vids)))          # dense 0..N-1
    m = as_dict(vmap, "id", "vid")
    ids = sorted(m)
    assert [m[i] for i in ids] == sorted(m.values())       # ordered by id


def test_empty_graph(spark):
    g = Graph.from_edge_list(spark, [], directed=False)
    assert g.number_of_vertices() == 0
    assert g.number_of_edges() == 0
    assert g.density() == 0.0


def test_functional_mutation(spark):
    from pyspark.sql import functions as F
    g = Graph.from_edge_list(spark, [("a", "b", 1.0)], directed=False)
    g2 = g.add_edges(spark.createDataFrame(
        [("b", "c", 2.0), ("b", "a", 9.0)], "src string, dst string, weight double"),
        weight="weight")
    got = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    assert got == {("a", "b"): 9.0, ("b", "c"): 2.0}   # new weight wins
    g3 = g2.remove_edges(spark.createDataFrame([("c", "b")], "src string, dst string"))
    assert {(r.src, r.dst) for r in g3.edges.collect()} == {("a", "b")}
    assert g3.has_vertex("c")                          # endpoint survives
    g4 = g3.remove_vertices(spark.createDataFrame([("a",)], "id string"))
    assert g4.number_of_edges() == 0
    assert {r.id for r in g4.vertices().collect()} == {"b", "c"}
    g5 = g4.add_vertices(spark.createDataFrame([("z",)], "id string"))
    assert g5.has_vertex("z")
    # original snapshot untouched
    assert g.number_of_edges() == 1


def test_relabel(spark):
    g = Graph.from_edge_list(spark, [("a", "b", 1.0), ("b", "c", 5.0)],
                             directed=False)
    m = spark.createDataFrame([("a", "x"), ("c", "x")], "old string, new string")
    r = g.relabel(m)
    got = {(r_.src, r_.dst): r_.weight for r_ in r.edges.collect()}
    # a and c merge onto x; parallel (x,b) edges combine by max
    assert got == {("b", "x"): 5.0}
    assert {v.id for v in r.vertices().collect()} == {"b", "x"}

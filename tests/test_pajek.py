"""Pajek .net I/O round-trips against the reference reader/writer."""

import os

import networkx as nx
import pytest

from networkx_spark.graph import Graph
from networkx_spark.readwrite import read_pajek, write_pajek


def test_write_then_reference_reads(spark, tmp_path):
    g = Graph.from_edge_list(
        spark, [("a", "b", 2.0), ("b", "c", 1.5), ("a", "c", 1.0)],
        directed=True)
    p = os.path.join(tmp_path, "g.net")
    write_pajek(g, p)
    R = nx.read_pajek(p)          # reference returns a MultiDiGraph
    assert set(R.nodes) == {"a", "b", "c"}
    got = {(u, v, d["weight"]) for u, v, d in R.edges(data=True)}
    assert got == {("a", "b", 2.0), ("b", "c", 1.5), ("a", "c", 1.0)}


def test_reference_writes_then_engine_reads(spark, tmp_path):
    G = nx.Graph()
    G.add_weighted_edges_from(
        [("x y", "z", 3.0), ("z", "w", 1.0)])   # label with a space
    G.add_node("lonely")
    p = os.path.join(tmp_path, "ref.net")
    nx.write_pajek(G, p)
    g = read_pajek(spark, p)
    assert not g.directed
    assert {r.id for r in g.vertices().collect()} == {"x y", "z", "w", "lonely"}
    got = {(r.src, r.dst, r.weight) for r in g.edges.collect()}
    assert got == {(min("x y", "z"), max("x y", "z"), 3.0), ("w", "z", 1.0)}


def test_engine_round_trip_undirected_isolates(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(1, 2), (2, 3)], directed=False)
    g = g.add_vertices(spark.createDataFrame([("9",)], "id string"))
    p = os.path.join(tmp_path, "rt.net")
    write_pajek(g, p)
    g2 = read_pajek(spark, p)
    assert not g2.directed
    assert ({r.id for r in g2.vertices().collect()}
            == {r.id for r in g.vertices().collect()})
    assert ({(r.src, r.dst) for r in g2.edges.collect()}
            == {(r.src, r.dst) for r in g.edges.collect()})


def test_directed_flag_and_default_weight(spark, tmp_path):
    p = os.path.join(tmp_path, "hand.net")
    with open(p, "w") as fh:
        fh.write('*Vertices 2\n1 "u"\n2 "v"\n*Arcs\n1 2\n')
    g = read_pajek(spark, p)
    assert g.directed
    rows = g.edges.collect()
    assert [(r.src, r.dst, r.weight) for r in rows] == [("u", "v", 1.0)]


def test_empty_graph(spark, tmp_path):
    p = os.path.join(tmp_path, "empty.net")
    with open(p, "w") as fh:
        fh.write("*Vertices 0\n*Edges\n")
    g = read_pajek(spark, p)
    assert g.edges.count() == 0 and g.vertices().count() == 0

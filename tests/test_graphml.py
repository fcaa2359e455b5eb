"""GraphML round-trips against the reference parser/writer."""

import os

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.readwrite import read_graphml, write_graphml


def _sample(spark):
    g = Graph.from_edge_list(
        spark, [("a", "b", 2.5), ("b", "c", 1.0), ("a", "c", 4.0)],
        directed=True, nodes=["a", "b", "c", "lonely"])
    vattrs = spark.createDataFrame(
        [("a", "alpha", 1), ("b", "beta <&> \"q\"", 2), ("c", "gamma", 3)],
        "id string, name string, rank bigint")
    eattrs = spark.createDataFrame(
        [("a", "b", "friend"), ("b", "c", "foe")],
        "src string, dst string, rel string")
    return g.with_vertex_attrs(vattrs).with_edge_attrs(eattrs)


def test_write_graphml_read_by_reference(spark, tmp_path):
    path = os.path.join(tmp_path, "g.graphml")
    write_graphml(_sample(spark), path)
    G = nx.read_graphml(path)
    assert isinstance(G, nx.DiGraph)
    assert set(G.nodes) == {"a", "b", "c", "lonely"}
    assert G.nodes["b"]["name"] == 'beta <&> "q"'
    assert G.nodes["c"]["rank"] == 3
    assert G["a"]["b"]["weight"] == 2.5
    assert G["a"]["b"]["rel"] == "friend"
    assert G["a"]["c"]["weight"] == 4.0


def test_read_graphml_written_by_reference(spark, tmp_path):
    G = nx.Graph()
    G.add_edge("x", "y", weight=3.5, rel="near")
    G.add_edge("y", "z", weight=1.0)
    G.add_node("solo", color="red")
    path = os.path.join(tmp_path, "ref.graphml")
    nx.write_graphml(G, path)
    g = read_graphml(spark, path)
    assert not g.directed
    assert {r["id"] for r in g.vertices().collect()} == {"x", "y", "z", "solo"}
    edges = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert edges[("x", "y")] == 3.5
    ea = {(r["src"], r["dst"]): r["rel"] for r in g._edge_attrs.collect()}
    assert ea[("x", "y")] == "near"
    va = {r["id"]: r["color"] for r in g._vertex_attrs.collect()}
    assert va["solo"] == "red"


def test_graphml_self_round_trip(spark, tmp_path):
    path = os.path.join(tmp_path, "rt.graphml")
    g0 = _sample(spark)
    write_graphml(g0, path)
    g1 = read_graphml(spark, path)
    assert g1.directed == g0.directed
    assert ({tuple(r) for r in g1.edges.collect()}
            == {tuple(r) for r in g0.edges.collect()})
    assert ({r["id"] for r in g1.vertices().collect()}
            == {r["id"] for r in g0.vertices().collect()})

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


# ------------------------------------------------------------------- GML
from networkx_spark.readwrite import read_gml, write_gml


def test_write_gml_read_by_reference(spark, tmp_path):
    path = os.path.join(tmp_path, "g.gml")
    g = Graph.from_edge_list(
        spark, [("a", "b", 2.5), ("b", "c & d", 1.0)],
        directed=True, nodes=["a", "b", "c & d", "solo"])
    write_gml(g, path)
    G = nx.read_gml(path)
    assert isinstance(G, nx.DiGraph)
    assert set(G.nodes) == {"a", "b", "c & d", "solo"}
    assert G["a"]["b"]["weight"] == 2.5


def test_read_gml_written_by_reference(spark, tmp_path):
    G = nx.Graph()
    G.add_edge("x", "y", weight=3.5)
    G.add_edge("y", "z quoted \" ok", weight=1.0)
    G.add_node("lonely")
    path = os.path.join(tmp_path, "ref.gml")
    nx.write_gml(G, path)
    g = read_gml(spark, path)
    assert not g.directed
    assert {r["id"] for r in g.vertices().collect()} == set(G.nodes)
    edges = {frozenset((r["src"], r["dst"])): r["weight"]
             for r in g.edges.collect()}
    assert edges[frozenset(("x", "y"))] == 3.5


def test_gml_self_round_trip(spark, tmp_path):
    path = os.path.join(tmp_path, "rt.gml")
    g0 = Graph.from_edge_list(spark, [(0, 1, 2.0), (1, 2, 1.0)],
                              directed=False, nodes=[0, 1, 2, 3])
    write_gml(g0, path)
    g1 = read_gml(spark, path)
    assert ({tuple(r) for r in g1.edges.collect()}
            == {tuple(r) for r in g0.edges.collect()})
    assert g1.vertices().count() == 4


# -------------------------------------------------------------------- GEXF
def test_write_gexf_read_by_reference(spark, tmp_path):
    from networkx_spark.readwrite import write_gexf
    path = os.path.join(tmp_path, "g.gexf")
    write_gexf(_sample(spark), path)
    G = nx.read_gexf(path)
    assert isinstance(G, nx.DiGraph)
    assert set(G.nodes) == {"a", "b", "c", "lonely"}
    assert G.nodes["b"]["name"] == 'beta <&> "q"'
    assert G.nodes["c"]["rank"] == 3
    assert G["a"]["b"]["weight"] == 2.5
    assert G["a"]["b"]["rel"] == "friend"


def test_read_gexf_written_by_reference(spark, tmp_path):
    from networkx_spark.readwrite import read_gexf
    G = nx.Graph()
    G.add_edge("x", "y", weight=3.5, rel="near")
    G.add_edge("y", "z", weight=1.0)
    G.add_node("solo", color="red")
    path = os.path.join(tmp_path, "ref.gexf")
    nx.write_gexf(G, path)
    g = read_gexf(spark, path)
    assert not g.directed
    assert {r["id"] for r in g.vertices().collect()} == {"x", "y", "z", "solo"}
    edges = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert edges[("x", "y")] == 3.5
    va = {r["id"]: r["color"] for r in g._vertex_attrs.collect()}
    assert va["solo"] == "red"


def test_gexf_self_round_trip(spark, tmp_path):
    from networkx_spark.readwrite import read_gexf, write_gexf
    path = os.path.join(tmp_path, "rt.gexf")
    g0 = _sample(spark)
    write_gexf(g0, path)
    g1 = read_gexf(spark, path)
    assert g1.directed
    assert ({tuple(r) for r in g1.edges.select("src", "dst", "weight").collect()}
            == {tuple(r) for r in g0.edges.select("src", "dst", "weight").collect()})
    # the reader materializes an attr row per node (absent attrs NULL)
    got = {tuple(r) for r in g1._vertex_attrs.collect()
           if any(v is not None for v in r[1:])}
    assert got == {tuple(r) for r in g0._vertex_attrs.collect()}

"""Round-2 API surface: attribute tables, n-ary setops, classic
generators, edge/adjacency-list file I/O, adjacency accessors."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.attributes import (get_edge_attributes, get_node_attributes,
                                       set_edge_attributes, set_node_attributes)
from networkx_spark.graph import Graph
from networkx_spark.operators.setops import (compose, compose_all,
                                             disjoint_union_all, full_join,
                                             intersection_all, union_all)
from tests.conftest import as_dict


# ------------------------------------------------------------- attributes
def test_vertex_attrs_set_get_default(spark):
    g = Graph.from_edge_list(spark, [("a", "b"), ("b", "c")], directed=False)
    attrs = spark.createDataFrame([("a", "en"), ("b", "de")], "id string, lang string")
    g2 = set_node_attributes(g, attrs)
    assert as_dict(get_node_attributes(g2, "lang"), "id", "lang") == \
        {"a": "en", "b": "de"}
    assert as_dict(get_node_attributes(g2, "lang", default="und"), "id", "lang") == \
        {"a": "en", "b": "de", "c": "und"}
    # cell-level update: later set wins only where it has values
    g3 = set_node_attributes(g2, spark.createDataFrame(
        [("b", "fr")], "id string, lang string"))
    assert as_dict(get_node_attributes(g3, "lang"), "id", "lang") == \
        {"a": "en", "b": "fr"}


def test_edge_attrs_and_subgraph_preserve(spark):
    g = Graph.from_edge_list(spark, [("a", "b"), ("b", "c"), ("a", "c")],
                             directed=False)
    ea = spark.createDataFrame([("b", "a", "2024"), ("b", "c", "2025")],
                               "src string, dst string, crawl string")
    g2 = set_edge_attributes(g, ea)   # keys canonicalized (a<b)
    got = {(r.src, r.dst): r.crawl for r in get_edge_attributes(g2, "crawl").collect()}
    assert got == {("a", "b"): "2024", ("b", "c"): "2025"}
    sub = g2.subgraph(spark.createDataFrame([("a",), ("b",)], "id string"))
    got2 = {(r.src, r.dst): r.crawl for r in get_edge_attributes(sub, "crawl").collect()}
    assert got2 == {("a", "b"): "2024"}    # live-edge filtered, attr kept


def test_compose_attrs_b_wins(spark):
    a = Graph.from_edge_list(spark, [("x", "y")], directed=False)
    a = set_node_attributes(a, spark.createDataFrame(
        [("x", 1), ("y", 1)], "id string, v int"))
    b = Graph.from_edge_list(spark, [("y", "z")], directed=False)
    b = set_node_attributes(b, spark.createDataFrame(
        [("y", 2), ("z", 2)], "id string, v int"))
    c = compose(a, b)
    assert as_dict(get_node_attributes(c, "v"), "id", "v") == \
        {"x": 1, "y": 2, "z": 2}


def test_weight_is_an_edge_attr(spark):
    g = Graph.from_edge_list(spark, [("a", "b", 3.5)], directed=False)
    got = {(r.src, r.dst): r.weight for r in
           get_edge_attributes(g, "weight").collect()}
    assert got == {("a", "b"): 3.5}


# ---------------------------------------------------------------- setops
def test_full_join_matches_reference_shape(spark):
    a = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    b = Graph.from_edge_list(spark, [(2, 3)], directed=False)
    fj = full_join(a, b)
    # reference full_join: |E| = Ea + Eb + |Va|*|Vb| (binary.py:373)
    assert fj.number_of_edges() == 1 + 1 + 4
    assert fj.number_of_vertices() == 4


def test_nary_setops(spark):
    gs = [Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
          for _ in range(3)]
    u = union_all(gs)
    assert u.number_of_vertices() == 9 and u.number_of_edges() == 6
    d = disjoint_union_all(gs)
    assert d.number_of_vertices() == 9
    c = compose_all(gs)
    assert c.number_of_vertices() == 3 and c.number_of_edges() == 2
    i = intersection_all(gs)
    assert i.number_of_edges() == 2
    with pytest.raises(ValueError):
        union_all([])


# ------------------------------------------------------------- generators
def test_classic_generators_match_reference(spark):
    from networkx_spark.generators import (complete_graph, cycle_graph,
                                           karate_club_graph, path_graph,
                                           star_graph)
    assert complete_graph(spark, 5).number_of_edges() == 10
    assert complete_graph(spark, 4, directed=True).number_of_edges() == 12
    assert path_graph(spark, 6).number_of_edges() == 5
    assert cycle_graph(spark, 6).number_of_edges() == 6
    sg = star_graph(spark, 5)
    assert sg.number_of_vertices() == 6 and sg.number_of_edges() == 5
    kg = karate_club_graph(spark)
    K = nx.karate_club_graph()
    assert kg.number_of_vertices() == K.number_of_nodes()
    assert kg.number_of_edges() == K.number_of_edges()
    got = {(r.src, r.dst) for r in kg.edges.collect()}
    want = {(min(u, v), max(u, v)) for u, v in K.edges()}
    assert got == want


def test_gnp_seeded_and_partition_invariant(spark):
    from networkx_spark.generators import gnp_random_graph
    g1 = gnp_random_graph(spark, 40, 0.1, seed=5)
    g2 = gnp_random_graph(spark, 40, 0.1, seed=5)
    e1 = {(r.src, r.dst) for r in g1.edges.collect()}
    e2 = {(r.src, r.dst) for r in g2.edges.collect()}
    assert e1 == e2 and len(e1) > 0
    g3 = gnp_random_graph(spark, 40, 0.1, seed=6)
    assert {(r.src, r.dst) for r in g3.edges.collect()} != e1
    # density in a plausible band around p
    n_pairs = 40 * 39 / 2
    assert 0.03 < len(e1) / n_pairs < 0.25
    assert g1.number_of_vertices() == 40      # isolated vertices included


# ------------------------------------------------------------------ file IO
def test_edgelist_roundtrip(spark, tmp_path):
    from networkx_spark.readwrite import read_edgelist, write_edgelist
    g = Graph.from_edge_list(spark, [("a", "b", 2.0), ("b", "c", 1.5)],
                             directed=False)
    path = str(tmp_path / "el")
    write_edgelist(g, path)
    g2 = read_edgelist(spark, path, weighted=True)
    assert {(r.src, r.dst, r.weight) for r in g2.edges.collect()} == \
        {("a", "b", 2.0), ("b", "c", 1.5)}


def test_read_edgelist_comments_and_unweighted(spark, tmp_path):
    from networkx_spark.readwrite import read_edgelist
    p = tmp_path / "snap.txt"
    p.write_text("# FromNodeId ToNodeId\n1 2\n2 3\n\n# trailer\n3 1\n")
    g = read_edgelist(spark, str(p), directed=True)
    assert {(r.src, r.dst) for r in g.edges.collect()} == \
        {("1", "2"), ("2", "3"), ("3", "1")}


def test_adjlist_roundtrip(spark, tmp_path):
    from networkx_spark.readwrite import read_adjlist, write_adjlist
    g = Graph.from_edge_list(spark, [("a", "b"), ("a", "c")], directed=False,
                             nodes=["z"])
    path = str(tmp_path / "al")
    write_adjlist(g, path)
    g2 = read_adjlist(spark, path)
    assert {(r.src, r.dst) for r in g2.edges.collect()} == \
        {(r.src, r.dst) for r in g.edges.collect()}
    assert g2.has_vertex("z")


# ------------------------------------------------------------- adjacency API
def test_to_directed_and_neighbors(spark):
    g = Graph.from_edge_list(spark, [("a", "b"), ("b", "c")], directed=False)
    d = g.to_directed()
    assert d.directed and d.number_of_edges() == 4      # reciprocal pairs
    assert {r.id for r in g.neighbors("b").collect()} == {"a", "c"}
    dg = Graph.from_edge_list(spark, [(1, 2), (3, 2)], directed=True)
    assert {r.id for r in dg.successors("1").collect()} == {"2"}
    assert {r.id for r in dg.predecessors("2").collect()} == {"1", "3"}
    assert {r.id for r in dg.neighbors("1").collect()} == {"2"}


# -------------------------------------------------------------- converters
def test_dict_converters_roundtrip(spark):
    import networkx as nx
    from networkx_spark.convert import (from_dict_of_dicts, from_dict_of_lists,
                                        to_dict_of_dicts, to_dict_of_lists)
    g = Graph.from_edge_list(spark, [("a", "b", 2.0), ("b", "c", 1.0)],
                             directed=False, nodes=["z"])
    dd = to_dict_of_dicts(g)
    G = nx.Graph(); G.add_weighted_edges_from([("a", "b", 2.0), ("b", "c", 1.0)])
    G.add_node("z")
    assert dd == nx.to_dict_of_dicts(G)
    g2 = from_dict_of_dicts(spark, dd, directed=False)
    assert {(r.src, r.dst, r.weight) for r in g2.edges.collect()} == \
        {(r.src, r.dst, r.weight) for r in g.edges.collect()}
    dl = to_dict_of_lists(g)
    assert dl == {k: sorted(v) for k, v in nx.to_dict_of_lists(G).items()}
    g3 = from_dict_of_lists(spark, dl, directed=False)
    assert g3.number_of_edges() == 2 and g3.has_vertex("z")


def test_numpy_converters_roundtrip(spark):
    import numpy as np
    from networkx_spark.convert import from_numpy_array, to_numpy_array
    a = np.array([[0.0, 2.0, 0.0], [0.0, 0.0, 1.0], [3.0, 0.0, 0.0]])
    g = from_numpy_array(spark, a, directed=True)
    b, nodes = to_numpy_array(g)
    order = np.argsort([int(n) for n in nodes])
    assert (b[np.ix_(order, order)] == a).all()
    with __import__("pytest").raises(ValueError):
        to_numpy_array(g, cap=1)


def test_google_matrix_matches_reference(spark):
    import networkx as nx
    import numpy as np
    from networkx_spark.convert import google_matrix
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]  # e dangling
    g = Graph.from_edge_list(spark, edges, directed=True, nodes=["e"])
    G = nx.DiGraph(edges); G.add_node("e")
    m, nodes = google_matrix(g, alpha=0.85)
    ref = np.asarray(nx.google_matrix(G, alpha=0.85, nodelist=nodes))
    assert np.allclose(m, ref)
    m2, nodes2 = google_matrix(g, alpha=0.9, personalization={"a": 2.0, "b": 1.0})
    ref2 = np.asarray(nx.google_matrix(G, alpha=0.9, nodelist=nodes2,
                                       personalization={"a": 2.0, "b": 1.0}))
    assert np.allclose(m2, ref2)
    with __import__("pytest").raises(ZeroDivisionError):
        google_matrix(g, personalization={"a": 0.0})


def test_pandas_edgelist_roundtrip(spark):
    import pandas as pd
    from networkx_spark.convert import from_pandas_edgelist, to_pandas_edgelist
    df = pd.DataFrame({"source": ["a", "b"], "target": ["b", "c"],
                       "w": [2.0, 3.0]})
    g = from_pandas_edgelist(spark, df, edge_attr="w", directed=True)
    assert {(r.src, r.dst, r.weight) for r in g.edges.collect()} == \
        {("a", "b", 2.0), ("b", "c", 3.0)}
    out = to_pandas_edgelist(g).sort_values("source").reset_index(drop=True)
    assert list(out["source"]) == ["a", "b"]
    assert list(out["weight"]) == [2.0, 3.0]


def test_universal_ingest_dispatch(spark):
    import numpy as np
    import pandas as pd
    from networkx_spark.convert import to_spark_graph
    # Graph pass-through + direction coercion
    g = Graph.from_edge_list(spark, [("a", "b")], directed=True)
    assert to_spark_graph(spark, g) is g
    assert to_spark_graph(spark, g, directed=False).directed is False
    # Spark DataFrame with src/dst and with source/target
    e1 = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert to_spark_graph(spark, e1).number_of_edges() == 1
    e2 = spark.createDataFrame([("a", "b")], "source string, target string")
    assert to_spark_graph(spark, e2).number_of_edges() == 1
    # dict-of-dicts vs dict-of-lists sniffing
    assert to_spark_graph(spark, {"a": {"b": {"weight": 2.0}}}).number_of_edges() == 1
    assert to_spark_graph(spark, {"a": ["b", "c"]}).number_of_edges() == 2
    # numpy adjacency, pandas edgelist, plain edge list
    assert to_spark_graph(spark, np.eye(2)).number_of_edges() == 2
    pdf = pd.DataFrame({"source": ["x"], "target": ["y"]})
    assert to_spark_graph(spark, pdf).number_of_edges() == 1
    assert to_spark_graph(spark, [("u", "v"), ("v", "w")]).number_of_edges() == 2
    with __import__("pytest").raises(TypeError):
        to_spark_graph(spark, 42)

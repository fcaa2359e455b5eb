"""MultiGraph key-preserving parallel-edge semantics vs the reference."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.multigraph import MultiGraph


@pytest.fixture(scope="module")
def mg(spark):
    rows = [("a", "b", 1.0), ("a", "b", 2.0), ("b", "a", 3.0),
            ("b", "c", 1.0), ("c", "c", 5.0)]
    e = spark.createDataFrame(rows, "src string, dst string, weight double")
    return MultiGraph.from_edges(e, weight="weight")


def _ref():
    g = nx.MultiGraph()
    g.add_edge("a", "b", weight=1.0)
    g.add_edge("a", "b", weight=2.0)
    g.add_edge("b", "a", weight=3.0)
    g.add_edge("b", "c", weight=1.0)
    g.add_edge("c", "c", weight=5.0)
    return g


def test_parallel_edges_kept(mg):
    ref = _ref()
    assert mg.number_of_edges() == ref.number_of_edges() == 5
    assert mg.number_of_edges("a", "b") == ref.number_of_edges("a", "b") == 3
    # keys unique per pair, 0..k-1
    keys = [r["key"] for r in
            mg.edges.filter("src='a' and dst='b'").orderBy("key").collect()]
    assert keys == [0, 1, 2]


def test_degrees_match_reference(mg):
    ref = dict(_ref().degree())
    got = {r["id"]: r["degree"] for r in mg.degrees().collect()}
    assert got == ref
    refw = dict(_ref().degree(weight="weight"))
    gotw = {r["id"]: r["degree"] for r in mg.degrees(weighted=True).collect()}
    assert gotw == refw


def test_has_edge_and_keyed_lookup(mg):
    assert mg.has_edge("a", "b")
    assert mg.has_edge("b", "a", key=2)
    assert not mg.has_edge("a", "c")
    assert not mg.has_edge("a", "b", key=7)


def test_add_remove_functional(mg):
    g2 = mg.add_edge("a", "b", weight=9.0)      # auto key = 3
    assert g2.number_of_edges("a", "b") == 4
    assert mg.number_of_edges("a", "b") == 3    # original untouched
    g3 = g2.remove_edge("a", "b")               # removes highest key
    assert g3.number_of_edges("a", "b") == 3
    with pytest.raises(KeyError):
        mg.remove_edge("a", "z")


def test_to_graph_collapses_like_csr(mg):
    # the reference's CSR build sums parallel-edge weights (COO duplicate
    # entries, convert_matrix.py:615); replicate with get_edge_data sums
    ref = _ref()
    want = sum(d["weight"] for d in ref.get_edge_data("a", "b").values())
    g = mg.to_graph(combine="sum")
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert w[("a", "b")] == want == 6.0
    assert g.edges.count() == 3

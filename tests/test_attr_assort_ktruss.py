"""Attribute/numeric assortativity + k-truss vs the reference oracle."""

import math

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.assortativity import (
    attribute_assortativity_coefficient, numeric_assortativity_coefficient)
from networkx_spark.algorithms.kcore import k_truss
from networkx_spark.generators import KARATE_EDGES


def _attr_graph(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    attrs = spark.createDataFrame(
        [(str(i), ["red", "blue", "green"][i % 3], float(i % 5))
         for i in range(34)],
        "id string, color string, size double")
    return g.with_vertex_attrs(attrs)


def _ref_graph():
    G = nx.Graph(KARATE_EDGES)
    for i in G.nodes:
        G.nodes[i]["color"] = ["red", "blue", "green"][i % 3]
        G.nodes[i]["size"] = float(i % 5)
    return G


def test_attribute_assortativity_matches_reference(spark):
    got = attribute_assortativity_coefficient(_attr_graph(spark), "color")
    want = nx.attribute_assortativity_coefficient(_ref_graph(), "color")
    assert got == pytest.approx(want, abs=1e-9)


def test_attribute_assortativity_perfect(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    attrs = spark.createDataFrame(
        [("0", "a"), ("1", "a"), ("2", "b"), ("3", "b")], "id string, c string")
    assert attribute_assortativity_coefficient(
        g.with_vertex_attrs(attrs), "c") == pytest.approx(1.0)


def test_attribute_assortativity_directed(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3)])
    for i in G.nodes:
        G.nodes[i]["c"] = "ab"[i % 2]
    g = Graph.from_edge_list(spark, list(G.edges()), directed=True)
    attrs = spark.createDataFrame(
        [(str(i), "ab"[i % 2]) for i in G.nodes], "id string, c string")
    got = attribute_assortativity_coefficient(g.with_vertex_attrs(attrs), "c")
    want = nx.attribute_assortativity_coefficient(G, "c")
    assert got == pytest.approx(want, abs=1e-9)


def test_numeric_assortativity_matches_reference(spark):
    got = numeric_assortativity_coefficient(_attr_graph(spark), "size")
    want = nx.numeric_assortativity_coefficient(_ref_graph(), "size")
    assert got == pytest.approx(want, abs=1e-9)


def test_missing_attribute_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(KeyError):
        attribute_assortativity_coefficient(g, "nope")


@pytest.mark.parametrize("k", [3, 4, 5])
def test_k_truss_matches_reference(spark, k):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    H = nx.k_truss(nx.Graph(KARATE_EDGES), k)
    got = {(r["src"], r["dst"]) for r in k_truss(g, k).edges.collect()}
    want = {(str(min(u, v)), str(max(u, v))) for u, v in H.edges()}
    # string vs int canonicalization can flip (e.g. "10" < "2"): compare
    # as frozenset pairs
    assert {frozenset(p) for p in got} == {frozenset(p) for p in want}


def test_k_truss_empty_and_guards(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    assert k_truss(g, 10).edges.count() == 0
    with pytest.raises(ValueError):
        k_truss(Graph.from_edge_list(spark, [(0, 1)], directed=True), 3)
    with pytest.raises(ValueError):
        k_truss(Graph.from_edge_list(spark, [(0, 0), (0, 1)], directed=False), 3)

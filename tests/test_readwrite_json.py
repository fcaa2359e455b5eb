"""JSON node-link I/O + google_matrix vs the reference oracle."""

import numpy as np
import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.convert import google_matrix
from networkx_spark.generators import KARATE_EDGES
from networkx_spark.readwrite import (node_link_data, node_link_graph,
                                      read_node_link_json,
                                      write_node_link_json)


def test_node_link_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(1, 2, 2.5), (2, 3, 1.0)],
                             directed=False, nodes=[1, 2, 3, 4])
    d = node_link_data(g)
    assert d["directed"] is False and d["multigraph"] is False
    assert {n["id"] for n in d["nodes"]} == {"1", "2", "3", "4"}
    # reference can consume it directly
    G = nx.node_link_graph(d)
    assert set(G.nodes) == {"1", "2", "3", "4"}
    assert G["1"]["2"]["weight"] == 2.5
    # file round-trip through the engine
    p = str(tmp_path / "g.json")
    write_node_link_json(g, p)
    g2 = read_node_link_json(spark, p)
    assert sorted((r.src, r.dst, r.weight) for r in g2.edges.collect()) == \
        sorted((r.src, r.dst, r.weight) for r in g.edges.collect())
    assert g2.number_of_vertices() == 4


def test_node_link_accepts_reference_output(spark):
    G = nx.path_graph(4)
    d = nx.node_link_data(G)
    g = node_link_graph(spark, d)
    assert g.number_of_vertices() == 4
    assert g.number_of_edges() == 3


def test_google_matrix_matches_reference(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    m, nodes = google_matrix(g)
    G = nx.Graph([(str(u), str(v)) for u, v in KARATE_EDGES])
    want = nx.google_matrix(G, nodelist=nodes)
    assert np.allclose(m, np.asarray(want), atol=1e-12)
    # rows are stochastic
    assert np.allclose(m.sum(axis=1), 1.0)


def test_google_matrix_dangling_and_personalization(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=True)
    pers = {"0": 1.0, "1": 1.0, "2": 2.0}
    m, nodes = google_matrix(g, alpha=0.9, personalization=pers)
    G = nx.DiGraph([("0", "1"), ("1", "2")])
    want = nx.google_matrix(G, alpha=0.9, personalization=pers, nodelist=nodes)
    assert np.allclose(m, np.asarray(want), atol=1e-12)
    with pytest.raises(ZeroDivisionError):
        google_matrix(g, personalization={"0": 0.0})

"""sparse6 I/O: byte-identical encoding vs the reference, lossless
round-trips, multigraph multiplicity semantics."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.readwrite import from_sparse6_bytes, to_sparse6_bytes


def _g(spark, G):
    e = spark.createDataFrame(list(G.edges) or [(0, 0)], "src long, dst long")
    if not G.edges:
        e = e.limit(0)
    g = Graph.from_edges(e, directed=False)
    return g.add_vertices(spark.range(len(G)).select(F.col("id")))


@pytest.mark.parametrize("G", [
    nx.path_graph(7), nx.cycle_graph(8), nx.complete_graph(4),
    nx.karate_club_graph(), nx.empty_graph(5), nx.star_graph(6),
    nx.empty_graph(0), nx.ladder_graph(9),
    # n = 2^k padding special case (4 = 2^2, last vertex untouched)
    nx.Graph([(0, 1)]),
])
def test_byte_identical_and_roundtrip(spark, G):
    want = nx.to_sparse6_bytes(G)
    got = to_sparse6_bytes(_g(spark, G))
    assert got == want
    back = from_sparse6_bytes(spark, got)
    assert {(r.src, r.dst) for r in back.edges.collect()} \
        == {tuple(sorted(e)) for e in G.edges}
    assert back.number_of_vertices() == len(G)


def test_padding_special_case_n_power_of_two(spark):
    # 4-vertex graph, current vertex stays below n-1: the naive all-ones
    # padding would fabricate a loop on vertex 3 — the reference inserts a
    # 0 bit first; parity proves we reproduce that branch
    G = nx.Graph([(0, 1), (1, 2)])
    G.add_node(3)
    assert to_sparse6_bytes(_g(spark, G)) == nx.to_sparse6_bytes(G)


def test_multigraph_multiplicity(spark):
    # reference doc example: b":A_" is a triple edge (0, 1)
    g = from_sparse6_bytes(spark, b":A_")
    rows = g.edges.collect()
    assert len(rows) == 1 and (rows[0].src, rows[0].dst) == (0, 1)
    assert rows[0].weight == 3.0
    # and weight multiplicity is re-emitted on encode
    G = nx.MultiGraph([(0, 1), (0, 1), (0, 1)])
    assert to_sparse6_bytes(g) == nx.to_sparse6_bytes(G)


def test_validation(spark):
    with pytest.raises(ValueError, match="colon"):
        from_sparse6_bytes(spark, b"Bw")
    with pytest.raises(ValueError, match="undirected"):
        to_sparse6_bytes(Graph(
            spark.createDataFrame([(0, 1)], "src long, dst long"),
            directed=True))

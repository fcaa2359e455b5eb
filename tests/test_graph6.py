"""graph6 I/O vs the reference (readwrite/graph6.py)."""

import networkx as nx
import pytest

from networkx_spark.graph import Graph
from networkx_spark.readwrite import from_graph6_bytes, to_graph6_bytes


def _graph(spark, nxg):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                         directed=False)
    iso = [int(v) for v in nxg.nodes() if nxg.degree(v) == 0]
    if iso:
        g = g.add_vertices(spark.createDataFrame([(v,) for v in iso],
                                                 "id long"))
    return g


CASES = [nx.path_graph(5), nx.complete_graph(7), nx.karate_club_graph(),
         nx.empty_graph(4), nx.gnm_random_graph(70, 200, seed=5)]
IDS = ["path", "k7", "karate", "empty4", "random70"]


@pytest.mark.parametrize("nxg", CASES, ids=IDS)
def test_write_matches_reference(spark, nxg):
    got = to_graph6_bytes(_graph(spark, nxg))
    assert got == nx.to_graph6_bytes(nxg)


@pytest.mark.parametrize("nxg", CASES, ids=IDS)
def test_read_round_trip(spark, nxg):
    raw = nx.to_graph6_bytes(nxg)
    g = from_graph6_bytes(spark, raw)
    assert g.number_of_vertices() == nxg.number_of_nodes()
    got = {(r.src, r.dst) for r in g.edges.select("src", "dst").collect()}
    assert got == {tuple(sorted(e)) for e in nxg.edges()}


def test_large_n_header(spark):
    # n = 100 > 62 exercises the 4-byte N(n) header
    nxg = nx.cycle_graph(100)
    assert to_graph6_bytes(_graph(spark, nxg)) == nx.to_graph6_bytes(nxg)
    g = from_graph6_bytes(spark, nx.to_graph6_bytes(nxg))
    assert g.number_of_vertices() == 100 and g.number_of_edges() == 100


def test_self_loop_rejected(spark):
    e = spark.createDataFrame([(0, 0), (0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="self-loop"):
        to_graph6_bytes(Graph.from_edges(e, directed=False))

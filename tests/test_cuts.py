"""Cut metrics + partition quality vs the reference."""

import networkx as nx
import pytest

from networkx_spark.algorithms.cuts import (
    conductance, cut_size, edge_expansion, normalized_cut_size,
    partition_quality, volume)
from networkx_spark.graph import Graph


@pytest.fixture(scope="module")
def karate(spark):
    nxg = nx.karate_club_graph()
    g = Graph.from_edges(
        spark.createDataFrame(list(nxg.edges()), "src long, dst long"),
        directed=False)
    S = list(range(17))
    sdf = spark.createDataFrame([(v,) for v in S], "id long")
    return nxg, g, S, sdf


def test_cut_metrics_match_reference(spark, karate):
    nxg, g, S, sdf = karate
    assert cut_size(g, sdf) == nx.cut_size(nxg, S)
    assert volume(g, sdf) == nx.volume(nxg, S)
    assert normalized_cut_size(g, sdf) == pytest.approx(
        nx.normalized_cut_size(nxg, S))
    assert conductance(g, sdf) == pytest.approx(nx.conductance(nxg, S))
    assert edge_expansion(g, sdf) == pytest.approx(nx.edge_expansion(nxg, S))


def test_cut_size_directed_counts_both_ways(spark):
    nxg = nx.DiGraph([(0, 2), (2, 0), (1, 2), (3, 0)])
    g = Graph.from_edges(
        spark.createDataFrame(list(nxg.edges()), "src long, dst long"),
        directed=True)
    sdf = spark.createDataFrame([(0,), (1,)], "id long")
    # the reference dev snapshot can't default T on DiGraphs; pass it
    assert cut_size(g, sdf) == nx.cut_size(nxg, [0, 1], [2, 3]) == 4


def test_partition_quality_matches_reference(spark, karate):
    nxg, g, S, sdf = karate
    part = [set(S), set(nxg) - set(S)]
    want = nx.community.partition_quality(nxg, part)
    lab = spark.createDataFrame([(v, 0 if v in set(S) else 1) for v in nxg],
                                "id long, community int")
    got = partition_quality(g, lab)
    assert got[0] == pytest.approx(want[0])
    assert got[1] == pytest.approx(want[1])


def test_partition_quality_invalid_cover(spark, karate):
    _, g, _, _ = karate
    bad = g.vertices().limit(5).selectExpr("id", "1 AS community")
    with pytest.raises(ValueError, match="valid cover"):
        partition_quality(g, bad)

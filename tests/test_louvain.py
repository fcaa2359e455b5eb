"""Louvain + modularity vs the reference oracle."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.louvain import louvain_communities, modularity
from networkx_spark.generators import KARATE_EDGES
from tests.conftest import as_dict, as_partition


def _nx_partition(labels: dict) -> list[set]:
    groups = {}
    for v, c in labels.items():
        groups.setdefault(c, set()).add(int(v))
    return list(groups.values())


def test_modularity_matches_reference(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    G = nx.karate_club_graph()
    for nparts in (2, 5, 34):
        labels = {str(v): v % nparts for v in G}
        lab_df = spark.createDataFrame(list(labels.items()), "id string, c int")
        got = modularity(g, lab_df)
        # weight=None: the engine graph has unit weights while
        # nx.karate_club_graph() carries conversation-count edge weights
        want = nx.community.modularity(G, _nx_partition(labels), weight=None)
        assert got == pytest.approx(want, abs=1e-9), nparts


def test_modularity_weighted_selfloop(spark):
    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 2, 3.0), (3, 0, 1.5)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    G = nx.Graph()
    G.add_weighted_edges_from(edges)
    labels = {"0": 0, "1": 0, "2": 1, "3": 1}
    lab_df = spark.createDataFrame(list(labels.items()), "id string, c int")
    got = modularity(g, lab_df)
    want = nx.community.modularity(G, [{0, 1}, {2, 3}], weight="weight")
    assert got == pytest.approx(want, abs=1e-9)


def test_louvain_karate_quality_and_determinism(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    G = nx.karate_club_graph()
    out1 = as_dict(louvain_communities(g, seed=42), "id", "label")
    out2 = as_dict(louvain_communities(g, seed=42), "id", "label")
    assert out1 == out2                               # deterministic
    lab_df = spark.createDataFrame(list(out1.items()), "id string, c string")
    q_engine = modularity(g, lab_df)
    ref_parts = nx.community.louvain_communities(G, weight=None, seed=42)
    q_ref = nx.community.modularity(G, ref_parts, weight=None)
    # quality target: at least the reference's own seeded result minus a
    # small slack (parallel color-schedule vs sequential node order)
    assert q_engine >= q_ref - 0.02, (q_engine, q_ref)
    # sane community count for karate (reference finds ~4)
    n_comms = len(set(out1.values()))
    assert 2 <= n_comms <= 8


def test_louvain_disjoint_cliques_exact(spark):
    # two disjoint triangles + a 4-clique: the optimum is the three cliques
    edges = ([(0, 1), (1, 2), (2, 0),
              (3, 4), (4, 5), (5, 3)] +
             [(a, b) for a in (6, 7, 8, 9) for b in (6, 7, 8, 9) if a < b])
    g = Graph.from_edge_list(spark, edges, directed=False)
    out = louvain_communities(g, seed=1)
    parts = as_partition(out, "id", "label")
    want = frozenset([frozenset({"0", "1", "2"}), frozenset({"3", "4", "5"}),
                      frozenset({"6", "7", "8", "9"})])
    assert parts == want


def test_louvain_directed_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        louvain_communities(g)

"""Closeness/harmonic centrality, DAG ops, reciprocity, dedup clusters,
GEXF round-trip — vs the reference oracle."""

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark import Graph
from networkx_spark.algorithms.centrality import (closeness_centrality,
                                                  harmonic_centrality)
from networkx_spark.algorithms.dag import (HasACycle, ancestors,
                                           is_directed_acyclic_graph,
                                           topological_generations)
from networkx_spark.algorithms.reciprocity import (overall_reciprocity,
                                                   reciprocity)
from networkx_spark.generators import KARATE_EDGES
from tests.conftest import as_dict


DIGRAPH_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 0), (2, 6),
                 (6, 4), (7, 8)]


def _close(got, want, tol=1e-9):
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=tol), (k, got[k], want[k])


# ------------------------------------------------------------- closeness
def test_closeness_karate_matches_reference(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = as_dict(closeness_centrality(g), "id", "closeness")
    want = {str(k): v for k, v in
            nx.closeness_centrality(nx.karate_club_graph()).items()}
    _close(got, want)


def test_closeness_directed_incoming_and_wf(spark):
    g = Graph.from_edge_list(spark, DIGRAPH_EDGES, directed=True)
    G = nx.DiGraph(DIGRAPH_EDGES)
    for wf in (True, False):
        got = as_dict(closeness_centrality(g, wf_improved=wf),
                      "id", "closeness")
        want = {str(k): v for k, v in
                nx.closeness_centrality(G, wf_improved=wf).items()}
        _close(got, want)


def test_closeness_sources_subset(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    srcs = spark.createDataFrame([("0",), ("33",)], "id string")
    got = as_dict(closeness_centrality(g, sources=srcs), "id", "closeness")
    want = nx.closeness_centrality(nx.karate_club_graph())
    assert set(got) == {"0", "33"}
    _close(got, {"0": want[0], "33": want[33]})


def test_harmonic_matches_reference(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = as_dict(harmonic_centrality(g), "id", "harmonic")
    want = {str(k): v for k, v in
            nx.harmonic_centrality(nx.karate_club_graph()).items()}
    _close(got, want)


def test_harmonic_directed_matches_reference(spark):
    g = Graph.from_edge_list(spark, DIGRAPH_EDGES, directed=True)
    got = as_dict(harmonic_centrality(g), "id", "harmonic")
    want = {str(k): v for k, v in
            nx.harmonic_centrality(nx.DiGraph(DIGRAPH_EDGES)).items()}
    _close(got, want)


# ------------------------------------------------------------------- DAG
def test_topological_generations_match_reference(spark):
    dag_edges = [(u, v) for u, v in DIGRAPH_EDGES]
    g = Graph.from_edge_list(spark, dag_edges, directed=True)
    got = as_dict(topological_generations(g), "id", "generation")
    G = nx.DiGraph(dag_edges)
    want = {str(n): i
            for i, gen in enumerate(nx.topological_generations(G))
            for n in gen}
    assert got == want
    # (generation, id) order is a valid topological order
    order = sorted(got, key=lambda n: (got[n], n))
    pos = {n: i for i, n in enumerate(order)}
    assert all(pos[str(u)] < pos[str(v)] for u, v in dag_edges)


def test_cycle_detection(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (2, 3)],
                             directed=True)
    assert not is_directed_acyclic_graph(g)
    with pytest.raises(HasACycle):
        topological_generations(g)
    dag = Graph.from_edge_list(spark, DIGRAPH_EDGES, directed=True)
    assert is_directed_acyclic_graph(dag)
    undirected = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    assert not is_directed_acyclic_graph(undirected)
    with pytest.raises(ValueError):
        topological_generations(undirected)


def test_ancestors_matches_reference(spark):
    g = Graph.from_edge_list(spark, DIGRAPH_EDGES, directed=True)
    got = {r["id"] for r in ancestors(g, "4").collect()}
    want = {str(n) for n in nx.ancestors(nx.DiGraph(DIGRAPH_EDGES), 4)}
    assert got == want


# ------------------------------------------------------------ reciprocity
RECIP_EDGES = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (5, 5)]


def test_overall_reciprocity_matches_reference(spark):
    g = Graph.from_edge_list(spark, RECIP_EDGES, directed=True)
    want = nx.overall_reciprocity(nx.DiGraph(RECIP_EDGES))
    assert math.isclose(overall_reciprocity(g), want, abs_tol=1e-12)


def test_per_node_reciprocity_matches_reference(spark):
    edges = [(u, v) for u, v in RECIP_EDGES if u != v]
    g = Graph.from_edge_list(spark, edges, directed=True)
    got = as_dict(reciprocity(g), "id", "reciprocity")
    G = nx.DiGraph(edges)
    want = {str(k): v for k, v in nx.reciprocity(G, G.nodes()).items()}
    _close(got, want, tol=1e-12)


def test_reciprocity_undirected_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        overall_reciprocity(g)
    with pytest.raises(ValueError):
        reciprocity(g)


def test_overall_reciprocity_empty_raises(spark):
    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        overall_reciprocity(Graph(e, directed=True))


# --------------------------------------------------------- dedup clusters
def test_duplicate_clusters_transitive_closure(spark):
    from networkx_spark.pipeline.dedup import duplicate_clusters
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "extra " + base),
         (4, "completely different text about spark dataframes here"),
         (5, base)],
        "doc_id long, text string")
    out = duplicate_clusters(docs, k=3, threshold=0.5).collect()
    cl = {r["doc_id"]: r["cluster"] for r in out}
    keep = {r["doc_id"]: r["keep"] for r in out}
    # 1,2,3,5 are near-dups (shared shingle mass), 4 stands alone
    assert cl[1] == cl[2] == cl[3] == cl[5] == 1
    assert cl[4] == 4
    assert keep == {1: True, 2: False, 3: False, 5: False, 4: True}

"""Blocked-CSR PageRank parity with the row-wise DataFrame kernel and the
reference goldens."""

import pytest
from pyspark.sql import functions as F

from networkx_spark import Graph, pagerank
from networkx_spark.algorithms.pagerank_blocked import pagerank_blocked
from networkx_spark.generators import web_edges
from tests.conftest import as_dict


def test_blocked_matches_row_kernel_web_graph(spark):
    edges = web_edges(spark, 300, seed=42, as_urls=False)
    g = Graph.from_edges(edges)
    want = as_dict(pagerank(g, alpha=0.85, tol=None, max_iter=12), "id", "rank")
    got = as_dict(pagerank_blocked(g, alpha=0.85, tol=None, max_iter=12, n_blocks=7),
                  "id", "rank")
    assert set(got) == {int(k) for k in want}
    for k, v in want.items():
        assert got[int(k)] == pytest.approx(v, abs=1e-12), k


def test_blocked_convergence_and_goldens(spark):
    # FIXTURES 2.1 graph relabeled to dense vids 0..5 (node i -> i-1)
    edges = [(0, 1), (0, 2), (2, 0), (2, 1), (2, 4), (3, 4), (3, 5),
             (4, 3), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(df)
    got = as_dict(pagerank_blocked(g, alpha=0.9, tol=1e-8, n_blocks=3), "id", "rank")
    want = {0: 0.03721197, 1: 0.05395735, 2: 0.04150565,
            3: 0.37508082, 4: 0.20599833, 5: 0.28624589}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-4)


def test_blocked_rejects_sparse_vids(spark):
    df = spark.createDataFrame([(0, 5)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_blocked(Graph.from_edges(df))


def test_blocked_weighted_undirected(spark):
    edges = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 0.5)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    g = Graph.from_edges(df, directed=False, weight="weight")
    want = as_dict(pagerank(g, tol=None, max_iter=15), "id", "rank")
    got = as_dict(pagerank_blocked(g, tol=None, max_iter=15, n_blocks=2), "id", "rank")
    for k, v in want.items():
        assert got[int(k)] == pytest.approx(v, abs=1e-12)

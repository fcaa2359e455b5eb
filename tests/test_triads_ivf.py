"""Triadic census vs the reference; IVF ANN internal consistency."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.algorithms.triads import triadic_census
from networkx_spark.pipeline.similarity import (cosine_topk, ivf_assign,
                                                ivf_centroids, ivf_topk)


@pytest.mark.parametrize("seed,n,m", [(1, 20, 60), (2, 30, 120), (3, 15, 40)])
def test_triadic_census_random(spark, seed, n, m):
    D = nx.gnm_random_graph(n, m, seed=seed, directed=True)
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    got = {r["triad_type"]: r["count"] for r in triadic_census(g).collect()}
    assert got == dict(nx.triadic_census(D))


def test_triadic_census_doc_example(spark):
    D = nx.DiGraph([(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (4, 2)])
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    got = {r["triad_type"]: r["count"] for r in triadic_census(g).collect()}
    assert got == dict(nx.triadic_census(D))
    assert got["030T"] == 2 and got["030C"] == 2


def test_triadic_census_rejects_undirected(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        triadic_census(g)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_assign_partitions_all(emb):
    cents = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"))
    asn = ivf_assign(emb, cents)
    assert asn.count() == emb.count()
    assert asn.select("vec_id").distinct().count() == emb.count()
    cids = {r["cid"] for r in asn.select("cid").distinct().collect()}
    assert cids <= set(range(8))


def test_ivf_centroid_seeding_deterministic(emb):
    a = sorted(r["cid"] for r in ivf_centroids(emb, 8).select("cid").collect())
    b = sorted(r["cid"] for r in ivf_centroids(emb, 8).select("cid").collect())
    assert a == b and len(a) == 8


def test_ivf_lloyd_refines(emb):
    c = ivf_centroids(emb, n_centroids=4, lloyd_iters=2)
    rows = c.collect()
    assert len(rows) == 4
    assert all(len(r["cv"]) == len(rows[0]["cv"]) for r in rows)


def test_ivf_full_probe_equals_exact(emb):
    """Probing every list makes IVF exact — same rows as brute force."""
    q = emb.filter("vec_id < 3")
    cents = emb.filter("vec_id < 6").select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"))
    exact = sorted(map(tuple, cosine_topk(emb, q, k=5).collect()))
    approx = sorted(map(tuple, ivf_topk(emb, q, k=5, centroids=cents,
                                        n_probe=6).collect()))
    assert approx == exact


def test_ivf_partial_probe_reasonable_recall(emb):
    q = emb.filter("vec_id < 5")
    cents = emb.filter("vec_id < 16").select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"))
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    got = {(r["query_id"], r["vec_id"])
           for r in ivf_topk(emb, q, k=5, centroids=cents, n_probe=4).collect()}
    assert len(got & exact) / len(exact) >= 0.5

"""Hot-vertex salting: semantics unchanged, physical skew reduced."""

import pytest
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.partitioning import (SALT, hot_keys, replicate_state,
                                         salt_rows, skew_factor)


@pytest.fixture(scope="module")
def skewed(spark):
    """Synthetic skewed web graph: 10 hot pages receive ~20% of links."""
    from networkx_spark.generators import web_edges
    return web_edges(spark, 2000, seed=42, as_urls=False).cache()


def test_hot_keys_finds_the_hot_pages(spark, skewed):
    sym = (skewed.select("src", F.col("dst").alias("nbr"))
           .union(skewed.select(F.col("dst").alias("src"), F.col("src").alias("nbr")))
           .withColumnRenamed("src", "id"))
    hot = hot_keys(sym, "id", threshold=100).cache()
    ids = {r.id for r in hot.collect()}
    # the generator routes hot links to page ids 0..9
    assert ids and ids.issubset(set(range(10)))


def test_salt_rows_deterministic_and_spread(spark, skewed):
    sym = (skewed.select(F.col("src").alias("id"), F.col("dst").alias("nbr")))
    hot = hot_keys(sym, "id", threshold=500)
    s1 = salt_rows(sym, hot, "id", "nbr", 8)
    s2 = salt_rows(sym.repartition(13), hot, "id", "nbr", 8)
    a = {(r.id, r.nbr): r[SALT] for r in s1.collect()}
    b = {(r.id, r.nbr): r[SALT] for r in s2.collect()}
    assert a == b                                 # salt is a pure function
    cold = {k for k, v in a.items() if v != 0}
    hot_ids = {r.id for r in hot.collect()}
    assert all(k[0] in hot_ids for k in cold)     # only hot rows salted


def test_replicate_state_cardinality(spark):
    state = spark.createDataFrame([(i, float(i)) for i in range(20)],
                                  "id long, rank double")
    hot = spark.createDataFrame([(3,), (7,)], "id long")
    rep = replicate_state(state, hot, "id", 4)
    counts = {r.id: r["count"] for r in rep.groupBy("id").count().collect()}
    assert counts[3] == 4 and counts[7] == 4
    assert all(v == 1 for k, v in counts.items() if k not in (3, 7))


def test_salting_reduces_join_key_skew(spark, skewed):
    # star: one vertex with 3000 adjacency rows + 3000-cycle background
    star = spark.range(1, 3001).select(F.lit(0).alias("id"), F.col("id").alias("nbr"))
    ring = spark.range(10_000, 13_000).select(
        F.col("id"), (F.lit(10_000) + (F.col("id") - 9_999) % 3_000).alias("nbr"))
    sym = star.unionByName(ring)
    hot = hot_keys(sym, "id", threshold=500)
    salted = salt_rows(sym, hot, "id", "nbr", 16)
    before = skew_factor(sym, "id", n_partitions=64)
    after = skew_factor(salted, "id", SALT, n_partitions=64)
    assert after < 0.5 * before


def test_cc_salted_equals_unsalted(spark, skewed):
    from networkx_spark.algorithms.components import connected_components
    g = Graph.from_edges(skewed, directed=False)
    plain = {r.id: r.component for r in connected_components(g).collect()}
    salted = {r.id: r.component for r in
              connected_components(g, salt_threshold=100, n_salts=8).collect()}
    assert plain == salted


def test_pagerank_salted_allclose_unsalted(spark, skewed):
    from networkx_spark.algorithms.pagerank import pagerank
    g = Graph.from_edges(skewed, directed=False)   # undirected → hot degree
    plain = {r.id: r.rank for r in pagerank(g, tol=None, max_iter=5).collect()}
    salted = {r.id: r.rank for r in
              pagerank(g, tol=None, max_iter=5, salt_threshold=100,
                       n_salts=8).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], abs=1e-12)

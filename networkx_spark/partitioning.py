"""Hot-vertex skew salting for join-key partition balance.

Web graphs are power-law: the generators' fixture gives 10 hot pages ~20%
of all links (FIXTURES.md §3), and a real Common-Crawl host graph is
worse.  When an iterative kernel joins a per-vertex state vector against
the adjacency on the vertex key, every edge row of a hot vertex lands in
ONE shuffle partition — at 1000 executors the partition holding a vertex
with 2% of the edges does ~20× the mean work and gates every superstep
(AQE skew-join is disabled inside fixed-shape superstep loops, see
``superstep.fixed_plan``).

The standard fix, implemented here: **salt the hot keys**.

* adjacency side: a hot vertex's rows get ``salt = xxhash64(nbr) %
  n_salts`` — deterministic, so the same edge always lands in the same
  salted partition; cold rows get salt 0,
* state side: hot rows are replicated ``n_salts`` times (one per salt),
  cold rows once — O(|hot| · n_salts) extra rows, negligible by
  construction,
* the superstep join then runs on ``(key, salt)``, splitting each hot
  vertex's edge rows across ``n_salts`` partitions.

Aggregations after the join (scatter sums, hash-min) are unaffected:
Spark's partial aggregation already combines per map task, so the reduce
side of a hot key sees at most one row per task either way.  Salting is
semantically invisible — results are identical to the unsalted plan
(property-tested) — and only changes the physical row placement.

This module is pure column arithmetic (no UDFs) and is wired into
:func:`networkx_spark.algorithms.pagerank.pagerank` and
:func:`networkx_spark.algorithms.components.connected_components` via
their ``salt_threshold`` / ``n_salts`` parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import ID

SALT = "_salt"


def hot_keys(rows: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` → (key, deg).

    ``threshold`` should be set so a hot key's rows meaningfully exceed a
    single task's fair share (e.g. ``edges / shuffle_partitions``)."""
    return (rows.groupBy(key).agg(F.count("*").alias("deg"))
            .filter(F.col("deg") > threshold))


def salt_rows(rows: DataFrame, hot: DataFrame, key: str, spread: str,
              n_salts: int) -> DataFrame:
    """Add a ``_salt`` column: rows of hot ``key``s are spread across
    ``n_salts`` buckets by hashing the ``spread`` column (deterministic —
    the same row always gets the same salt); cold rows get salt 0."""
    h = F.broadcast(hot.select(F.col(key), F.lit(True).alias("_hot")))
    return (rows.join(h, key, "left")
            .withColumn(SALT, F.when(F.col("_hot").isNotNull(),
                                     F.pmod(F.xxhash64(F.col(spread)), F.lit(n_salts))
                                     .cast("int"))
                        .otherwise(F.lit(0)))
            .drop("_hot"))


def replicate_state(state: DataFrame, hot: DataFrame, key: str,
                    n_salts: int) -> DataFrame:
    """Replicate hot state rows once per salt (cold rows once, salt 0) so
    a join on ``(key, salt)`` sees every salted adjacency partition."""
    h = F.broadcast(hot.select(F.col(key), F.lit(True).alias("_hot")))
    return (state.join(h, key, "left")
            .withColumn(SALT, F.explode(
                F.when(F.col("_hot").isNotNull(),
                       F.sequence(F.lit(0), F.lit(n_salts - 1)))
                .otherwise(F.array(F.lit(0)))))
            .withColumn(SALT, F.col(SALT).cast("int"))
            .drop("_hot"))


def skew_factor(rows: DataFrame, *part_cols: str, n_partitions: int | None = None
                ) -> float:
    """max/mean rows per partition after hash-partitioning on
    ``part_cols`` — the metric SuperstepRunner records per checkpoint;
    exposed here so tests and benchmarks can assert salting works."""
    spark = rows.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    per = (rows.repartition(n, *[F.col(c) for c in part_cols])
           .groupBy(F.spark_partition_id().alias("pid")).count()
           .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
           .collect()[0])
    return float(per["mx"]) / float(per["avg"]) if per["avg"] else 1.0

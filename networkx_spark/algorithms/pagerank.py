"""Power-iteration PageRank as DataFrame supersteps.

Semantics match the reference kernel ``_pagerank_scipy``
(``networkx/algorithms/link_analysis/pagerank_alg.py:358-499``) exactly:

* adjacency: directed edge table; undirected graphs symmetrized
  (``convert_matrix.py:600-613``); parallel edges already summed by
  :meth:`Graph.from_edges`,
* rows normalized by out-weight sum, zero rows left zero
  (``pagerank_alg.py:461-465``),
* ``x0 = 1/N`` or normalized ``nstart`` (``:468-472``),
* personalization vector normalized; **all-zero → ZeroDivisionError**
  (``:475-481``),
* dangling weights default to the personalization vector (``:483-488``);
  dangling set = vertices with zero out-weight sum (``:489``),
* update ``x = α(xA + Σx[dangling]·dw) + (1-α)p`` (``:494``),
* stop when the L1 error is ``< N·tol`` — note the N factor
  (``:496-497``); raise :class:`PowerIterationFailedConvergence` after
  ``max_iter`` supersteps (``:499``).

Physical plan per superstep: one shuffle join (ranks ⋈ normalized-edges on
``src``) + one hash aggregation on ``dst`` for the scatter, one scalar
aggregate for the dangling mass, one for the residual.  The normalized edge
table is loop-invariant and cached once (the reference hoists the same
normalization out of the loop, ``stochastic.py:47-52``).  Lineage is cut
every superstep via :class:`SuperstepRunner`.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


class PowerIterationFailedConvergence(Exception):
    """Raised when power iteration exceeds max_iter (``pagerank_alg.py:499``)."""

    def __init__(self, num_iterations: int):
        self.num_iterations = num_iterations
        super().__init__(f"power iteration failed to converge within {num_iterations} iterations")


def _vector_df(spark, vertices: DataFrame, mapping, col: str) -> DataFrame:
    """(id, col) from a small driver-side dict or a DataFrame; absent ids → 0."""
    if isinstance(mapping, DataFrame):
        m = mapping.select(F.col(mapping.columns[0]).alias(ID),
                           F.col(mapping.columns[1]).cast("double").alias(col))
    else:
        rows = [(str(k), float(v)) for k, v in mapping.items()]
        m = spark.createDataFrame(rows, schema=f"id string, {col} double")
    return (vertices.join(m, ID, "left")
            .select(ID, F.coalesce(col, F.lit(0.0)).alias(col)))


def pagerank(
    g: Graph,
    alpha: float = 0.85,
    personalization: Union[dict, DataFrame, None] = None,
    max_iter: int = 100,
    tol: float | None = 1.0e-6,
    nstart: Union[dict, DataFrame, None] = None,
    weight: bool = True,
    dangling: Union[dict, DataFrame, None] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
    resume: bool = False,
    runner: Optional[SuperstepRunner] = None,
    salt_threshold: Optional[int] = None,
    n_salts: int = 16,
) -> DataFrame:
    """Return a DataFrame ``(id, rank)``; empty graph → empty result
    (reference returns ``{}``, ``pagerank_alg.py:103-105``).

    ``checkpoint_dir`` enables durable per-superstep snapshots of the rank
    vector with metrics; ``resume=True`` restarts from the newest snapshot
    (superstep counting continues — convergence is a property of the state,
    not the iteration count).  ``tol=None`` runs exactly ``max_iter``
    supersteps with no convergence check and returns (fixed-iteration mode,
    used by the SQL-oracle comparison).
    """
    spark = g.edges.sparkSession
    vertices = g.vertices().cache()
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], schema="id string, rank double")

    adj = g.symmetrized()
    if not weight:
        adj = adj.withColumn(WEIGHT, F.lit(1.0))

    own_runner = runner is None
    if own_runner:
        runner = SuperstepRunner(checkpoint_dir, name="pagerank_state",
                                 interval=checkpoint_interval)
    # bucketed+sorted snapshots: the state re-read keeps HashPartitioning(id)
    # and per-bucket order, so the scatter join (id = src, co-partitioned
    # with the cached edge table) and the contribution join need no state
    # exchange and no sort — the scatter partials become the superstep's
    # only shuffle
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    runner.enable_bucketing([ID], n_part)

    norm_edges = hot = None
    try:
      # AQE pinned off for the WHOLE algorithm (not just the loop): the
      # setup's normalization shuffle must land on exactly n_part partitions
      # so the cached edge table stays co-partitioned with every superstep's
      # rank-vector exchange; AQE's runtime coalescing would give the cache
      # a data-dependent partition count and force a per-superstep edge-side
      # re-shuffle.
      with fixed_plan(spark):
        # loop-invariant: right-stochastic normalization.  ONE window over
        # src replaces round 3's groupBy + join + repartition + sort chain
        # (4 passes over the edge table → 1 shuffle): WindowExec itself
        # demands HashPartitioning(src) + sort-by-src, which is exactly the
        # layout the per-superstep scatter join wants, so the cached table
        # comes out pre-partitioned AND pre-sorted for free and every
        # superstep shuffles ONLY the rank vector — measured 2-3× per
        # superstep (cluster analogue: bucketed edge table).  Zero rows
        # stay zero (``pagerank_alg.py:461-465``).
        norm_edges = (adj.withColumn("_S", F.sum(WEIGHT).over(Window.partitionBy(SRC)))
                      .filter(F.col("_S") != 0)
                      .select(SRC, DST, (F.col(WEIGHT) / F.col("_S")).alias("_w")))
        # non-dangling = nonzero out-weight sum (``pagerank_alg.py:489``);
        # over the cached src-partitioned table this distinct is exchange-free
        non_dangling = norm_edges.select(F.col(SRC).alias(ID)).distinct()
        if salt_threshold is not None:
            # hot-vertex salting (partitioning.py): spread a hot src's edge
            # rows across n_salts scatter-join partitions; the rank vector's
            # hot rows are replicated per salt each superstep
            from networkx_spark.partitioning import SALT, hot_keys, salt_rows
            hot = (hot_keys(norm_edges, SRC, salt_threshold)
                   .select(F.col(SRC).alias(ID))).cache()
            norm_edges = (salt_rows(norm_edges, hot.withColumnRenamed(ID, SRC),
                                    SRC, DST, n_salts)
                          .repartition(n_part, SRC, SALT)
                          .sortWithinPartitions(SRC)).cache()
        else:
            norm_edges = norm_edges.cache()

        # personalization p (``:475-481``); the common web case (no
        # personalization, no custom dangling weights) keeps p and dw as
        # literal 1/N instead of per-vertex columns — halves state I/O
        uniform = personalization is None and dangling is None
        if personalization is None:
            p = None
        else:
            p = _vector_df(spark, vertices, personalization, "p")
            s = p.agg(F.sum("p")).collect()[0][0] or 0.0
            if s == 0:
                raise ZeroDivisionError("personalization vector sums to zero")
            p = p.withColumn("p", F.col("p") / F.lit(s))

        # dangling weights default to p (``:483-488``)
        if dangling is None:
            dw = p.select(ID, F.col("p").alias("dw")) if p is not None else None
        else:
            dw = _vector_df(spark, vertices, dangling, "dw")
            s = dw.agg(F.sum("dw")).collect()[0][0] or 0.0
            if s == 0:
                raise ZeroDivisionError("dangling vector sums to zero")
            dw = dw.withColumn("dw", F.col("dw") / F.lit(s))

        # statics in ONE left join: is_dangling = "not in the non-dangling
        # set" (round 3 materialized the dangling set with an anti-join and
        # re-joined it — two extra 16M-row exchanges at protocol scale)
        flag = non_dangling.withColumn("_nd", F.lit(True))
        if uniform:
            statics = (vertices.join(flag, ID, "left")
                       .select(ID, F.col("_nd").isNull().alias("is_dangling")))
            static_cols = ["is_dangling"]
            p_col, dw_col = F.lit(1.0 / n), F.lit(1.0 / n)
        else:
            if p is None:
                p = vertices.withColumn("p", F.lit(1.0 / n))
            if dw is None:
                dw = p.select(ID, F.col("p").alias("dw"))
            statics = (p.join(dw, ID)
                       .join(flag, ID, "left")
                       .select(ID, "p", "dw", F.col("_nd").isNull().alias("is_dangling")))
            static_cols = ["p", "dw", "is_dangling"]
            p_col, dw_col = F.col("p"), F.col("dw")

        # x0 (``:468-472``); uniform start is a literal column — no join
        if nstart is None:
            state = statics.select(ID, F.lit(1.0 / n).alias("rank"), *static_cols)
        else:
            x0 = _vector_df(spark, vertices, nstart, "rank")
            s = x0.agg(F.sum("rank")).collect()[0][0] or 0.0
            if s == 0:
                raise ZeroDivisionError("nstart vector sums to zero")
            x0 = x0.withColumn("rank", F.col("rank") / F.lit(s))
            state = statics.join(x0, ID).select(ID, "rank", *static_cols)
        if runner.bucket_cols:
            # pre-partitioned by id so the first bucketed snapshot writes one
            # file per bucket; pointless for plain parquet (re-read forgets
            # partitioning), so gated on bucketing
            state = state.repartition(n_part, ID)

        start_step = 0
        if resume:
            step, saved = runner.latest(spark)
            if saved is not None:
                state, start_step = saved.drop("_prev"), step + 1
        # the initial dangling mass rides the first lineage cut as an
        # observed metric — no separate aggregation job
        obs0 = Observation()
        state = runner.cut(state.observe(
            obs0, F.sum(F.when(F.col("is_dangling"), F.col("rank"))
                        .otherwise(F.lit(0.0))).alias("dmass")))
        dmass = obs0.get["dmass"] or 0.0
        for it in range(start_step, start_step + max_iter):
            ranks = state.select(ID, "rank")
            if hot is not None:
                from networkx_spark.partitioning import SALT, replicate_state
                ranks = replicate_state(ranks, hot, ID, n_salts)
                cond = ((ranks[ID] == norm_edges[SRC]) &
                        (ranks[SALT] == norm_edges[SALT]))
            else:
                cond = ranks[ID] == norm_edges[SRC]
            contrib = (ranks.join(norm_edges, cond)
                       .groupBy(F.col(DST).alias(ID))
                       .agg(F.sum(F.col("rank") * F.col("_w")).alias("_c")))
            new_state = (state.withColumnRenamed("rank", "_prev")
                         .join(contrib, ID, "left")
                         .select(ID,
                                 (F.lit(alpha) * (F.coalesce("_c", F.lit(0.0))
                                                  + F.lit(dmass) * dw_col)
                                  + F.lit(1.0 - alpha) * p_col).alias("rank"),
                                 *static_cols, "_prev"))
            # the L1 residual and next superstep's dangling mass ride the
            # checkpoint write as observed metrics (CollectMetrics): ONE
            # Spark job per superstep, and ``_prev`` never hits parquet
            obs = Observation()
            to_ckpt = (new_state.observe(
                obs,
                F.sum(F.abs(F.col("rank") - F.col("_prev"))).alias("err"),
                F.sum(F.when(F.col("is_dangling"), F.col("rank"))
                      .otherwise(F.lit(0.0))).alias("dmass"))
                .drop("_prev"))
            state = runner.checkpoint(
                to_ckpt, it, rows=n,
                extra={"dangling_mass": dmass, "algorithm": "pagerank"})
            m = obs.get
            err, dmass = (m["err"] or 0.0), (m["dmass"] or 0.0)
            runner.update_last(residual=err)
            if tol is not None and err < n * tol:
                return state.select(ID, "rank")
        if tol is None:
            return state.select(ID, "rank")
        raise PowerIterationFailedConvergence(max_iter)
    finally:
        for df in (d for d in (vertices, norm_edges, hot) if d is not None):
            try:
                df.unpersist()
            except Exception:
                pass
        if own_runner:
            runner.close()

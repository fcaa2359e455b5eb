"""Eigenvector centrality power iteration.

Reference kernel ``eigenvector_centrality``
(``networkx/algorithms/centrality/eigenvector.py:8,203-230``):

* ``x0`` = all-ones (or ``nstart``), normalized by its sum; all-zero
  ``nstart`` raises; the null graph raises (``:196-207``),
* per iteration: ``x = xlast + xlast·A`` — the (A+I) shift that guarantees
  convergence on bipartite structures (``:212-218``),
* L2 (hypot) normalization each iteration, 0-norm → 1 (``:223-226``),
* stop when ``Σ|x - xlast| < n·tol`` AFTER normalization (``:228-230``),
* raise :class:`PowerIterationFailedConvergence` after ``max_iter``.

Superstep = one scatter (join on ``src``, groupBy ``dst``) + the +I
self-term via a left join back onto the previous state.  The L2 norm AND
the lagged residual ride the checkpoint write as observed metrics;
normalization is applied lazily as a literal multiplier next superstep,
so the loop is exactly ONE job per superstep even with ``tol`` set (the
convergence test is evaluated one superstep late on carried columns, and
the converged iteration's vector is returned — see the loop comment).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.algorithms.pagerank import PowerIterationFailedConvergence
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def eigenvector_centrality(
    g: Graph,
    max_iter: int = 100,
    tol: float | None = 1.0e-6,
    nstart: Optional[dict] = None,
    weight: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """Returns (id, centrality).  ``weight=False`` matches the reference
    default (``weight=None`` → every edge counts 1); ``tol=None`` runs
    exactly ``max_iter`` supersteps (fixed-iteration mode for the SQL
    oracle, mirroring ``pagerank(tol=None)``)."""
    spark = g.edges.sparkSession
    vertices = g.vertices().cache()
    n = vertices.count()
    if n == 0:
        raise ValueError(
            "cannot compute centrality for the null graph "
            "(reference NetworkXPointlessConcept, eigenvector.py:196)")

    adj = g.symmetrized().select(SRC, DST, WEIGHT)
    if not weight:
        adj = adj.withColumn(WEIGHT, F.lit(1.0))
    adj = adj.cache()

    if nstart is None:
        x = vertices.withColumn("x", F.lit(1.0 / n))
    else:
        if all(v == 0 for v in nstart.values()):
            raise ValueError("initial vector cannot have all zero values")
        s = float(sum(nstart.values()))
        rows = [(str(k), float(v) / s) for k, v in nstart.items()]
        m = spark.createDataFrame(rows, "id string, x double")
        x = (vertices.join(m, ID, "left")
             .select(ID, F.coalesce("x", F.lit(0.0)).alias("x")))

    runner = SuperstepRunner(checkpoint_dir, name="eigenvector_state",
                             interval=checkpoint_interval)
    scale = 1.0        # pending 1/norm multiplier from the previous write
    try:
      with fixed_plan(spark):
        # state: (id, x RAW, _prev) — _prev is the PREVIOUS superstep's
        # post-normalization vector (written materialized: the 1/norm
        # multiplier is a literal by write time)
        x = runner.cut(x.select(ID, "x", F.col("x").alias("_prev")))
        for it in range(max_iter):
            xs = x.select(ID, (F.col("x") * F.lit(scale)).alias("x"),
                          F.col("_prev").alias("_prev2"))
            contrib = (xs.join(adj, xs[ID] == adj[SRC])
                       .groupBy(F.col(DST).alias(ID))
                       .agg(F.sum(F.col("x") * F.col(WEIGHT)).alias("_c")))
            # x_raw = xlast + xlast·A  (the +I shift); carry xlast for the
            # next superstep's lagged residual
            new = (xs.withColumnRenamed("x", "_prev")
                   .join(contrib, ID, "left")
                   .select(ID,
                           (F.col("_prev") + F.coalesce("_c", F.lit(0.0)))
                           .alias("x"),
                           "_prev", "_prev2"))
            # ONE job per superstep: the L2 norm AND the LAGGED residual
            # Σ|x_{it} − x_{it-1}| (both post-normalization vectors are
            # fully-determined lazy projections by write time) ride the
            # checkpoint write; the reference's stop test
            # (eigenvector.py:228-230, < n·tol AFTER normalization) for
            # iteration it is evaluated one superstep late, and x_{it} is
            # carried as ``_prev``, so the converged iteration's exact
            # vector is returned (round-3 finding #2; the Katz/pagerank
            # one-job pattern).
            obs = Observation()
            state = runner.checkpoint(
                new.observe(obs, F.sum(F.col("x") * F.col("x")).alias("ss"),
                            F.sum(F.abs(F.col("_prev") - F.col("_prev2")))
                            .alias("lag_err")).drop("_prev2"),
                it, rows=n, extra={"algorithm": "eigenvector"})
            m = obs.get
            norm = math.sqrt(m["ss"] or 0.0) or 1.0
            scale = 1.0 / norm
            if tol is not None and it >= 1:
                err = m["lag_err"] or 0.0
                runner.update_last(residual=err)
                if err < n * tol:
                    # iteration it-1 had converged: return ITS vector
                    return state.select(ID, F.col("_prev").alias("centrality"))
            x = state
        if tol is None:
            return x.select(ID, (F.col("x") * F.lit(scale)).alias("centrality"))
        # no lagged stop fired: ONE terminal residual job decides whether
        # the final iteration itself converged
        err = (x.agg(F.sum(F.abs(F.col("x") * F.lit(scale) - F.col("_prev"))))
               .collect()[0][0]) or 0.0
        runner.update_last(residual=err)
        if err < n * tol:
            return x.select(ID, (F.col("x") * F.lit(scale)).alias("centrality"))
        raise PowerIterationFailedConvergence(max_iter)
    finally:
        vertices.unpersist()
        adj.unpersist()
        runner.close()

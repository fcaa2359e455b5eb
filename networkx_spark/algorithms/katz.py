"""Katz centrality power iteration.

Reference kernel ``katz_centrality``
(``networkx/algorithms/centrality/katz.py:12,150-192``):

* ``x0`` = all-zeros (or ``nstart``); ``beta`` scalar or per-node dict —
  a dict must cover every node (``:159-166``),
* per iteration: ``x = α·(xlast·A) + β`` (``:172-176``),
* stop when ``Σ|x - xlast| < n·tol`` (``:179-181``),
* on convergence, scale by ``1/hypot(x)`` when ``normalized`` (``:182-190``),
* raise :class:`PowerIterationFailedConvergence` after ``max_iter``.

One job per superstep: the L1 residual rides the checkpoint write as an
observed metric (the PageRank pattern, ``pagerank.py:213-224``); the final
L2 normalization is one terminal scalar aggregate.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.algorithms.pagerank import PowerIterationFailedConvergence
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def katz_centrality(
    g: Graph,
    alpha: float = 0.1,
    beta: Union[float, dict] = 1.0,
    max_iter: int = 1000,
    tol: float | None = 1.0e-6,
    nstart: Optional[dict] = None,
    normalized: bool = True,
    weight: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """Returns (id, centrality).  ``weight=False`` matches the reference
    default; ``tol=None`` runs exactly ``max_iter`` supersteps with no
    convergence check (fixed-iteration mode for the SQL oracle)."""
    spark = g.edges.sparkSession
    vertices = g.vertices().cache()
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "id string, centrality double")

    adj = g.symmetrized().select(SRC, DST, WEIGHT)
    if not weight:
        adj = adj.withColumn(WEIGHT, F.lit(1.0))
    adj = adj.cache()

    # beta: literal column for the scalar case, per-vertex column for a dict
    # (which must cover every node, katz.py:159-166)
    if isinstance(beta, dict):
        rows = [(str(k), float(v)) for k, v in beta.items()]
        bdf = spark.createDataFrame(rows, "id string, _beta double")
        missing = vertices.join(bdf, ID, "anti").count()
        if missing:
            raise ValueError(
                "beta dictionary must have a value for every node")
        base = vertices.join(bdf, ID)
        beta_col = F.col("_beta")
        carry = ["_beta"]
    else:
        base = vertices.withColumn("_beta", F.lit(float(beta)))
        beta_col = F.col("_beta")
        carry = ["_beta"]

    if nstart is None:
        x = base.withColumn("x", F.lit(0.0))
    else:
        m = spark.createDataFrame(
            [(str(k), float(v)) for k, v in nstart.items()], "id string, x double")
        x = (base.join(m, ID, "left")
             .select(ID, *carry, F.coalesce("x", F.lit(0.0)).alias("x")))

    runner = SuperstepRunner(checkpoint_dir, name="katz_state",
                             interval=checkpoint_interval)

    def _finish(state: DataFrame) -> DataFrame:
        if normalized:
            ss = state.agg(F.sum(F.col("x") * F.col("x"))).collect()[0][0] or 0.0
            s = 1.0 / (ss ** 0.5) if ss > 0 else 1.0
        else:
            s = 1.0
        return state.select(ID, (F.col("x") * F.lit(s)).alias("centrality"))

    try:
      with fixed_plan(spark):
        x = runner.cut(x)
        for it in range(max_iter):
            xs = x.select(ID, "x")
            contrib = (xs.join(adj, xs[ID] == adj[SRC])
                       .groupBy(F.col(DST).alias(ID))
                       .agg(F.sum(F.col("x") * F.col(WEIGHT)).alias("_c")))
            new = (x.withColumnRenamed("x", "_prev")
                   .join(contrib, ID, "left")
                   .select(ID, *carry,
                           (F.lit(alpha) * F.coalesce("_c", F.lit(0.0))
                            + beta_col).alias("x"),
                           "_prev"))
            obs = Observation()
            to_ckpt = (new.observe(
                obs, F.sum(F.abs(F.col("x") - F.col("_prev"))).alias("err"))
                .drop("_prev"))
            x = runner.checkpoint(to_ckpt, it, rows=n,
                                  extra={"algorithm": "katz"})
            err = obs.get["err"] or 0.0
            runner.update_last(residual=err)
            if tol is not None and err < n * tol:
                return _finish(x)
        if tol is None:
            return _finish(x)
        raise PowerIterationFailedConvergence(max_iter)
    finally:
        vertices.unpersist()
        adj.unpersist()
        runner.close()

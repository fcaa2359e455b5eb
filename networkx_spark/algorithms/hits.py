"""HITS hubs/authorities power iteration.

Reference kernel ``_hits_python``
(``networkx/algorithms/link_analysis/hits_alg.py:99-140``):

* ``h0 = 1/N`` or normalized nstart,
* per iteration: ``a = Aᵀ h`` then ``h = A a`` (weighted), both vectors
  scaled by ``1/max`` (``:127-131``),
* stop when ``Σ|h - hlast| < tol`` (plain tol, unlike PageRank's ``N·tol``),
* raise after ``max_iter``; final vectors normalized by their sums when
  ``normalized=True`` (``:137-140``).

Same superstep skeleton as PageRank: scatter = join + groupBy on ``dst``
(authorities) then on ``src`` (hubs); max-normalization is a scalar agg
broadcast back as a literal.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.algorithms.pagerank import PowerIterationFailedConvergence
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def hits(g: Graph, max_iter: int = 100, tol: float | None = 1.0e-8,
         nstart=None, normalized: bool = True,
         checkpoint_dir: Optional[str] = None,
         checkpoint_interval: int = 1) -> DataFrame:
    """Returns (id, hub, authority).  Empty graph → empty result
    (``hits_alg.py:102-103``).  ``tol=None`` runs exactly ``max_iter``
    supersteps with no convergence check (fixed-iteration mode, used by
    the SQL-oracle comparison — mirrors ``pagerank(tol=None)``)."""
    spark = g.edges.sparkSession
    vertices = g.vertices().cache()
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "id string, hub double, authority double")
    if max_iter <= 0:
        raise PowerIterationFailedConvergence(max_iter)

    adj = g.symmetrized().select(SRC, DST, WEIGHT).cache()
    runner = SuperstepRunner(checkpoint_dir, name="hits_state", interval=checkpoint_interval)

    if nstart is None:
        h = vertices.withColumn("hub", F.lit(1.0 / n))
    else:
        rows = [(str(k), float(v)) for k, v in nstart.items()]
        m = spark.createDataFrame(rows, "id string, hub double")
        s = sum(v for _, v in rows)
        h = (vertices.join(m, ID, "left")
             .select(ID, (F.coalesce("hub", F.lit(0.0)) / F.lit(s)).alias("hub")))
    h = runner.cut(h)
    try:
      with fixed_plan(spark):
        for it in range(max_iter):
            a = (h.join(adj, h[ID] == adj[SRC])
                 .groupBy(F.col(DST).alias(ID))
                 .agg(F.sum(F.col("hub") * F.col(WEIGHT)).alias("authority")))
            a = (vertices.join(a, ID, "left")
                 .select(ID, F.coalesce("authority", F.lit(0.0)).alias("authority")))
            h_new = (a.join(adj, a[ID] == adj[DST])
                     .groupBy(F.col(SRC).alias(ID))
                     .agg(F.sum(F.col("authority") * F.col(WEIGHT)).alias("hub")))
            h_new = (vertices.join(h_new, ID, "left")
                     .select(ID, F.coalesce("hub", F.lit(0.0)).alias("hub")))
            # NOTE: keep the iterated state a TWO-way join; folding the
            # previous state in as a third join leg makes Catalyst/AQE
            # pathologically slow after ~10 supersteps (measured).  The
            # residual join below is terminal (collected), not iterated.
            state = a.join(h_new, ID).select(ID, "hub", "authority")
            # the 1/max normalization scalars ride the checkpoint write as
            # observed metrics (CollectMetrics, like pagerank.py): the
            # separate max-agg job per superstep is gone — ≤2 jobs per
            # superstep (1 when tol is None), down from 3
            obs = Observation()
            state = runner.checkpoint(
                state.observe(obs, F.max("hub").alias("hm"),
                              F.max("authority").alias("am")),
                it, rows=n, extra={"algorithm": "hits"})
            mx = obs.get
            hmax, amax = (mx["hm"] or 1.0), (mx["am"] or 1.0)
            state = state.select(ID, (F.col("hub") / F.lit(hmax)).alias("hub"),
                                 (F.col("authority") / F.lit(amax)).alias("authority"))
            if tol is not None:
                err = (state.join(h.select(ID, F.col("hub").alias("_prev")), ID)
                       .agg(F.sum(F.abs(F.col("hub") - F.col("_prev"))))
                       .collect()[0][0]) or 0.0
                runner.update_last(residual=err)
            h = state.select(ID, "hub")
            done = (tol is not None and err < tol) or \
                   (tol is None and it == max_iter - 1)
            if done:
                if normalized:
                    sums = state.agg(F.sum("hub"), F.sum("authority")).collect()[0]
                    hs, as_ = sums[0] or 1.0, sums[1] or 1.0
                    state = state.select(ID, (F.col("hub") / F.lit(hs)).alias("hub"),
                                         (F.col("authority") / F.lit(as_)).alias("authority"))
                return state
        raise PowerIterationFailedConvergence(max_iter)
    finally:
        vertices.unpersist()
        adj.unpersist()
        runner.close()

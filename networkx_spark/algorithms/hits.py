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
broadcast back as a literal.  The two 1/max scalars AND the lagged
residual ride the checkpoint write as observed metrics, so the loop is
exactly ONE job per superstep even with ``tol`` set (the convergence test
is evaluated one superstep late on carried columns, and the converged
iteration's exact vectors are returned — see the loop comment).
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

    def finish(hub_col, auth_col, state):
        out = state.select(ID, F.col(hub_col).alias("hub"),
                           F.col(auth_col).alias("authority"))
        if normalized:
            sums = out.agg(F.sum("hub"), F.sum("authority")).collect()[0]
            hs, as_ = sums[0] or 1.0, sums[1] or 1.0
            out = out.select(ID, (F.col("hub") / F.lit(hs)).alias("hub"),
                             (F.col("authority") / F.lit(as_)).alias("authority"))
        return out

    try:
      with fixed_plan(spark):
        # cur: (id, hub, authority, _prevhub) — hub/authority are the
        # CURRENT max-normalized vectors (normalization applied lazily as a
        # literal from the observed max), _prevhub the previous superstep's
        # normalized hub.  The previous state is the join BASE (the
        # pagerank.py pattern) so zero-degree vertices survive via left
        # joins + coalesce — no separate `vertices` join legs.
        cur = runner.cut(h.select(
            ID, "hub", F.lit(0.0).alias("authority"), F.col("hub").alias("_prevhub")))
        err = None
        for it in range(max_iter):
            a_part = (cur.select(ID, "hub").join(adj, cur[ID] == adj[SRC])
                      .groupBy(F.col(DST).alias(ID))
                      .agg(F.sum(F.col("hub") * F.col(WEIGHT)).alias("_a")))
            s1 = (cur.select(ID, F.col("hub").alias("_prevhub"),
                             F.col("authority").alias("_prevauth"),
                             F.col("_prevhub").alias("_prev2hub"))
                  .join(a_part, ID, "left")
                  .select(ID, "_prevhub", "_prevauth", "_prev2hub",
                          F.coalesce("_a", F.lit(0.0)).alias("authority")))
            h_part = (s1.select(ID, "authority").join(adj, s1[ID] == adj[DST])
                      .groupBy(F.col(SRC).alias(ID))
                      .agg(F.sum(F.col("authority") * F.col(WEIGHT)).alias("_h")))
            new = (s1.join(h_part, ID, "left")
                   .select(ID, F.coalesce("_h", F.lit(0.0)).alias("hub"),
                           "authority", "_prevhub", "_prevauth", "_prev2hub"))
            # ONE job per superstep: the 1/max normalization scalars AND the
            # LAGGED residual Σ|h_{it-1} − h_{it-2}| (both fully-determined
            # lazy projections by write time) ride the checkpoint write as
            # observed metrics.  The reference's stop test (hits_alg.py:133,
            # plain tol, no N factor) for iteration it-1 is therefore
            # evaluated one superstep late — and the PREVIOUS vectors are
            # carried in the state, so the converged iteration's exact
            # output is returned; one superstep of extra compute buys the
            # removal of the per-superstep residual join+collect job
            # (round-3 finding #2).
            obs = Observation()
            state = runner.checkpoint(
                new.observe(obs, F.max("hub").alias("hm"),
                            F.max("authority").alias("am"),
                            F.sum(F.abs(F.col("_prevhub") - F.col("_prev2hub")))
                            .alias("lag_err")).drop("_prev2hub"),
                it, rows=n, extra={"algorithm": "hits"})
            mx = obs.get
            hmax, amax = (mx["hm"] or 1.0), (mx["am"] or 1.0)
            if tol is not None and it >= 1:
                err = mx["lag_err"] or 0.0
                runner.update_last(residual=err)
                if err < tol:
                    # iteration it-1 had converged: return ITS vectors
                    return finish("_prevhub", "_prevauth", state)
            cur = state.select(
                ID, (F.col("hub") / F.lit(hmax)).alias("hub"),
                (F.col("authority") / F.lit(amax)).alias("authority"),
                "_prevhub")
        if tol is None:
            return finish("hub", "authority", cur)
        # no lagged stop fired: ONE terminal residual job decides whether
        # the final iteration itself converged (reference raises otherwise)
        err = (cur.agg(F.sum(F.abs(F.col("hub") - F.col("_prevhub"))))
               .collect()[0][0]) or 0.0
        runner.update_last(residual=err)
        if err < tol:
            return finish("hub", "authority", cur)
        raise PowerIterationFailedConvergence(max_iter)
    finally:
        vertices.unpersist()
        adj.unpersist()
        runner.close()

"""Trophic levels / differences / incoherence for directed graphs.

Reference: ``networkx/algorithms/centrality/trophic.py`` (``trophic_levels``
``:12``, ``trophic_differences`` ``:72``,
``trophic_incoherence_parameter`` ``:110``): the trophic level solves
``s_i = 1 + (1/k^in_i) Σ_j w_ji s_j`` with basal nodes (in-degree 0)
pinned to 1; the reference inverts ``(I − p)`` densely (numpy), where
``p`` is the in-weight-normalized adjacency restricted to non-basal
rows/columns.

Spark shape: Jacobi iteration ``x ← 1 + p·x`` (then ``s = x + 1``,
basal s = 1) — algebraically identical to the reference's
``(I−p)^{-1}·1 + 1`` (row sums of p are 1 − basal-in-fraction, so the
fixed point matches; verified in tests to 1e-9).  Each superstep is the
PageRank scatter shape: rank join on the normalized in-edge table
(cached pre-partitioned on ``src``) + one partial-hash aggregation, the
L∞ residual observed on the checkpoint write — one Spark job per
superstep, O(V) state, web-scale by construction.  Divergence (a
strongly-connected sub-web with no basal influence) makes the spectral
radius 1; the loop detects the stalled residual and raises like the
reference's ``LinAlgError → NetworkXError`` ("no basal node").
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def trophic_levels(g: Graph, weight: bool = True, tol: float = 1e-12,
                   max_iter: int = 10_000) -> DataFrame:
    """(id, trophic_level) for every vertex (``trophic.py:12``)."""
    if not g.directed:
        raise ValueError("trophic_levels not defined for undirected graphs "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wcol = (F.col(WEIGHT).cast("double") if weight and
            WEIGHT in g.edges.columns else F.lit(1.0))
    edges = g.edges.select(SRC, DST, wcol.alias("_w"))
    insum = edges.groupBy(DST).agg(F.sum("_w").alias("_k"))
    verts = g.vertices().cache()
    basal = verts.join(insum.select(F.col(DST).alias(ID)), ID, "anti").cache()

    # normalized in-edges between NON-basal endpoints only (the reference's
    # row/column restriction); denominator is the FULL in-weight
    p = (edges.join(insum, DST)
         .join(basal.select(F.col(ID).alias(SRC)), SRC, "anti")
         .select(SRC, DST, (F.col("_w") / F.col("_k")).alias("_p"))
         .repartition(n_part, SRC).cache())
    nonbasal = verts.join(basal, ID, "anti")

    runner = SuperstepRunner(None, name="trophic", keep_scratch=2)
    try:
      with fixed_plan(spark):
        if basal.limit(1).count() == 0 and verts.limit(1).count() > 0:
            # reference: LinAlgError on the singular (I - p) -> NetworkXError
            raise ValueError(
                "Trophic levels are only defined for graphs where every "
                "node has a path from a basal node (no basal node exists; "
                "reference NetworkXError on singular matrix)")
        x = runner.cut(nonbasal.select(ID, F.lit(1.0).alias("x")))
        prev_resid = float("inf")
        stalled = 0
        for _ in range(max_iter):
            scat = (x.join(p, x[ID] == p[SRC])
                    .groupBy(F.col(DST).alias(ID))
                    .agg(F.sum(F.col("x") * F.col("_p")).alias("_s")))
            obs = Observation()
            nxt = (nonbasal.join(scat, ID, "left")
                   .select(ID, (F.lit(1.0) + F.coalesce("_s", F.lit(0.0)))
                           .alias("x"))
                   .join(x.withColumnRenamed("x", "_old"), ID)
                   .observe(obs, F.max(F.abs(F.col("x") - F.col("_old")))
                            .alias("resid")))
            x = runner.cut(nxt.select(ID, "x"))
            resid = float(obs.get["resid"] or 0.0)
            if resid < tol:
                break
            # a sub-web with no basal influence keeps the Jacobi residual
            # from contracting (spectral radius 1); a few flat supersteps
            # are proof of singularity — fail in seconds, not max_iter jobs
            stalled = stalled + 1 if resid >= prev_resid * (1.0 - 1e-9) else 0
            prev_resid = resid
            if stalled >= 5:
                raise ValueError(
                    "Trophic levels are only defined for graphs where every "
                    "node has a path from a basal node (stalled residual "
                    f"{resid:g}; reference NetworkXError on singular matrix)")
        else:
            raise ValueError(
                "Trophic levels are only defined for graphs where every "
                "node has a path from a basal node (reference "
                "NetworkXError on singular matrix)")
        levels = (basal.select(ID, F.lit(1.0).alias("trophic_level"))
                  .unionByName(x.select(
                      ID, (F.col("x") + 1.0).alias("trophic_level"))))
        return levels
    finally:
        verts.unpersist()
        basal.unpersist()
        p.unpersist()
        runner.close()


def trophic_differences(g: Graph, weight: bool = True) -> DataFrame:
    """(src, dst, trophic_difference) per edge: s_dst − s_src
    (``trophic.py:72``)."""
    s = trophic_levels(g, weight=weight)
    su = s.select(F.col(ID).alias(SRC), F.col("trophic_level").alias("_su"))
    sv = s.select(F.col(ID).alias(DST), F.col("trophic_level").alias("_sv"))
    return (g.edges.select(SRC, DST).join(su, SRC).join(sv, DST)
            .select(SRC, DST,
                    (F.col("_sv") - F.col("_su"))
                    .alias("trophic_difference")))


def trophic_incoherence_parameter(g: Graph, weight: bool = True,
                                  cannibalism: bool = False) -> float:
    """Population std-dev of the trophic differences (``trophic.py:110``);
    ``cannibalism=False`` drops self-loop edges first, like the
    reference."""
    if cannibalism:
        d = trophic_differences(g, weight=weight)
    else:
        stripped = Graph(g.edges.filter(F.col(SRC) != F.col(DST)),
                         directed=g.directed, vertices=g.vertices())
        d = trophic_differences(stripped, weight=weight)
    row = d.agg(F.avg("trophic_difference").alias("m"),
                F.avg(F.col("trophic_difference")
                      * F.col("trophic_difference")).alias("m2")).collect()[0]
    if row["m"] is None:
        return float("nan")
    return math.sqrt(max(row["m2"] - row["m"] ** 2, 0.0))

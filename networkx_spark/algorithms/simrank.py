"""SimRank similarity as an iterated pair-state join.

Reference: ``networkx/algorithms/similarity.py:1221``
(``simrank_similarity`` → ``_simrank_similarity_python`` ``:1302``):
``sim(u,v) = C · avg over (w,x) ∈ Gadj[u]×Gadj[v] of prev[w][x]``, with
``Gadj = G.pred`` for directed graphs and ``G.adj`` undirected, the
diagonal pinned to 1, empty neighbor products giving 0, and the stop
rule ``|new−old| ≤ tol·(1+|old|)`` for every pair — raising
``ExceededMaxIterations`` when ``max_iterations`` is exhausted.

Spark shape: the state is the full pair table ``(u, v, s)`` — O(n²)
rows.  One superstep =

    state(w,x,s) ⋈ pred(u,w) ⋈ pred(v,x) → groupBy(u,v).sum(s)

then ``C·sum/(|Gadj(u)|·|Gadj(v)|)`` against broadcast in-degree counts,
the convergence residual observed on the checkpoint write (one Spark job
per iteration, the engine-wide Observation pattern).

Scale posture: SimRank is quadratic in vertices BY DEFINITION — the
state alone is n² rows, and the pair-product join is O(n²·d̄²).  This
matches the reference (dense n×n numpy matrix); the op is guarded by
``max_vertices`` and is a fixture/subgraph-tier similarity — at corpus
scale the embedding-cosine / MinHash families in ``pipeline/`` are the
similarity path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


class ExceededMaxIterations(Exception):
    """Raised like the reference's ``nx.ExceededMaxIterations``."""


def simrank_similarity(g: Graph, importance_factor: float = 0.9,
                       max_iterations: int = 1000, tolerance: float = 1e-4,
                       max_vertices: int = 5_000) -> DataFrame:
    """(u, v, similarity) for every ordered vertex pair."""
    spark = g.edges.sparkSession
    vertices = g.vertices().cache()
    n = vertices.count()
    if n > max_vertices:
        raise ValueError(
            f"simrank_similarity is O(n^2) state by definition; {n} vertices "
            f"> max_vertices={max_vertices} — raise the cap explicitly or "
            "use the pipeline similarity ops at corpus scale")
    if n == 0:
        return spark.createDataFrame([], "u string, v string, similarity double")

    # Gadj: predecessors when directed, neighbors when undirected
    if g.directed:
        pred = g.edges.select(F.col(DST).alias("node"), F.col(SRC).alias("p"))
    else:
        pred = g.symmetrized().select(F.col(SRC).alias("node"),
                                      F.col(DST).alias("p"))
    pred = pred.distinct().cache()
    cnt = pred.groupBy("node").agg(F.count(F.lit(1)).alias("cnt"))
    # per-pair denominator |Gadj(u)|·|Gadj(v)| — broadcast both sides
    cu = F.broadcast(cnt.select(F.col("node").alias("u"),
                                F.col("cnt").alias("cnt_u")))
    cv = F.broadcast(cnt.select(F.col("node").alias("v"),
                                F.col("cnt").alias("cnt_v")))

    pairs = (vertices.select(F.col(ID).alias("u"))
             .crossJoin(vertices.select(F.col(ID).alias("v"))))
    p1 = F.broadcast(pred.select(F.col("node").alias("u"), F.col("p").alias("w")))
    p2 = F.broadcast(pred.select(F.col("node").alias("v"), F.col("p").alias("x")))

    runner = SuperstepRunner(None, name="simrank", keep_scratch=2)
    try:
      with fixed_plan(spark):
        state = runner.cut(pairs.select(
            "u", "v", F.when(F.col("u") == F.col("v"), 1.0).otherwise(0.0)
            .alias("s")))
        for it in range(max_iterations):
            sums = (state.select(F.col("u").alias("w"), F.col("v").alias("x"),
                                 "s")
                    .join(p1, "w").join(p2, "x")
                    .groupBy("u", "v").agg(F.sum("s").alias("_sum")))
            new = (pairs.join(sums, ["u", "v"], "left")
                   .join(cu, "u", "left").join(cv, "v", "left")
                   .select("u", "v",
                           F.when(F.col("u") == F.col("v"), F.lit(1.0))
                           .otherwise(F.coalesce(
                               F.lit(importance_factor) * F.col("_sum")
                               / (F.col("cnt_u") * F.col("cnt_v")),
                               F.lit(0.0))).alias("s")))
            # residual observed on the checkpoint write: convergence iff
            # max(|new−old| − tol·(1+|old|)) ≤ 0 over all pairs
            obs = Observation()
            joined = (new.join(state.withColumnRenamed("s", "_old"),
                               ["u", "v"])
                      .observe(obs, F.max(
                          F.abs(F.col("s") - F.col("_old"))
                          - tolerance * (F.lit(1.0) + F.abs(F.col("_old"))))
                          .alias("resid")))
            state = runner.cut(joined.select("u", "v", "s"))
            if float(obs.get["resid"]) <= 0.0:
                return state.select("u", "v", F.col("s").alias("similarity"))
        raise ExceededMaxIterations(
            f"simrank did not converge after {max_iterations} iterations.")
    finally:
        vertices.unpersist()
        pred.unpersist()
        runner.close()

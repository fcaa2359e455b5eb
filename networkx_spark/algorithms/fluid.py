"""Fluid communities (asyn_fluidc) as color-class-batched sweeps.

Reference: ``networkx/algorithms/community/asyn_fluid.py:13``
(``asyn_fluidc``): k seed vertices start k "fluid" communities with
density 1; each vertex (in shuffled order) adopts the community with the
highest summed density among its own + its neighbors' communities
(ties within 1e-4 of the max; keep own if it ties; else random choice),
and community densities are 1/|community| after every move.  Requires a
connected undirected graph and k ≤ n; stops when a sweep changes
nothing, or after ``max_iter`` sweeps.

Spark shape: the same batched-asynchronous schedule as the LPA family
(module docstring of ``label_propagation.py``): vertices process in
Jones-Plassmann color classes — within a class no two vertices are
adjacent, so batching them is a valid asynchronous order — with the
random seed-vertex draw and tie choices made seed-deterministic via
xxhash64 (the SURVEY §2.9 seeded-randomness contract: same
(graph, seed, k) → same output at any parallelism).  Densities update
after each color class rather than after each single move — a
documented batching divergence, same posture as ``asyn_lpa``; the gate
oracle is a labeled golden pin and the pytest checks structural
invariants (cover, ≤k communities, determinism, fluid-density
stability).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan
from networkx_spark.algorithms.label_propagation import greedy_color
from networkx_spark.algorithms.components import connected_components


def asyn_fluidc(g: Graph, k: int, max_iter: int = 100,
                seed: Optional[int] = None) -> DataFrame:
    """(id, community) — community ∈ [0, k) (``asyn_fluid.py:13``)."""
    if g.directed:
        raise ValueError("asyn_fluidc not defined for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    verts = g.vertices().cache()
    n = verts.count()
    if k < 1 or k > n:
        raise ValueError(f"k cannot be bigger than the number of nodes "
                         f"({n}); got {k} (reference NetworkXError)")
    ncomp = (connected_components(g).select("component").distinct().count())
    if ncomp != 1:
        raise ValueError("Fluid Communities requires connected graphs "
                         "(reference NetworkXError)")
    s = int(seed or 0)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")).distinct()
           .repartition(n_part, ID).cache())

    colors = sorted(r["color"] for r in
                    greedy_color(g).select("color").distinct().collect())
    color_of = greedy_color(g).cache()

    # k seed vertices by seeded-hash order (the reference's seed.shuffle)
    seeds = (verts.orderBy(F.xxhash64(F.lit(s), ID), ID).limit(k)
             .select(ID, (F.row_number().over(
                 Window.orderBy(F.xxhash64(F.lit(s), ID), ID)) - 1)
                 .alias("community")))

    runner = SuperstepRunner(None, name="fluidc", keep_scratch=2)
    try:
      with fixed_plan(spark):
        labels = runner.cut(
            verts.join(seeds, ID, "left").select(ID, "community"))
        for _ in range(max_iter):
            sweep_changed = 0
            for c in colors:
                sizes = (labels.filter(F.col("community").isNotNull())
                         .groupBy("community")
                         .agg((F.lit(1.0) / F.count(F.lit(1)))
                              .alias("_density")))
                cls = color_of.filter(F.col("color") == c).select(ID)
                lbl = labels.withColumnRenamed(ID, "nbr") \
                            .withColumnRenamed("community", "_ncom")
                nbr_scores = (cls.join(adj, ID)
                              .join(lbl, "nbr")
                              .filter(F.col("_ncom").isNotNull())
                              .select(ID, F.col("_ncom").alias("com")))
                own = (cls.join(labels, ID)
                       .filter(F.col("community").isNotNull())
                       .select(ID, F.col("community").alias("com")))
                scores = (nbr_scores.unionByName(own)
                          .join(F.broadcast(sizes.withColumnRenamed(
                              "community", "com")), "com")
                          .groupBy(ID, "com")
                          .agg(F.sum("_density").alias("_f")))
                w = Window.partitionBy(ID)
                best = (scores
                        .withColumn("_mx", F.max("_f").over(w))
                        .filter(F.col("_f") > F.col("_mx") - 1e-4))
                own_best = (best.join(own.withColumnRenamed("com", "_oc"), ID)
                            .filter(F.col("com") == F.col("_oc"))
                            .select(ID, F.col("com").alias("_new")))
                pick = (best.join(own_best.select(ID), ID, "anti")
                        .groupBy(ID)
                        .agg(F.min_by("com", F.xxhash64(F.lit(s), ID, "com"))
                             .alias("_new")))
                new = own_best.unionByName(pick)
                obs = Observation()
                merged = (labels.join(new, ID, "left")
                          .select(ID, F.coalesce("_new", "community")
                                  .alias("community"),
                                  (~F.col("_new").eqNullSafe(
                                      F.col("community"))
                                   & F.col("_new").isNotNull())
                                  .alias("_chg"))
                          .observe(obs, F.sum(F.col("_chg").cast("long"))
                                   .alias("n")))
                labels = runner.cut(merged.select(ID, "community"))
                sweep_changed += int(obs.get["n"] or 0)
            if sweep_changed == 0:
                break
        return labels
    finally:
        verts.unpersist()
        adj.unpersist()
        color_of.unpersist()
        runner.close()

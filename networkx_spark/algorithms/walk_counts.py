"""Walk counting — A^k by iterated join aggregation.

Reference: ``networkx/algorithms/walks.py:8`` (``number_of_walks``):
the number of length-k walks between every node pair is the k-th
adjacency-matrix power; ``walk_length=0`` is the identity.

Spark shape: W₁ = the (symmetrized) edge table with count 1;
W_{i+1} = W_i ⋈ A on the middle vertex + a (src, dst) sum — k−1
shuffle joins, each a plain matrix-multiply in relational form, with
partial aggregation map-side.  Output rows are the NONZERO entries
only (the dense zero entries of the reference's matrix are implied).
The nonzero count can approach n² for large k — ``max_pairs`` guards
the growth per multiply; walk counts grow like λ₁^k, so the practical
scale ceiling is the int64 overflow, not the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def number_of_walks(g: Graph, walk_length: int,
                    max_pairs: int = 50_000_000) -> DataFrame:
    """(u, v, walks) for every pair with ≥1 length-``walk_length`` walk."""
    if walk_length < 0:
        raise ValueError(
            f"`walk_length` cannot be negative: {walk_length} "
            "(reference ValueError)")
    spark = g.edges.sparkSession
    verts = g.vertices().select(F.col(ID).cast("string").alias(ID))
    if walk_length == 0:
        return verts.select(F.col(ID).alias("u"), F.col(ID).alias("v"),
                            F.lit(1).cast("long").alias("walks"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized()
           .select(F.col(SRC).cast("string").alias("_m"),
                   F.col(DST).cast("string").alias("v")).distinct()
           .repartition(n_part, "_m").cache())

    runner = SuperstepRunner(None, name="walks_pow", keep_scratch=2)
    try:
      with fixed_plan(spark):
        w = runner.cut(adj.select(F.col("_m").alias("u"),
                                  F.col("v"),
                                  F.lit(1).cast("long").alias("walks")))
        for _ in range(walk_length - 1):
            w = runner.cut(
                w.withColumnRenamed("v", "_m").join(adj, "_m")
                .groupBy("u", "v").agg(F.sum("walks").alias("walks")))
            if w.count() > max_pairs:
                raise ValueError(
                    f"nonzero walk pairs exceed max_pairs={max_pairs}")
        return w
    finally:
        adj.unpersist()
        runner.close()

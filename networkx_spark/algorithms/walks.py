"""Deterministic random-walk corpus generation (DeepWalk/node2vec-style).

Not a reference operator (NetworkX has no walk-corpus generator); this is
part of the training-data layer: random-walk corpora are the input to
skip-gram graph embeddings (DeepWalk, node2vec), and at web scale the
walk generation IS the expensive step — |V|·num_walks·walk_length rows.

Randomness is a seeded MINSTD LCG over pure BIGINT arithmetic
(x -> 48271·x mod (2³¹−1), double-stepped), NOT an engine hash: every
engine computes identical walks from (seed, walk id, step), which makes
the corpus reproducible across Spark/DuckDB/anything and lets the
correctness oracle replay the walks move-for-move in SQL.

Scale posture: neighbors are ranked once per vertex with a
``row_number() OVER (PARTITION BY src ORDER BY dst)`` window — partitioned
by vertex, no global window — and cached pre-partitioned on the join key.
Each step is ONE join of the walker frontier against the ranked adjacency
(walkers carry their next rank choice as a column), so a length-L corpus
is L shuffles of the frontier only.  Dead ends (out-degree 0) end their
walk early, like the standard implementations.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID

_M = 2_147_483_647          # 2^31 - 1 (prime)
_A = 48_271                 # MINSTD multiplier


def _lcg(expr):
    """Two MINSTD steps over a BIGINT seed expression — stays far below
    the 2^63 overflow line (48271 · 2^31 < 2^48)."""
    x = (expr % _M + _M) % _M
    x = (x * _A) % _M
    x = (x * _A) % _M
    return x


def ranked_adjacency(g: Graph):
    """(id, nbr, rk 0-based) + (id, deg): the walkable adjacency with a
    dense per-vertex neighbor ranking (directed graphs walk out-edges)."""
    e = g.edges.select(SRC, DST) if g.directed else g.symmetrized().select(SRC, DST)
    e = e.distinct()
    rk = F.row_number().over(
        Window.partitionBy(SRC).orderBy(DST)) - 1
    nbrs = e.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"),
                    rk.alias("rk"))
    deg = nbrs.groupBy(ID).agg(F.count("*").alias("deg"))
    return nbrs, deg


def random_walks(g: Graph, walk_length: int = 10, num_walks: int = 1,
                 seed: int = 1, starts: Optional[DataFrame] = None
                 ) -> DataFrame:
    """(walk_id, walk_no, step, node): ``num_walks`` seeded walks of up to
    ``walk_length`` steps from every vertex (or from ``starts(id)``).
    ``walk_id`` is the start vertex; step 0 is the start itself.  A walk
    that reaches a sink stops early."""
    if walk_length < 0 or num_walks < 1:
        raise ValueError("walk_length must be >= 0 and num_walks >= 1")
    spark = g.edges.sparkSession
    id_type = g.edges.schema[SRC].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            "random_walks needs integral vertex ids so the LCG draw is "
            f"engine-replayable (got {id_type}); relabel with with_vids()")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbrs, deg = ranked_adjacency(g)
    nbrs = nbrs.repartition(n_part, ID).cache()
    deg = deg.repartition(n_part, ID).cache()
    base = (starts.select(ID) if starts is not None else g.vertices())
    walkers = base.select(
        F.col(ID).alias("walk_id"),
        F.explode(F.array(*[F.lit(w) for w in range(num_walks)])).alias("walk_no"),
        F.col(ID).alias("cur"))
    out = [walkers.select("walk_id", "walk_no", F.lit(0).alias("step"),
                          F.col("cur").alias("node"))]
    try:
        for t in range(1, walk_length + 1):
            # the walker's move at step t is a pure function of
            # (seed, start vertex id, walk_no, t, current out-degree) —
            # numeric ids keep the draw replayable in any engine
            draw = _lcg(F.lit(seed) * 1_000_003
                        + F.col("walk_id").cast("long") * 69_621
                        + F.col("walk_no") * 8_191 + F.lit(t) * 127)
            # join on cur ONLY: the cached adjacency stays co-partitioned
            # (joining on (cur, rk) would reshuffle the big side every
            # step); the walker row fans out by deg(cur) and the rank
            # filter keeps exactly one — per-step cost is
            # O(Σ deg(visited)), the frontier is the only moving side
            walkers = (walkers
                       .join(deg.withColumnRenamed(ID, "cur"), "cur")
                       .withColumn("_rk", draw % F.col("deg"))
                       .join(nbrs.withColumnRenamed(ID, "cur"), "cur")
                       .filter(F.col("rk") == F.col("_rk"))
                       .select("walk_id", "walk_no", F.col("nbr").alias("cur")))
            walkers = walkers.localCheckpoint(eager=True)
            out.append(walkers.select("walk_id", "walk_no",
                                      F.lit(t).alias("step"),
                                      F.col("cur").alias("node")))
            if walkers.isEmpty():
                break
        res = out[0]
        for df in out[1:]:
            res = res.unionByName(df)
        return res
    finally:
        nbrs.unpersist()
        deg.unpersist()

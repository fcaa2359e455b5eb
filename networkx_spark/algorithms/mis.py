"""Maximal independent set — Luby's distributed algorithm.

Reference ``networkx/algorithms/mis.py:20`` (``maximal_independent_set
(G, nodes=None, seed=None)``): grows a random maximal independent set by
repeatedly sampling from the not-yet-excluded vertices; seeds the result
with ``nodes`` (raising ``NetworkXUnfeasible`` when they are not
independent, ``mis.py:74-77``) and is undirected-only
(``@not_implemented_for("directed")``).

The reference's sequential sample-one-at-a-time loop has no distributed
equivalent, so the engine runs the textbook parallel replacement —
**Luby's algorithm** (Luby 1986, "A Simple Parallel Algorithm for the
Maximal Independent Set Problem"): every round each undecided vertex
draws a priority; vertices that beat every undecided neighbor join the
set, winners and their neighborhoods leave the pool; O(log n) rounds
w.h.p.  Output is a valid maximal independent set for ANY priority
sequence — the same contract the reference's ``seed=`` gives (a valid
MIS whose identity depends on the draw).

Priorities are **replayable affine hashes** ``(a_r·id + b_r) mod M``
(M = 2³¹−1 prime, constants drawn from ``random.Random(seed)``), the
same trick as the MinHash oracle (``pipeline/dedup.py:29``): a DuckDB
oracle can unroll the identical rounds in pure SQL.  Within a round two
distinct ids can never collide (a_r·(v−u) ≢ 0 mod a prime for
0 < a_r, |v−u| < M), so winners are well-defined without tie-breaks.
"""

from __future__ import annotations

import random
from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan

MERSENNE31 = (1 << 31) - 1


def luby_constants(seed: int, rounds: int) -> list[tuple[int, int]]:
    """The per-round affine-priority constants — shared verbatim by the
    Spark loop and the unrolled SQL oracle."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
            for _ in range(rounds)]


def maximal_independent_set(g: Graph, nodes: Optional[DataFrame] = None,
                            seed: int = 0, max_rounds: int = 64) -> DataFrame:
    """(id) rows of a maximal independent set (``mis.py:20``).

    ``nodes``: optional DataFrame of vertex ids the set must contain;
    raises when they are not in the graph or not independent, like the
    reference (``mis.py:70-77``).  Vertex ids must be non-negative and
    < 2³¹−1 (the affine-priority domain).
    """
    if g.directed:
        raise ValueError("maximal_independent_set not implemented for "
                         "directed graphs (reference NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = g.symmetrized().filter(F.col(SRC) != F.col(DST))
    adj = (sym.select(F.col(SRC).alias(ID),
                      F.col(DST).cast("long").alias("nbr"))
           .distinct().repartition(n_part, ID).cache())
    consts = luby_constants(seed, max_rounds)

    # keep_scratch=0: every round's winners cut is referenced by the final
    # union, so no snapshot may rotate away (superstep.py: "0 disables
    # rotation for loops holding long-lived references")
    runner = SuperstepRunner(None, name="luby_mis", keep_scratch=0)
    try:
      with fixed_plan(spark):
        undecided = g.vertices().select(F.col(ID).cast("long").alias(ID))
        mis_parts: list[DataFrame] = []
        if nodes is not None:
            seed_set = nodes.select(F.col(ID).cast("long").alias(ID)).distinct()
            missing = seed_set.join(undecided, ID, "anti").limit(1).count()
            if missing:
                raise ValueError("nodes are not all in the graph "
                                 "(reference NetworkXUnfeasible)")
            clash = (adj.join(seed_set, ID, "semi")
                     .join(seed_set.withColumnRenamed(ID, "nbr"), "nbr", "semi")
                     .limit(1).count())
            if clash:
                raise ValueError("nodes are not an independent set "
                                 "(reference NetworkXUnfeasible)")
            seed_set = runner.cut(seed_set)
            mis_parts.append(seed_set)
            closed = seed_set.unionByName(
                adj.join(seed_set, ID, "semi").select(F.col("nbr").alias(ID)))
            undecided = undecided.join(closed.distinct(), ID, "anti")
        undecided = runner.cut(undecided)

        for a, b in consts:
            pri = (F.lit(a) * F.col(ID)) % F.lit(MERSENNE31)
            pri = (pri + F.lit(b)) % F.lit(MERSENNE31)
            und_pri = undecided.select(ID, pri.alias("pri"))
            # min priority among UNDECIDED neighbors of each vertex
            nbr_min = (adj.join(und_pri.select(F.col(ID).alias("nbr"),
                                               F.col("pri").alias("npri")),
                                "nbr")
                       .groupBy(ID).agg(F.min("npri").alias("mn")))
            # cut winners once: the round's two consumers (MIS accumulation
            # and the neighborhood purge) both read the parquet cut, and
            # scratch files outlive close() so the returned lazy union
            # stays valid for the caller
            winners = runner.cut(
                und_pri.join(nbr_min, ID, "left")
                .filter(F.col("mn").isNull() | (F.col("pri") < F.col("mn")))
                .select(ID))
            mis_parts.append(winners)
            blocked = (adj.join(winners, ID, "semi")
                       .select(F.col("nbr").alias(ID)).distinct())
            obs = Observation()
            undecided = runner.cut(
                undecided.join(winners, ID, "anti")
                .join(blocked, ID, "anti")
                .observe(obs, F.count(F.lit(1)).alias("n")))
            if int(obs.get["n"] or 0) == 0:
                out = mis_parts[0]
                for part in mis_parts[1:]:
                    out = out.unionByName(part)
                return out
        raise RuntimeError(f"Luby MIS did not converge in {max_rounds} "
                           "rounds — vanishingly unlikely; check the input")
    finally:
        adj.unpersist()
        runner.close()

"""Betweenness centrality — batched multi-source Brandes as level joins.

Reference: ``networkx/algorithms/centrality/betweenness.py:16``
(``betweenness_centrality``): for every source s, a BFS computes distances
and shortest-path counts σ (``_single_source_shortest_path_basic``,
``:255``), then dependencies accumulate backwards by descending distance
(``_accumulate_basic``, ``:316``: δ(v) += σ(v)/σ(w)·(1+δ(w)) over
successors w), and the totals are rescaled (``_rescale``, ``:358``:
normalized → 1/((n−1)(n−2)), else 1/2 for undirected; sampled → ×n/k).

The reference loops sources sequentially; here ALL sources run at once as
one batched state keyed ``(s, id)`` — the frontier join is identical to
BFS but carries the source column, so one Spark job per BFS level serves
every source simultaneously.  Forward pass: level tables
``L_d(s, id, sigma)``; backward pass re-joins consecutive level tables
through the adjacency to accumulate δ level by level.  Jobs = 2·diameter,
independent of the number of sources.

Scale posture: state is O(|sources|·V) rows — exact mode (k=None) is for
fixture-sized graphs / parity tests; the production path is sampled
(``k`` sources, estimate rescaled by n/k per the reference), keeping the
state k·V with k ≪ V.  Source sampling is seed-deterministic by xxhash64
order rather than the reference's ``random.sample`` (SURVEY §2.9 seeded-
randomness contract: same (graph, seed, k) → same estimate at any
parallelism).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan, tuned_partitions


def betweenness_centrality(g: Graph, k: Optional[int] = None,
                           normalized: bool = True, seed: int | None = None,
                           max_depth: int = 10_000) -> DataFrame:
    """(id, betweenness) for every vertex.

    ``k=None`` → exact (every vertex a source, reference default);
    ``k`` set → sampled estimate from k hash-chosen sources, rescaled by
    n/k (``betweenness.py:132-137``, ``_rescale`` ``:376-377``).
    """
    return _batched_brandes(g, k, normalized, seed, max_depth,
                            edges_mode=False)


def edge_betweenness_centrality(g: Graph, k: Optional[int] = None,
                                normalized: bool = True,
                                seed: int | None = None,
                                max_depth: int = 10_000) -> DataFrame:
    """(src, dst, betweenness) for every edge.

    Reference ``betweenness.py:186`` (``edge_betweenness_centrality``):
    identical Brandes passes, but the backward step credits each tree edge
    (v, w) with σ(v)/σ(w)·(1+δ(w)) (``_accumulate_edges`` ``:340-355``)
    and rescales by 1/(n(n−1)) normalized, else 1/2 undirected
    (``_rescale_e`` ``:383-404``).  Undirected output is canonicalized
    ``src <= dst`` (both traversal directions of one edge sum into the
    single dict slot, as the reference's (v,w)-or-(w,v) lookup does).
    """
    return _batched_brandes(g, k, normalized, seed, max_depth,
                            edges_mode=True)


def _batched_brandes(g: Graph, k: Optional[int], normalized: bool,
                     seed: int | None, max_depth: int,
                     edges_mode: bool,
                     per_source: bool = False) -> DataFrame:
    spark = g.edges.sparkSession
    vertices = g.vertices().cache()
    n = vertices.count()
    if n == 0:
        schema = ("src string, dst string, betweenness double" if edges_mode
                  else "id string, betweenness double")
        return spark.createDataFrame([], schema)

    # directed: successor adjacency; undirected: both directions
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")).distinct())
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(n_part, ID).cache()

    if k is None or k >= n:
        sources = vertices
        k_eff = None
    else:
        sources = (vertices.orderBy(F.xxhash64(F.lit(int(seed or 0)), ID), ID)
                   .limit(k))
        k_eff = k

    # every level table stays referenced by the backward pass
    runner = SuperstepRunner(None, name="betweenness", keep_scratch=0)
    try:
      with tuned_partitions(spark, n * (k_eff or n)), fixed_plan(spark):
        lvl = runner.cut(sources.select(F.col(ID).alias("s"), ID,
                                        F.lit(1.0).alias("sigma")))
        levels = [lvl]          # L_d(s, id, sigma)
        visited = lvl.select("s", ID)
        for d in range(1, max_depth + 1):
            obs = Observation()
            nxt = (levels[-1].join(adj, ID)
                   .select("s", F.col("nbr").alias(ID), "sigma")
                   .join(visited, ["s", ID], "anti")
                   .groupBy("s", ID).agg(F.sum("sigma").alias("sigma"))
                   .observe(obs, F.count(F.lit(1)).alias("rows")))
            nxt = runner.cut(nxt)
            if int(obs.get["rows"] or 0) == 0:
                break
            levels.append(nxt)
            visited = visited.unionByName(nxt.select("s", ID))

        # backward accumulation: δ at the deepest level is 0
        acc: list[DataFrame] = []
        eacc: list[DataFrame] = []
        delta = levels[-1].select("s", ID, F.lit(0.0).alias("delta"))
        for d in range(len(levels) - 2, -1, -1):
            succ = (delta.join(levels[d + 1].withColumnRenamed("sigma", "sigma_w"),
                               ["s", ID])
                    .select("s", F.col(ID).alias("nbr"),
                            ((F.lit(1.0) + F.col("delta")) / F.col("sigma_w"))
                            .alias("coeff")))
            if edges_mode:
                # materialize the per-tree-edge credits once, then aggregate
                # them two ways (per-vertex for the δ recursion, per-edge for
                # the output) without re-running the joins
                joined = runner.cut(
                    levels[d].join(adj, ID).join(succ, ["s", "nbr"])
                    .select("s", ID, "nbr",
                            (F.col("sigma") * F.col("coeff")).alias("c")))
                contrib = joined.groupBy("s", ID).agg(F.sum("c").alias("_d"))
                eacc.append(joined.groupBy(ID, "nbr")
                            .agg(F.sum("c").alias("_e")))
            else:
                contrib = (levels[d].join(adj, ID)
                           .join(succ, ["s", "nbr"])
                           .groupBy("s", ID)
                           .agg(F.sum(F.col("sigma") * F.col("coeff")).alias("_d")))
            delta = runner.cut(
                levels[d].join(contrib, ["s", ID], "left")
                .select("s", ID, F.coalesce("_d", F.lit(0.0)).alias("delta")))
            if d >= 1:          # reference skips w == s (``:323``)
                acc.append(delta)

        if edges_mode:
            return _finish_edges(g, eacc, n, normalized, k_eff)
        if per_source:
            # raw per-source dependencies (s, id, delta), w != s rows only —
            # the δ_s(w) table percolation/weighted variants aggregate over
            if not acc:
                return spark.createDataFrame(
                    [], "s string, id string, delta double")
            out = acc[0]
            for a in acc[1:]:
                out = out.unionByName(a)
            return out.filter(F.col("s") != F.col(ID))
        if not acc:
            bc = vertices.select(ID, F.lit(0.0).alias("betweenness"))
        else:
            allc = acc[0]
            for a in acc[1:]:
                allc = allc.unionByName(a)
            sums = allc.groupBy(ID).agg(F.sum("delta").alias("betweenness"))
            bc = (vertices.join(sums, ID, "left")
                  .select(ID, F.coalesce("betweenness", F.lit(0.0))
                          .alias("betweenness")))

        # _rescale (``betweenness.py:358-380``)
        scale = None
        if normalized:
            if n > 2:
                scale = 1.0 / ((n - 1) * (n - 2))
        elif not g.directed:
            scale = 0.5
        if scale is not None and k_eff is not None:
            # reference applies the n/k estimate factor only when a scale
            # exists (``:375-377``) — directed unnormalized sampled output
            # stays raw, deviation preserved for parity
            scale = scale * n / k_eff
        if scale is not None and scale != 1.0:
            bc = bc.select(ID, (F.col("betweenness") * F.lit(scale))
                           .alias("betweenness"))
        return bc
    finally:
        vertices.unpersist()
        adj.unpersist()
        runner.close()


def _finish_edges(g: Graph, eacc: list[DataFrame], n: int, normalized: bool,
                  k_eff: Optional[int]) -> DataFrame:
    """Union per-level edge credits, canonicalize, rescale (``_rescale_e``
    ``betweenness.py:383-404``), and left-join onto the full edge list so
    every edge appears (reference seeds ``dict.fromkeys(G.edges(), 0.0)``)."""
    edge_list = g.edges.select(SRC, DST).distinct()
    if not g.directed:
        edge_list = (edge_list
                     .select(F.least(SRC, DST).alias(SRC),
                             F.greatest(SRC, DST).alias(DST)).distinct())
    if eacc:
        allc = eacc[0]
        for a in eacc[1:]:
            allc = allc.unionByName(a)
        u, v = F.col(ID), F.col("nbr")
        if not g.directed:
            u, v = F.least(ID, "nbr"), F.greatest(ID, "nbr")
        sums = (allc.select(u.alias(SRC), v.alias(DST), "_e")
                .groupBy(SRC, DST).agg(F.sum("_e").alias("_e")))
        eb = edge_list.join(sums, [SRC, DST], "left")
    else:
        eb = edge_list.withColumn("_e", F.lit(None).cast("double"))
    eb = eb.select(SRC, DST, F.coalesce("_e", F.lit(0.0)).alias("betweenness"))

    scale = None
    if normalized:
        if n > 1:
            scale = 1.0 / (n * (n - 1))
    elif not g.directed:
        scale = 0.5
    # NOTE: the reference passes no ``k`` to ``_rescale_e`` (``:244-246``),
    # so sampled edge estimates deliberately do NOT get the n/k factor —
    # quirk preserved for parity (k_eff intentionally unused here)
    del k_eff
    if scale is not None and scale != 1.0:
        eb = eb.select(SRC, DST, (F.col("betweenness") * F.lit(scale))
                       .alias("betweenness"))
    return eb

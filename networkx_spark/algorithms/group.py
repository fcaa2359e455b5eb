"""Group centrality measures.

Reference: ``networkx/algorithms/centrality/group.py``
(``group_closeness_centrality`` ``:287``, ``group_degree_centrality``
``:385``, ``group_in_degree_centrality`` ``:432``,
``group_out_degree_centrality`` ``:475``): closeness of a node GROUP =
|V∖S| / Σ_{v∉S} d(v, S) (distances into the group — the reference
reverses directed graphs first; unreachable vertices contribute 0, and
an all-unreachable group scores 0), and group degree = the fraction of
outside nodes adjacent to the group.

Spark shape: group closeness is ONE multi-source frontier-pruned relax
loop (every s ∈ S seeded at distance 0 — the ``sssp.py`` superstep with
a super-source), then one aggregation; group degree is a semi-join +
distinct count.  Both are O(V) state — group queries are the web-scale
"how central is this hub set" shape.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _group_df(spark, S: Iterable | DataFrame) -> DataFrame:
    if isinstance(S, DataFrame):
        return S.select(F.col(S.columns[0]).cast("string").alias(ID)).distinct()
    return spark.createDataFrame([(str(s),) for s in S],
                                 "id string").distinct()


def _multi_source_distances(g: Graph, sources: DataFrame, weight: bool,
                            reverse: bool, max_iter: int) -> DataFrame:
    """(id, distance) — min distance from any source, sources at 0."""
    spark = g.edges.sparkSession
    wcol = (F.col(WEIGHT).cast("double") if weight and
            WEIGHT in g.edges.columns else F.lit(1.0))
    a, b = (DST, SRC) if reverse else (SRC, DST)
    adj = g.symmetrized().select(F.col(a).cast("string").alias(SRC),
                                 F.col(b).cast("string").alias(DST),
                                 wcol.alias("_w"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(n_part, SRC).cache()
    runner = SuperstepRunner(None, name="group_dist", keep_scratch=2)
    try:
      with fixed_plan(spark):
        state = runner.cut(sources.select(
            ID, F.lit(0.0).alias("distance"), F.lit(True).alias("improved")))
        for _ in range(max_iter):
            frontier = state.filter("improved").select(ID, "distance")
            cand = (frontier.join(adj, frontier[ID] == adj[SRC])
                    .groupBy(F.col(DST).alias(ID))
                    .agg(F.min(F.col("distance") + F.col("_w"))
                         .alias("_nd")))
            obs = Observation()
            merged = (state.select(ID, "distance").join(cand, ID, "full")
                      .select(ID,
                              F.least(F.coalesce("distance",
                                                 F.lit(float("inf"))),
                                      F.coalesce("_nd",
                                                 F.lit(float("inf"))))
                              .alias("distance"),
                              (F.col("_nd").isNotNull()
                               & (F.col("distance").isNull()
                                  | (F.col("_nd") < F.col("distance"))))
                              .alias("improved"))
                      .observe(obs, F.sum(F.col("improved").cast("long"))
                               .alias("n")))
            state = runner.cut(merged)
            if int(obs.get["n"] or 0) == 0:
                break
        return state.select(ID, "distance")
    finally:
        adj.unpersist()
        runner.close()


def group_closeness_centrality(g: Graph, S: Iterable | DataFrame,
                               weight: bool = False,
                               max_iter: int | None = None) -> float:
    """|V∖S| / Σ_{v∈V∖S} d(v, S) (``group.py:287``)."""
    spark = g.edges.sparkSession
    grp = _group_df(spark, S)
    if max_iter is None:
        max_iter = max(16, g.number_of_vertices())
    dist = _multi_source_distances(g, grp, weight, reverse=g.directed,
                                   max_iter=max_iter)
    outside = (g.vertices().select(F.col(ID).cast("string").alias(ID))
               .join(grp, ID, "anti"))
    row = (outside.join(dist, ID, "left")
           .agg(F.sum(F.coalesce("distance", F.lit(0.0))).alias("tot"),
                F.count(F.lit(1)).alias("cnt")).collect()[0])
    tot = float(row["tot"] or 0.0)
    return float(row["cnt"]) / tot if tot > 0 else 0.0


def _group_degree(g: Graph, S, neighbor_expr) -> float:
    spark = g.edges.sparkSession
    grp = _group_df(spark, S)
    n = g.number_of_vertices()
    k = grp.count()
    nbrs = (neighbor_expr
            .join(grp.withColumnRenamed(ID, "_s"),
                  F.col("_s") == F.col("_from"), "semi")
            .select(F.col("_to").alias(ID)).distinct()
            .join(grp, ID, "anti").count())
    return float(nbrs) / float(n - k)


def group_degree_centrality(g: Graph, S: Iterable | DataFrame) -> float:
    """|N(S) ∖ S| / (n − |S|) (``group.py:385``)."""
    e = g.symmetrized().select(F.col(SRC).cast("string").alias("_from"),
                               F.col(DST).cast("string").alias("_to"))
    return _group_degree(g, S, e)


def group_out_degree_centrality(g: Graph, S: Iterable | DataFrame) -> float:
    """Directed out-neighbors variant (``group.py:475``)."""
    if not g.directed:
        raise ValueError("group_out_degree_centrality is directed-only "
                         "(reference raises NetworkXNotImplemented)")
    e = g.edges.select(F.col(SRC).cast("string").alias("_from"),
                       F.col(DST).cast("string").alias("_to"))
    return _group_degree(g, S, e)


def group_in_degree_centrality(g: Graph, S: Iterable | DataFrame) -> float:
    """Directed in-neighbors variant (``group.py:432``)."""
    if not g.directed:
        raise ValueError("group_in_degree_centrality is directed-only "
                         "(reference raises NetworkXNotImplemented)")
    e = g.edges.select(F.col(DST).cast("string").alias("_from"),
                       F.col(SRC).cast("string").alias("_to"))
    return _group_degree(g, S, e)

"""Point-to-point shortest paths: bidirectional Dijkstra and A*.

Reference:

* ``bidirectional_dijkstra(G, source, target, weight)`` →
  ``(length, path)`` — ``shortest_paths/weighted.py:2290``
* ``astar_path(G, source, target, heuristic, weight)`` → path,
  ``astar_path_length`` — ``shortest_paths/astar.py:13,192``

The reference runs two priority queues (bidirectional) / one heap (A*);
both are inherently sequential scan orders.  The distributed shape keeps
the engine's relax-join superstep (``sssp.py``) and adds the two prunings
that make point-to-point cheaper than full SSSP:

* **meet-in-the-middle**: forward relax from ``source`` and backward relax
  from ``target`` advance together in one superstep each; ``μ`` — the best
  known s→t distance through any meeting vertex — is observed each
  superstep, and frontier rows with ``dist ≥ μ`` are pruned (they cannot
  improve the meet).  The loop ends when both pruned frontiers are empty;
  ``μ`` is then exact (standard bidirectional termination: any better path
  would need a frontier entry below the bound on each side).  Supersteps ≈
  half the s→t hop radius, each O(frontier ⋈ edges) — at web scale this
  explores the union of two ~r/2-balls instead of one r-ball.
* **A\***: one-sided relax with frontier rows pruned by
  ``dist + h(id) ≥ μ`` where ``μ`` is the best target distance found so
  far.  The heuristic is DATA, not a callback — a DataFrame ``(id, h)``
  (e.g. precomputed landmark/geo bounds), joined once per superstep; an
  admissible (never over-estimating) ``h`` guarantees the exact distance,
  a consistent one also keeps the pruning monotone — the reference's own
  caveat (``astar.py:64-70``).  ``h = None`` degrades to target-pruned
  Dijkstra.

Paths are reconstructed from the distance fixpoint: ``pred(v) = min u``
with ``dist(u) + w(u,v) = dist(v)`` (deterministic, the ``sssp.py``
posture) and walked back with O(path length) one-row lookups — the path
itself is O(diameter), so the driver round-trip is bounded.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan
from networkx_spark.algorithms.bfs import NodeNotFound

INF = float("inf")


class NoPath(ValueError):
    """No s→t path (reference ``NetworkXNoPath``,
    ``weighted.py:2414``)."""


def _adj(g: Graph, weight: bool, reverse: bool = False) -> DataFrame:
    wcol = F.col(WEIGHT).cast("double") if weight else F.lit(1.0)
    e = g.symmetrized().select(SRC, DST, wcol.alias("_w"))
    if reverse:
        e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "_w")
    mn = e.agg(F.min("_w")).collect()[0][0]
    if mn is not None and mn < 0:
        raise ValueError("negative edge weights: Dijkstra semantics "
                         "undefined (reference weighted.py:115)")
    return e


def _seed(spark, v, src_type):
    return spark.createDataFrame(
        [(v, 0.0, True)], f"id {src_type}, dist double, improved boolean")


def _relax(state: DataFrame, adj: DataFrame, bound: float) -> DataFrame:
    """One frontier relax, pruning frontier rows with dist ≥ bound."""
    frontier = (state.filter("improved")
                .filter(F.col("dist") < F.lit(bound))
                .select(ID, "dist"))
    cand = (frontier.join(adj, frontier[ID] == adj[SRC])
            .groupBy(F.col(DST).alias(ID))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_nd")))
    return (state.select(ID, "dist").join(cand, ID, "full")
            .select(ID,
                    F.least(F.coalesce("dist", F.lit(INF)),
                            F.coalesce("_nd", F.lit(INF))).alias("dist"),
                    (F.col("_nd").isNotNull() &
                     (F.col("dist").isNull() |
                      (F.col("_nd") < F.col("dist")))).alias("improved")))


def _walk_path(dists: DataFrame, adj: DataFrame, target) -> list:
    """Min-pred walk from target back to the 0-distance root."""
    du = dists.select(F.col(ID).alias(SRC), F.col("dist").alias("_du"))
    dv = dists.select(F.col(ID).alias(DST), F.col("dist").alias("_dv"))
    preds = (adj.join(du, SRC).join(dv, DST)
             .filter(F.abs(F.col("_du") + F.col("_w") - F.col("_dv"))
                     < 1e-9)
             .groupBy(F.col(DST).alias(ID))
             .agg(F.min(SRC).alias("pred"))).cache()
    path = [target]
    cur = target
    for _ in range(10_000_000):
        row = preds.filter(F.col(ID) == F.lit(cur)).collect()
        if not row:
            break
        cur = row[0]["pred"]
        path.append(cur)
    preds.unpersist()
    path.reverse()
    return path


def bidirectional_dijkstra(g: Graph, source, target, weight: bool = True,
                           max_iter: Optional[int] = None
                           ) -> tuple[float, list]:
    """(length, path) — ``weighted.py:2290``."""
    spark = g.edges.sparkSession
    for v, nm in ((source, "Source"), (target, "Target")):
        if not g.has_vertex(v):
            raise NodeNotFound(f"{nm} {v!r} is not in G "
                               "(reference NodeNotFound)")
    src_type = g.edges.schema[SRC].dataType.simpleString()
    s = str(source) if src_type == "string" else source
    t = str(target) if src_type == "string" else target
    if s == t:
        return 0.0, [s]
    fwd = _adj(g, weight)
    bwd = _adj(g, weight, reverse=True)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fwd = fwd.repartition(n_part, SRC).cache()
    bwd = bwd.repartition(n_part, SRC).cache()
    if max_iter is None:
        max_iter = max(16, g.number_of_vertices())

    runner = SuperstepRunner(None, name="bidi", keep_scratch=4)
    try:
      with fixed_plan(spark):
        fstate = runner.cut(_seed(spark, s, src_type))
        bstate = runner.cut(_seed(spark, t, src_type))
        mu = INF
        for _ in range(max_iter):
            fstate = runner.cut(_relax(fstate, fwd, mu))
            bstate = runner.cut(_relax(bstate, bwd, mu))
            # best meet over the joined states + remaining frontier work,
            # one aggregation job
            row = (fstate.join(bstate.select(ID,
                                             F.col("dist").alias("_bd")),
                               ID, "inner")
                   .agg(F.min(F.col("dist") + F.col("_bd")).alias("mu"))
                   ).collect()[0]
            if row["mu"] is not None:
                mu = min(mu, float(row["mu"]))
            live = (fstate.filter("improved")
                    .filter(F.col("dist") < F.lit(mu)).limit(1).count()
                    + bstate.filter("improved")
                    .filter(F.col("dist") < F.lit(mu)).limit(1).count())
            if live == 0:
                break
        if mu == INF:
            raise NoPath(f"No path between {source!r} and {target!r} "
                         "(reference NetworkXNoPath)")
        # meet vertex: min (dist_f + dist_b), ties to min id
        meet = (fstate.join(bstate.select(ID, F.col("dist").alias("_bd")),
                            ID)
                .orderBy((F.col("dist") + F.col("_bd")).asc(), F.col(ID))
                .limit(1).collect())[0][ID]
        half1 = _walk_path(fstate.select(ID, "dist"), fwd, meet)
        half2 = _walk_path(bstate.select(ID, "dist"), bwd, meet)
        half2.reverse()
        return mu, half1 + half2[1:]
    finally:
        fwd.unpersist()
        bwd.unpersist()
        runner.close()


def astar_path(g: Graph, source, target,
               heuristic: Optional[DataFrame] = None, weight: bool = True,
               max_iter: Optional[int] = None) -> tuple[float, list]:
    """(length, path) — ``astar.py:13`` (+ ``astar_path_length``).

    ``heuristic`` is a DataFrame (id, h) giving an admissible lower bound
    on distance-to-target per vertex (None → zeros = pruned Dijkstra).
    """
    spark = g.edges.sparkSession
    for v, nm in ((source, "Source"), (target, "Target")):
        if not g.has_vertex(v):
            raise NodeNotFound(f"{nm} {v!r} is not in G "
                               "(reference NodeNotFound)")
    src_type = g.edges.schema[SRC].dataType.simpleString()
    s = str(source) if src_type == "string" else source
    t = str(target) if src_type == "string" else target
    if s == t:
        return 0.0, [s]
    adj = _adj(g, weight)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(n_part, SRC).cache()
    h = None
    if heuristic is not None:
        c0, c1 = heuristic.columns[:2]
        h = (heuristic.select(F.col(c0).alias(ID),
                              F.col(c1).cast("double").alias("_h")).cache())
    if max_iter is None:
        max_iter = max(16, g.number_of_vertices())

    runner = SuperstepRunner(None, name="astar", keep_scratch=4)
    try:
      with fixed_plan(spark):
        state = runner.cut(_seed(spark, s, src_type))
        mu = INF
        for _ in range(max_iter):
            frontier = state.filter("improved")
            if h is not None:
                frontier = (frontier.join(h, ID, "left")
                            .filter(F.col("dist")
                                    + F.coalesce("_h", F.lit(0.0))
                                    < F.lit(mu)))
            else:
                frontier = frontier.filter(F.col("dist") < F.lit(mu))
            obs = Observation()
            cand = (frontier.select(ID, "dist")
                    .join(adj, frontier[ID] == adj[SRC])
                    .groupBy(F.col(DST).alias(ID))
                    .agg(F.min(F.col("dist") + F.col("_w")).alias("_nd")))
            merged = (state.select(ID, "dist").join(cand, ID, "full")
                      .select(ID,
                              F.least(F.coalesce("dist", F.lit(INF)),
                                      F.coalesce("_nd", F.lit(INF)))
                              .alias("dist"),
                              (F.col("_nd").isNotNull() &
                               (F.col("dist").isNull() |
                                (F.col("_nd") < F.col("dist"))))
                              .alias("improved"))
                      .observe(obs, F.sum(F.col("improved").cast("long"))
                               .alias("chg")))
            state = runner.cut(merged)
            trow = state.filter(F.col(ID) == F.lit(t)).collect()
            if trow:
                mu = min(mu, float(trow[0]["dist"]))
            if int(obs.get["chg"] or 0) == 0:
                break
        if mu == INF:
            raise NoPath(f"Node {target!r} not reachable from {source!r} "
                         "(reference NetworkXNoPath)")
        path = _walk_path(
            state.select(ID, "dist").filter(F.col("dist") <= F.lit(mu)),
            adj, t)
        return mu, path
    finally:
        adj.unpersist()
        if h is not None:
            h.unpersist()
        runner.close()


def astar_path_length(g: Graph, source, target,
                      heuristic: Optional[DataFrame] = None,
                      weight: bool = True) -> float:
    """``astar.py:192``."""
    return astar_path(g, source, target, heuristic, weight)[0]

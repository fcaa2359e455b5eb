"""Weighted single-source shortest paths as relax-join supersteps.

Reference: ``networkx/algorithms/shortest_paths/weighted.py:321``
(``single_source_dijkstra_path_length``) and ``:1237``
(``single_source_bellman_ford_path_length``) — both return
``{node: distance}`` for every vertex reachable from the source.

Dijkstra's priority queue is inherently sequential; the distributed
formulation here is **frontier-pruned Bellman-Ford** (the relax-join
analogue of delta-stepping with a single bucket): every superstep relaxes
all out-edges of the vertices whose tentative distance improved last
superstep — ``min(dist + w)`` per target — and merges the result into the
state with ``least``.  At fixpoint the state equals Dijkstra's output
exactly (non-negative weights ⇒ Bellman-Ford and Dijkstra agree).
Supersteps needed = max hop count over all shortest paths, which on
short-diameter web graphs is small; each superstep is one shuffle join
(frontier ⋈ edges, the edge side cached pre-partitioned on ``src`` so only
the frontier shuffles) + one min-aggregation + the state merge, with the
changed-count observed on the checkpoint write (ONE job per superstep,
same pattern as pagerank.py / components.py).

Negative weights: ``single_source_dijkstra_path_length`` raises on
negative weights in practice (``weighted.py:115`` documents the
contradictory-paths hazard); here a single pre-scan rejects them unless
``allow_negative=True``, in which case the loop is plain Bellman-Ford and
a failure to converge within ``max_iter`` supersteps (default |V|) raises
— the distributed analogue of the reference's negative-cycle error
(``weighted.py:1285``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan
from networkx_spark.algorithms.bfs import NodeNotFound


def sssp_distances(g: Graph, source, weight: bool = True,
                   max_iter: Optional[int] = None,
                   allow_negative: bool = False,
                   checkpoint_dir: Optional[str] = None,
                   checkpoint_interval: int = 1) -> DataFrame:
    """(id, distance) for every vertex reachable from ``source`` —
    ``single_source_dijkstra_path_length`` semantics (reachable-only
    output, ``weighted.py:321``).  ``weight=False`` treats every edge as
    weight 1 (hop counts — matches ``bfs_distances`` on the same graph).
    Raises :class:`NodeNotFound` when the source is absent
    (``weighted.py:412-413``)."""
    spark = g.edges.sparkSession
    if not g.has_vertex(source):
        raise NodeNotFound(f"Source {source!r} is not in G")
    wcol = F.col(WEIGHT).cast("double") if weight else F.lit(1.0)
    adj = g.symmetrized().select(SRC, DST, wcol.alias("_w"))
    if weight and not allow_negative:
        mn = adj.agg(F.min("_w")).collect()[0][0]
        if mn is not None and mn < 0:
            raise ValueError(
                "negative edge weights: Dijkstra semantics undefined "
                "(reference weighted.py:115); pass allow_negative=True for "
                "Bellman-Ford")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(n_part, SRC).cache()

    src_type = g.edges.schema[SRC].dataType.simpleString()
    seed = str(source) if src_type == "string" else source
    if max_iter is None:
        max_iter = max(16, g.number_of_vertices())

    runner = SuperstepRunner(checkpoint_dir, name="sssp_state",
                             interval=checkpoint_interval)
    # bucketed snapshots: frontier⋈adjacency (id = src, co-partitioned
    # cache) and the state merge join re-read the state with
    # HashPartitioning(id) — the relax partials are the only shuffle
    runner.enable_bucketing([ID], n_part)
    try:
      with fixed_plan(spark):
        # state: (id, distance, improved) — improved marks last superstep's
        # frontier; it stays in the snapshot so resume/frontier selection is
        # a pushed-down filter, one byte per row
        state = runner.cut(spark.createDataFrame(
            [(seed, 0.0, True)],
            f"id {src_type}, distance double, improved boolean"))
        for it in range(max_iter):
            frontier = state.filter("improved").select(ID, "distance")
            cand = (frontier.join(adj, frontier[ID] == adj[SRC])
                    .groupBy(F.col(DST).alias(ID))
                    .agg(F.min(F.col("distance") + F.col("_w")).alias("_nd")))
            merged = (state.select(ID, "distance").join(cand, ID, "full")
                      .select(ID,
                              F.least(F.coalesce("distance", F.lit(float("inf"))),
                                      F.coalesce("_nd", F.lit(float("inf"))))
                              .alias("distance"),
                              (F.col("_nd").isNotNull() &
                               (F.col("distance").isNull() |
                                (F.col("_nd") < F.col("distance"))))
                              .alias("improved")))
            # changed count AND state cardinality ride the write (the state
            # grows as vertices become reachable, so rows can't be passed
            # a-priori like the constant-size pagerank/CC states)
            obs = Observation()
            state = runner.checkpoint(
                merged.observe(obs,
                               F.sum(F.col("improved").cast("long")).alias("chg"),
                               F.count(F.lit(1)).alias("rows")),
                it, rows=-1, extra={"algorithm": "sssp"})
            changed = int(obs.get["chg"] or 0)
            runner.update_last(residual=float(changed), changed=changed,
                               rows=int(obs.get["rows"]))
            if changed == 0:
                return state.select(ID, "distance")
        raise RuntimeError(
            f"SSSP did not converge within {max_iter} supersteps "
            "(negative cycle, or raise max_iter)")
    finally:
        adj.unpersist()
        runner.close()


def single_source_dijkstra_path_length(g: Graph, source,
                                       weight: bool = True) -> DataFrame:
    """Alias matching the reference entry point (``weighted.py:321``)."""
    return sssp_distances(g, source, weight=weight)


def sssp_predecessors(g: Graph, source, weight: bool = True,
                      max_iter: Optional[int] = None,
                      checkpoint_dir: Optional[str] = None) -> DataFrame:
    """(id, distance, pred): a deterministic shortest-path tree.

    ``pred(v) = min u over {u : dist(u) + w(u, v) == dist(v)}`` — derived
    in ONE post-fixpoint join against the edge table rather than carried
    through the superstep loop: an in-loop argmin would pin ``pred`` to
    whichever superstep last improved ``v`` (an execution-order artifact),
    while this definition is a pure function of the distance table —
    deterministic, one extra shuffle, and exactly expressible by a SQL
    oracle.  The equality is exact: both sides are the same single
    ``dist(u) + w`` double addition the relax loop minimized over.

    The reference's ``single_source_dijkstra`` (``weighted.py:421``)
    returns paths whose predecessor choice is heap-pop order; any tree
    realizing the same distances is a valid answer (parity is tested by
    path validity + length).  ``pred`` is null for the source.  With
    zero-weight edges the min-pred relation can contain 2-cycles between
    equidistant vertices; for strictly positive weights it is a tree.
    """
    dist = sssp_distances(g, source, weight=weight, max_iter=max_iter,
                          checkpoint_dir=checkpoint_dir)
    wcol = F.col(WEIGHT).cast("double") if weight else F.lit(1.0)
    adj = g.symmetrized().select(SRC, DST, wcol.alias("_w"))
    du = dist.select(F.col(ID).alias(SRC), F.col("distance").alias("_du"))
    dv = dist.select(F.col(ID).alias(DST), F.col("distance").alias("_dv"))
    preds = (adj.join(du, SRC).join(dv, DST)
             .filter(F.col("_du") + F.col("_w") == F.col("_dv"))
             .groupBy(F.col(DST).alias(ID)).agg(F.min(SRC).alias("pred")))
    return (dist.join(preds, ID, "left")
            .select(ID, "distance", "pred"))


def single_source_dijkstra_path(g: Graph, source, weight: bool = True,
                                max_iter: Optional[int] = None) -> DataFrame:
    """(id, distance, path array) for every reachable vertex — the paths
    half of the reference's ``single_source_dijkstra`` (``weighted.py:421``).

    Built layer-by-layer over the :func:`sssp_predecessors` tree: vertices
    at tree depth d extend their predecessor's path — one broadcast-free
    join per depth level, so the superstep count is the shortest-path tree
    height (~graph diameter: single digits on web graphs).  The output is
    O(Σ path lengths) — inherently larger than the distance table; at 100 TB
    scale prefer the predecessor table and reconstruct per-target paths.
    """
    spark = g.edges.sparkSession
    pred = sssp_predecessors(g, source, weight=weight, max_iter=max_iter)
    # keep_scratch=0: ``done`` accumulates unions over EVERY level's
    # snapshot, so rotation would delete files still referenced
    runner = SuperstepRunner(None, name="sssp_paths", keep_scratch=0)
    try:
      with fixed_plan(spark):
        pred = runner.cut(pred)
        # tree roots: the source (pred null)
        done = pred.filter(F.col("pred").isNull()).select(
            ID, "distance", F.array(ID).alias("path"))
        frontier = done.select(F.col(ID).alias("_p"), F.col("path").alias("_pp"))
        rest = pred.filter(F.col("pred").isNotNull())
        while True:
            nxt = (rest.join(frontier, rest["pred"] == frontier["_p"])
                   .select(ID, "distance",
                           F.concat("_pp", F.array(ID)).alias("path")))
            obs = Observation()
            nxt = runner.cut(nxt.observe(obs, F.count(F.lit(1)).alias("n")))
            if int(obs.get["n"] or 0) == 0:
                return done
            done = done.unionByName(nxt)
            frontier = nxt.select(F.col(ID).alias("_p"), F.col("path").alias("_pp"))
            rest = rest.join(nxt.select(ID), ID, "anti")
    finally:
        runner.close()


def shortest_path(g: Graph, source, target, weight: bool = True) -> list:
    """Node list of one shortest source→target path — reference
    ``single_source_dijkstra(G, s, t)[1]`` / ``nx.shortest_path``
    (``weighted.py:421``).  Driver-side pred-chain walk: O(path length)
    point lookups on the predecessor table — a documented test/tooling-scale
    helper like ``Graph.has_node``; batch workloads should join against
    :func:`sssp_predecessors` instead.  Raises :class:`NodeNotFound` when
    the target is unreachable (reference raises ``NetworkXNoPath``)."""
    pred = sssp_predecessors(g, source, weight=weight).cache()
    try:
        src_type = g.edges.schema[SRC].dataType.simpleString()
        cur = str(target) if src_type == "string" else target
        out = []
        for _ in range(int(pred.count()) + 1):
            out.append(cur)
            row = pred.filter(F.col(ID) == cur).collect()
            if not row:
                raise NodeNotFound(f"No path to {target!r}")
            if row[0]["pred"] is None:
                return list(reversed(out))
            cur = row[0]["pred"]
        raise RuntimeError("predecessor chain longer than |V| (cycle?)")
    finally:
        pred.unpersist()

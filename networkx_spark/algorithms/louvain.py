"""Louvain community detection + modularity as DataFrame supersteps.

Reference: ``networkx/algorithms/community/louvain.py:16``
(``louvain_communities``) and ``community/quality.py:115`` (``modularity``).

The reference's ``_one_level`` (``louvain.py:205-260``) moves nodes one at
a time in a seeded random order, each move using the exact same gain
formula implemented here:

    gain(i → C) = w_{i,C}/m − γ·Σtot'_C·k_i/(2m²)

with Σtot' excluding i itself, compared against the same expression for
the current community; a node moves only when strictly better
(``:242-249``).  A sequential node order cannot be distributed, so this
engine uses the same schedule trick as LPA: a proper coloring of the
level graph (``greedy_color``) makes same-color nodes pairwise
non-adjacent, and processing color classes sequentially — recomputing the
community totals Σtot before each class — is a valid (deterministic)
asynchronous order.  Non-adjacent nodes sharing a *target* community can
still interact through Σtot; like every parallel Louvain (e.g.
Grappolo-style half-approximation), those moves use the start-of-class
totals — the level loop still terminates because each level accepts the
coarsening only while the EXACT modularity (recomputed from scratch)
improves by more than ``threshold`` (reference ``:365-372`` semantics).

Phases per level: sweeps of color-class moves until quiescent, then graph
coarsening — communities become vertices, edge weights sum, intra-
community weight becomes a self-loop (``_gen_graph``, ``louvain.py:288``)
— and a vertex→community mapping composition so the final labels map the
ORIGINAL vertices.  Every move step is one spark.sql statement over temp
views + one lineage cut (see label_propagation.py for why SQL beats
incremental DataFrame building on tiny per-step plans).

Scale posture: state is (id, comm, k) per vertex plus the level edge
table; each move step is two shuffles (neighbor-community weights,
community totals) bounded by the level's edge count, which shrinks
geometrically with coarsening.  Labels are original vertex ids —
communities compare up to relabeling like the reference's sets.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan, tuned_partitions


def modularity(g: Graph, labels: DataFrame, resolution: float = 1.0) -> float:
    """Modularity of a partition (``quality.py:115``):
    ``Q = Σ_c [ L_c/m − γ·(D_c/(2m))² ]`` with ``L_c`` the intra-community
    edge weight (self-loops once), ``D_c`` the community degree sum
    (self-loops twice), ``m`` the total edge weight.  ``labels`` is any
    ``(id, <label>)`` DataFrame."""
    if g.directed:
        raise ValueError("modularity: directed graphs not supported here; "
                         "symmetrize first (reference supports both, this "
                         "engine scopes to the undirected form)")
    lab = labels.select(F.col(labels.columns[0]).alias(ID),
                        F.col(labels.columns[1]).alias("_c"))
    e = g.edges.select(SRC, DST, WEIGHT)
    m = e.agg(F.sum(WEIGHT)).collect()[0][0] or 0.0
    if m == 0:
        raise ValueError("modularity is undefined for an empty graph")
    intra = (e.join(lab.withColumnsRenamed({ID: SRC, "_c": "_ca"}), SRC)
             .join(lab.withColumnsRenamed({ID: DST, "_c": "_cb"}), DST)
             .filter(F.col("_ca") == F.col("_cb"))
             .groupBy("_ca").agg(F.sum(WEIGHT).alias("lc")))
    degs = (g.degrees(weighted=True).join(lab, ID)
            .groupBy("_c").agg(F.sum("degree").alias("dc")))
    row = (degs.join(intra, degs["_c"] == intra["_ca"], "left")
           .agg(F.sum(F.coalesce("lc", F.lit(0.0)) / F.lit(m)
                      - F.lit(resolution)
                      * (F.col("dc") / F.lit(2.0 * m)) ** 2).alias("q"))
           .collect()[0])
    return float(row["q"] or 0.0)


_MOVE_SQL = """
SELECT s.id, coalesce(b.ncomm, s.comm) AS comm, s.k, s.color,
       (b.ncomm IS NOT NULL AND b.ncomm != s.comm) AS _moved
FROM nxs_lv_state s
LEFT JOIN (
  SELECT id, best.ncomm AS ncomm FROM (
    SELECT id,
           max(named_struct('score', score,
                            'cur', CASE WHEN ncomm = comm THEN 1 ELSE 0 END,
                            'h', -xxhash64({seed}, {sweep}, id, ncomm),
                            'ncomm', ncomm)) AS best
    FROM (
      SELECT c.id, c.comm, c.ncomm,
             c.wt / {m} - {gamma} * (st.stot -
                 CASE WHEN c.ncomm = c.comm THEN c.k ELSE 0.0 END)
                 * c.k / (2.0 * {m} * {m}) AS score
      FROM (
        -- neighbor-community weights for this color class, plus a zero-
        -- weight row for the current community when no neighbor is in it
        SELECT m.id, m.comm, m.k, w.ncomm, w.wt FROM (
          SELECT a.id, sn.comm AS ncomm, sum(a.w) AS wt
          FROM nxs_lv_adj a
          JOIN nxs_lv_state sm ON sm.id = a.id AND sm.color = {c}
          JOIN nxs_lv_state sn ON sn.id = a.nbr
          GROUP BY a.id, sn.comm
        ) w JOIN nxs_lv_state m ON m.id = w.id
        UNION ALL
        SELECT m.id, m.comm, m.k, m.comm AS ncomm, 0.0 AS wt
        FROM nxs_lv_state m
        WHERE m.color = {c} AND NOT EXISTS (
          SELECT 1 FROM nxs_lv_adj a JOIN nxs_lv_state sn ON sn.id = a.nbr
          WHERE a.id = m.id AND sn.comm = m.comm)
      ) c
      JOIN (SELECT comm, sum(k) AS stot FROM nxs_lv_state GROUP BY comm) st
        ON st.comm = c.ncomm
    ) GROUP BY id
  )
) b ON b.id = s.id
"""


def _one_level(g: Graph, m: float, resolution: float, seed: int,
               runner: SuperstepRunner, max_sweeps: int) -> DataFrame:
    """Move phase on one (possibly coarsened) level graph → (id, comm)."""
    from networkx_spark.algorithms.label_propagation import greedy_color
    spark = g.edges.sparkSession
    colors = greedy_color(g).cache()
    color_list = [r["color"] for r in
                  colors.select("color").distinct().orderBy("color").collect()]
    # adjacency both directions, self-loops excluded from neighbor weights
    # (they move with the node — constant across targets; reference nbrs
    # dict also drops them, louvain.py:228); k keeps them twice via degrees
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"),
                   F.col(WEIGHT).alias("w"))).cache()
    adj.createOrReplaceTempView("nxs_lv_adj")
    state = runner.cut(
        g.degrees(weighted=True).join(colors, ID)
        .select(ID, F.col(ID).alias("comm"),
                F.col("degree").cast("double").alias("k"), "color"))
    try:
        for sweep in range(max_sweeps):
            moved = 0
            for c in color_list:
                state.createOrReplaceTempView("nxs_lv_state")
                obs = Observation()
                nxt = (spark.sql(_MOVE_SQL.format(
                          c=c, m=repr(float(m)), gamma=repr(float(resolution)),
                          seed=int(seed), sweep=sweep))
                       .observe(obs, F.sum(F.col("_moved").cast("long"))
                                .alias("mv")))
                state = runner.cut(nxt.drop("_moved"))
                moved += int(obs.get["mv"] or 0)
            if moved == 0:
                break
        return state.select(ID, "comm")
    finally:
        adj.unpersist()
        colors.unpersist()


def louvain_communities(g: Graph, resolution: float = 1.0,
                        threshold: float = 1e-7, seed: int | None = None,
                        max_levels: int = 20, max_sweeps: int = 20,
                        checkpoint_dir: Optional[str] = None) -> DataFrame:
    """(id, label) — deterministic distributed Louvain
    (``louvain.py:16``); label = an original vertex id of the community.

    Levels continue while the exact modularity improves by more than
    ``threshold`` (reference ``:365-372``); determinism comes from the
    color-class schedule plus hash tie-breaks, so the same (graph, seed)
    yields the same partition at any parallelism."""
    if g.directed:
        raise ValueError("louvain_communities: directed input not supported; "
                         "call g.to_undirected() first (engine scope)")
    spark = g.edges.sparkSession
    n = g.number_of_vertices()
    # keep_scratch=0: the mapping / level-edge snapshots from earlier
    # levels stay referenced until the final join — rotation would delete
    # files still backing live DataFrames
    runner = SuperstepRunner(checkpoint_dir, name="louvain", keep_scratch=0)
    try:
      with tuned_partitions(spark, n), fixed_plan(spark):
        level = Graph.from_edges(
            g.edges.select(SRC, DST, WEIGHT), directed=False, weight=WEIGHT,
            combine="sum")
        mapping: Optional[DataFrame] = None   # original id -> current comm
        m = level.edges.agg(F.sum(WEIGHT)).collect()[0][0] or 0.0
        if m == 0:
            return g.vertices().select(ID, F.col(ID).alias("label"))
        best_q = modularity(level, level.vertices()
                            .select(ID, F.col(ID).alias("label")), resolution)
        for lv in range(max_levels):
            comm = _one_level(level, m, resolution, int(seed or 0),
                              runner, max_sweeps)
            q = modularity(level, comm, resolution)
            improvement = q - best_q
            if q > best_q:
                # accept (reference yields the level's partition before the
                # threshold check, so final small-gain moves are kept);
                # a net-negative parallel level is never accepted
                best_q = q
                mapping = runner.cut(
                    comm if mapping is None
                    else mapping.join(
                        comm.select(F.col(ID).alias("comm"),
                                    F.col("comm").alias("_new")),
                        "comm").select(ID, F.col("_new").alias("comm")))
            if improvement <= threshold:
                break
            # coarsen: communities → vertices, intra weight → self-loop
            ce = (level.edges
                  .join(comm.withColumnsRenamed({ID: SRC, "comm": "_ca"}), SRC)
                  .join(comm.withColumnsRenamed({ID: DST, "comm": "_cb"}), DST)
                  .select(F.least("_ca", "_cb").alias(SRC),
                          F.greatest("_ca", "_cb").alias(DST), WEIGHT))
            level = Graph.from_edges(runner.cut(
                ce.groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT))),
                directed=False, weight=WEIGHT, combine="sum")
        if mapping is None:
            return g.vertices().select(ID, F.col(ID).alias("label"))
        return (g.vertices().join(mapping, ID, "left")
                .select(ID, F.coalesce("comm", F.col(ID)).alias("label")))
    finally:
        runner.close()

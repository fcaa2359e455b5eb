"""Label propagation (semi-synchronous + seeded variants) on DataFrames.

Reference: ``networkx/algorithms/community/label_propagation.py``.

* :func:`label_propagation_communities` (``:237-337``, Cordasco & Gargano
  2010): properly color the graph (``_color_network`` ``:281-293``), give
  every node a unique label (``:268``), then sweep color class by color
  class setting each node's label to the most frequent neighbor label with
  the **Prec-Max** tie-break — keep the current label if it is in the
  argmax set, else take the max label (``_update_label`` ``:325-337``) —
  until every node's label is in its neighborhood's max-frequency set
  (``_labeling_complete`` ``:296-306``).
* :func:`asyn_lpa_communities` (``:141-232``): asynchronous seeded LPA —
  shuffled node order, weighted neighbor-label counts, a node keeps its
  label when it is already in the argmax set and otherwise takes a
  seed-random member of the argmax set (``:216-229``).
* :func:`fast_label_propagation_communities` (``:18-101``): queue-based
  seeded LPA — only nodes whose neighborhood changed are revisited.

Nodes of one color class are pairwise non-adjacent, so all updates within
a color are order-independent — which is what makes the semi-synchronous
algorithm expressible as synchronous DataFrame supersteps: one join +
groupBy + window per color class.  The *asynchronous* variants are
inherently sequential in the reference; here they run as the same
color-class-sequential sweeps (updates within a class are independent, so
this is a valid asynchronous schedule) with the reference's keep-if-best
rule and a **seed-deterministic** tie-break: the "random" choice among
tied labels is ``xxhash64(seed, sweep, id, label)``-argmax, a
per-partition-deterministic RNG — same (seed, graph) in, same communities
out, at any parallelism (SURVEY §2.9).  Fixtures with a unique stable
outcome match the reference exactly; ambiguous fixtures land on one of
the reference-accepted outcomes.

**Coloring.**  The reference's greedy coloring is sequential (insertion
order); any *proper* coloring preserves the algorithm's guarantees, so we
use a deterministic distributed greedy coloring: vertices acquire colors in
rounds; a vertex colors itself once no uncolored neighbor has higher
priority ``(degree desc, xxhash64(id))``, taking the minimum color absent
from its already-colored neighborhood (computed JVM-side with array
functions).  Hash priorities make the expected number of rounds
O(log n) regardless of id layout.

**Superstep cadence.**  One durable checkpoint + metrics line per SWEEP;
within a sweep each color-class update is materialized as an in-memory
cache (lineage stays shallow, no parquet round-trip per color) — the
per-color-parquet cadence was measured at ~100× the fixed cost of the
actual joins on small graphs.

**Labels** are the vertex ids themselves (unique, orderable, stable under
resume) instead of the reference's enumeration index — communities compare
exactly up to relabeling, and ``max(label)`` stays a deterministic rule.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan, tuned_partitions


def greedy_color(g: Graph, max_rounds: int = 500,
                 strategy: str = "largest_first") -> DataFrame:
    """(id, color) — proper coloring (no edge joins two same-colored
    vertices).  Distributed analogue of ``nx.coloring.greedy_color``
    (``greedy_coloring.py:265``): Jones-Plassmann rounds under a vertex
    priority.  ``strategy='largest_first'`` (``:23-30``) prioritizes by
    (degree desc, hash) — fewest colors, but the degree gradient creates
    long sequential chains (measured 22 rounds on the 2k web graph);
    ``'random_sequential'`` (``:51-63``) uses the hash alone.  Measured on
    the 2k web graph largest_first wins on BOTH rounds (22 vs 42) and
    colors (8 vs 12): the hub-degree gradient parallelizes better than a
    random order on power-law graphs, so it stays the default.

    Per-round state is cut with a parquet round-trip (see superstep.py for
    why ``localCheckpoint`` chains are off-limits).  Each round's update is
    ONE ``spark.sql`` statement over temp views: classic PySpark analyzes
    every DataFrame transformation eagerly over py4j, and on these
    multi-join round plans that driver-side build cost was comparable to
    the execution itself (measured ~0.7s build vs ~0.6s exec per round on
    tiny graphs); a single SQL parse+analysis drops it to ~50ms."""
    spark = g.edges.sparkSession
    runner = SuperstepRunner(None, name="coloring")
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))).cache()
    adj.createOrReplaceTempView("nxs_color_adj")
    # ONE aggregation per round computes, for every vertex, both the max
    # priority among its uncolored neighbors and the color set of its
    # colored neighbors; a vertex wins (colors itself with the mex of
    # `used`) when its own (deg, h) priority struct beats every uncolored
    # neighbor's.  Priority: degree desc, then xxhash asc (~ flips the hash
    # so the struct comparison is uniformly "greater wins"); >= keeps the
    # original strict-blocking semantics on (astronomical) hash ties.
    ROUND_SQL = """
SELECT s.id, s.deg, s.h, coalesce(c._nc, s.color) AS color
FROM nxs_color_state s
LEFT JOIN (
  SELECT s2.id,
         filter(sequence(0, size(coalesce(g.used, array()))),
                x -> NOT array_contains(coalesce(g.used, array()), x))[0] AS _nc
  FROM (SELECT * FROM nxs_color_state WHERE color IS NULL) s2
  LEFT JOIN (
    SELECT a.id,
           max(CASE WHEN s3.color IS NULL
               THEN named_struct('d', s3.deg, 'r', ~s3.h) END) AS mup,
           array_sort(collect_set(s3.color)) AS used
    FROM nxs_color_adj a JOIN nxs_color_state s3 ON s3.id = a.nbr
    GROUP BY a.id
  ) g ON g.id = s2.id
  WHERE g.mup IS NULL OR named_struct('d', s2.deg, 'r', ~s2.h) >= g.mup
) c ON c.id = s.id
"""
    try:
      with fixed_plan(spark):
        deg = adj.groupBy(ID).agg(F.count("*").alias("deg"))
        deg_prio = (F.coalesce("deg", F.lit(0)) if strategy == "largest_first"
                    else F.lit(0))
        prio = (g.vertices().join(deg, ID, "left")
                .select(ID, deg_prio.alias("deg"),
                        F.coalesce("deg", F.lit(0)).alias("truedeg"),
                        F.xxhash64(ID).alias("h")))
        # isolated vertices: color 0 immediately
        state = prio.select(
            ID, "deg", "h",
            F.when(F.col("truedeg") == 0, F.lit(0)).otherwise(F.lit(None).cast("int"))
             .alias("color"))
        obs = Observation()
        state = runner.cut(state.observe(
            obs, F.count(F.when(F.col("color").isNull(), 1)).alias("rem")))
        remaining = obs.get["rem"]
        for _ in range(max_rounds):
            if remaining == 0:
                break
            state.createOrReplaceTempView("nxs_color_state")
            obs = Observation()
            nxt = spark.sql(ROUND_SQL).observe(
                obs, F.count(F.when(F.col("color").isNull(), 1)).alias("rem"))
            state = runner.cut(nxt)
            remaining = obs.get["rem"]
        return state.select(ID, "color")
    finally:
        adj.unpersist()
        runner.close()


def _tie_rank(tie: str, seed: int | None, sweep: int):
    """Secondary sort key choosing among the argmax labels: the chosen
    label is the one maximizing ``struct(cnt, tie_rank, nlabel)``."""
    if tie == "precmax":
        # deterministic max label (reference _update_label, :325-337)
        return F.lit(0)
    # seeded "random" choice (reference seed.choice(best_labels), :216-229):
    # argmax of a seed/sweep/node/label hash — per-partition deterministic
    return F.xxhash64(F.lit(int(seed or 0)), F.lit(sweep), F.col(ID), F.col("nlabel"))


def _sweep_lpa(
    g: Graph,
    tie: str,
    weight: bool = False,
    seed: int | None = None,
    max_sweeps: int = 100,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
    frontier: bool = False,
    name: str = "lpa_state",
) -> DataFrame:
    """Shared color-class-sequential sweep engine → (id, label).

    State layout: ONE parquet-backed table ``(id, label, color, _chg)``
    rewritten after every color-class update.  The per-color parquet cut
    resets the logical plan, so the 3 references per update point at a
    single flat relation — this replaces the earlier one-part-per-color
    union (8 parquet relations in every join) whose Catalyst analysis cost
    dominated the tiny per-color jobs (measured ~2× per-color job time).

    No-op pruning (all variants): a color-class update is a deterministic
    function of its members' neighborhoods; if since the class's previous
    update no member's label and no member-neighbor's label changed, the
    update provably returns the same labels (keep-if-best keeps the
    previous argmax choice even for the seeded tie-break, because the
    frequency table is unchanged and the current label is in its argmax
    set).  So each sweep touches only colors with a member in
    ``active = changed ∪ N(changed)`` — final labels are identical to the
    unpruned schedule, sweep-by-sweep.  This is also exactly the
    reference's fast-LPA queue semantics (``:92-99``), so ``frontier``
    merely selects the fast-LPA metrics name.
    """
    if g.directed:
        raise ValueError("label propagation is not implemented for directed "
                         "graphs (reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    runner = SuperstepRunner(checkpoint_dir, name=name,
                             interval=checkpoint_interval)
    # adjacency both directions, self-loop once — the reference counts over
    # G[node] (label_propagation.py:320); weighted counts for the seeded
    # variants (``:211-215``)
    wcol = F.col(WEIGHT) if weight else F.lit(1.0)
    adj = (g.symmetrized()
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"), wcol.alias("_w"))
           ).cache()
    adj.createOrReplaceTempView("nxs_lpa_adj")

    # the whole color-class update is ONE spark.sql statement (same
    # rationale as greedy_color: eager per-transformation analysis made the
    # driver-side plan build as expensive as the execution).  Two
    # aggregations: (1) neighbor-label frequencies for this color class,
    # current label carried along; (2) argmax with keep-if-best —
    # struct-max picks (cnt, tie_rank, nlabel)-lexicographic max, i.e. the
    # tie-break among the max-frequency labels.  Literal types in the tie
    # hash stay INT to keep xxhash64 values (and thus seeded goldens)
    # identical to the F.lit() form.
    UPDATE_SQL = """
SELECT l.id, coalesce(u.new_label, l.label) AS label, l.color,
       (u.new_label IS NOT NULL AND u.new_label != l.label)
       OR (l.color != {c} AND l._chg) AS _chg
FROM nxs_lpa_labels l
LEFT JOIN (
  SELECT id, CASE WHEN cur_cnt = mx THEN cur ELSE top.nlabel END AS new_label
  FROM (
    SELECT id, cur,
           max(named_struct('cnt', cnt, 'r', {tie}, 'nlabel', nlabel)) AS top,
           max(cnt) AS mx,
           max(CASE WHEN nlabel = cur THEN cnt END) AS cur_cnt
    FROM (
      SELECT a.id, m.cur, ln.label AS nlabel, sum(a._w) AS cnt
      FROM nxs_lpa_adj a
      JOIN (SELECT id, label AS cur FROM nxs_lpa_labels WHERE color = {c}) m
        ON a.id = m.id
      JOIN nxs_lpa_labels ln ON ln.id = a.nbr
      GROUP BY a.id, m.cur, ln.label
    ) GROUP BY id, cur
  )
) u ON u.id = l.id
"""
    tie_sql = ("0L" if tie == "precmax"
               else f"xxhash64({int(seed or 0)}, {{sweep}}, id, nlabel)")

    colors: Optional[DataFrame] = None
    n = g.number_of_vertices()
    try:
      with tuned_partitions(spark, n), fixed_plan(spark):
        colors = greedy_color(g).cache()
        color_list = [r["color"] for r in
                      colors.select("color").distinct().orderBy("color").collect()]
        labels = runner.cut(
            g.vertices().join(colors, ID)
            .select(ID, F.col(ID).alias("label"), "color",
                    F.lit(True).alias("_chg")))   # everything active at start
        for sweep in range(max_sweeps):
            # ONE job finds the colors that still have an active member:
            # active = changed ∪ neighbors(changed), intersected with each
            # color class — late sweeps typically touch 1-2 of the classes
            if sweep == 0:
                live = color_list
            else:
                chg = labels.filter("_chg").select(ID)
                act = (adj.join(chg, ID, "semi").select(F.col("nbr").alias(ID))
                       .unionByName(chg))
                live = sorted(r["color"] for r in
                              labels.join(act, ID, "semi")
                              .select("color").distinct().collect())
            n_changed = 0
            for i, c in enumerate(live):
                labels.createOrReplaceTempView("nxs_lpa_labels")
                obs = Observation()
                new_labels = (spark.sql(UPDATE_SQL.format(
                                  c=c, tie=tie_sql.format(sweep=sweep)))
                              .observe(obs, F.sum(
                                  F.when(F.col("color") == c, F.col("_chg").cast("long"))
                                  .otherwise(F.lit(0))).alias("chg")))
                # within a sweep, cut with an EAGER localCheckpoint
                # (executor-memory materialization) instead of a parquet
                # round-trip: the sequential per-color barrier is pure
                # job-launch + write fixed cost, and the in-memory cut
                # roughly halves it (the round-3 LPA latency finding).
                # localCheckpoint chains blow up Catalyst stats after ~10
                # links (superstep.py module docs), so every 6th color —
                # and every sweep end via runner.checkpoint — cuts to
                # parquet, resetting the chain; durable per-sweep parquet
                # remains the resumable north-rule checkpoint.
                if (i + 1) % 6 == 0:
                    labels = runner.cut(new_labels)
                else:
                    labels = new_labels.localCheckpoint(eager=True)
                n_changed += int(obs.get["chg"] or 0)
            out = runner.checkpoint(labels, sweep, rows=n,
                                    extra={"algorithm": f"lpa:{tie}", "sweep": sweep,
                                           "colors": len(color_list),
                                           "live_colors": len(live),
                                           "changed": n_changed})
            # completeness == quiescence: a node keeps its label exactly
            # when it is in the argmax set (keep-if-best), so a sweep with
            # zero changes IS the reference's _labeling_complete condition
            # (:296-306); pruned colors were complete when pruned and their
            # members' neighborhoods have not changed since
            runner.update_last(residual=float(n_changed))
            if n_changed == 0:
                return out.select(ID, "label")
            labels = out
        raise RuntimeError(f"LPA did not stabilize within {max_sweeps} sweeps")
    finally:
        adj.unpersist()
        if colors is not None:
            colors.unpersist()
        runner.close()


def label_propagation_communities(
    g: Graph,
    max_sweeps: int = 100,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """(id, label) — label = a member vertex id of the community.

    Matches the reference's semi-synchronous variant
    (``label_propagation.py:237-337``) up to the (valid) choice of proper
    coloring; fixture outcomes with a unique answer are identical,
    ambiguous fixtures land on one of the reference-accepted answers
    (``test_label_propagation.py:88-104``).
    """
    return _sweep_lpa(g, tie="precmax", weight=False, max_sweeps=max_sweeps,
                      checkpoint_dir=checkpoint_dir,
                      checkpoint_interval=checkpoint_interval)


def asyn_lpa_communities(
    g: Graph,
    weight: bool = False,
    seed: int | None = None,
    max_sweeps: int = 100,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """(id, label) — seeded asynchronous LPA
    (``label_propagation.py:141-232``): weighted neighbor-label counts,
    keep-if-best, seed-random choice among tied labels.  The asynchronous
    schedule is realized as color-class-sequential sweeps (a valid async
    order — within a class no two nodes are adjacent), with the random
    choice made seed-deterministic via hashing (see module docstring)."""
    return _sweep_lpa(g, tie="random", weight=weight, seed=seed,
                      max_sweeps=max_sweeps, checkpoint_dir=checkpoint_dir,
                      name="asyn_lpa_state")


def fast_label_propagation_communities(
    g: Graph,
    weight: bool = False,
    seed: int | None = None,
    max_sweeps: int = 100,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """(id, label) — seeded queue-based LPA
    (``label_propagation.py:18-101``): like :func:`asyn_lpa_communities`
    but after the first sweep only nodes in the neighborhood of a label
    change are revisited (the reference's node queue, ``:92-99``),
    distributed as a frontier semi-join."""
    return _sweep_lpa(g, tie="random", weight=weight, seed=seed,
                      max_sweeps=max_sweeps, checkpoint_dir=checkpoint_dir,
                      frontier=True, name="fast_lpa_state")

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
    why ``localCheckpoint`` chains are off-limits)."""
    runner = SuperstepRunner(None, name="coloring")
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))).cache()
    try:
      with fixed_plan(g.edges.sparkSession):
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
            # ONE aggregation per round computes, for every vertex, both the
            # max priority among its uncolored neighbors and the color set
            # of its colored neighbors; a vertex wins (colors itself with
            # the mex of `used`) when its own (deg, h, id) priority struct
            # beats every uncolored neighbor's
            nbrinfo = (adj.join(state.select(F.col(ID).alias("nbr"),
                                             F.col("deg").alias("ndeg"),
                                             F.col("h").alias("nh"),
                                             F.col("color").alias("nc")),
                                "nbr"))
            # priority: degree desc, then xxhash asc (~ flips the hash so the
            # struct comparison is uniformly "greater wins"); >= keeps the
            # original strict-blocking semantics on (astronomical) hash ties
            agg = (nbrinfo.groupBy(ID).agg(
                F.max(F.when(F.col("nc").isNull(),
                             F.struct(F.col("ndeg").alias("d"),
                                      F.bitwise_not(F.col("nh")).alias("r")))).alias("mup"),
                F.array_sort(F.collect_set("nc")).alias("used")))
            colored = (state.filter(F.col("color").isNull())
                       .join(agg, ID, "left")
                       .filter(F.col("mup").isNull() |
                               (F.struct(F.col("deg").alias("d"),
                                         F.bitwise_not(F.col("h")).alias("r"))
                                >= F.col("mup")))
                       .withColumn("used", F.coalesce("used", F.array()))
                       .withColumn("_nc", F.expr(
                           "filter(sequence(0, size(used)), x -> NOT array_contains(used, x))[0]"))
                       .select(ID, "_nc"))
            obs = Observation()
            nxt = (state.join(colored, ID, "left")
                   .select(ID, "deg", "h", F.coalesce("_nc", "color").alias("color"))
                   .observe(obs, F.count(F.when(F.col("color").isNull(), 1)).alias("rem")))
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
    """Shared color-class-sequential sweep engine → (id, label)."""
    if g.directed:
        raise ValueError("label propagation is not implemented for directed "
                         "graphs (reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    # keep_scratch=0: all color-class parts of the current sweep (plus the
    # frontier) stay referenced simultaneously — rotation would delete
    # files still backing live DataFrames
    runner = SuperstepRunner(checkpoint_dir, name=name,
                             interval=checkpoint_interval, keep_scratch=0)
    # adjacency both directions, self-loop once — the reference counts over
    # G[node] (label_propagation.py:320); weighted counts for the seeded
    # variants (``:211-215``)
    wcol = F.col(WEIGHT) if weight else F.lit(1.0)
    adj = (g.symmetrized()
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"), wcol.alias("_w"))
           ).cache()

    # frontier mode (fast_label_propagation, :56-99): only nodes adjacent
    # to a change are revisited next sweep; None = all nodes active
    active: Optional[DataFrame] = None
    colors: Optional[DataFrame] = None
    n = g.number_of_vertices()
    try:
      with tuned_partitions(spark, n), fixed_plan(spark):
        colors = greedy_color(g).cache()
        color_list = [r["color"] for r in
                      colors.select("color").distinct().orderBy("color").collect()]
        # labels live as one parquet-backed PART per color class: a color's
        # update rewrites only its own (small) part, so the lazy plan per
        # color stays flat — a single chained `labels` DataFrame is
        # referenced 3× per update and its logical plan grows as 3^colors
        # within a sweep (measured: 34s of driver analysis by the 8th color
        # on 2k vertices)
        parts: dict[int, DataFrame] = {}
        for c in color_list:
            parts[c] = runner.cut(
                g.vertices().join(colors.filter(F.col("color") == c), ID, "semi")
                .select(ID, F.col(ID).alias("label")))

        def labels_view() -> DataFrame:
            out = parts[color_list[0]]
            for c in color_list[1:]:
                out = out.unionByName(parts[c])
            return out
        for sweep in range(max_sweeps):
            n_changed = 0
            changed_parts = []
            for c in color_list:
                part = parts[c]
                members = part
                if active is not None:
                    members = members.join(active, ID, "semi")
                # two aggregations total: (1) neighbor-label frequencies for
                # this color class, current label carried along; (2) argmax
                # with keep-if-best — struct-max picks (cnt, tie_rank,
                # nlabel)-lexicographic max, i.e. the tie-break among the
                # max-frequency labels
                freq = (adj.join(members.withColumnRenamed("label", "cur"), ID)
                        .join(labels_view().select(F.col(ID).alias("nbr"),
                                                   F.col("label").alias("nlabel")), "nbr")
                        .groupBy(ID, "cur", "nlabel").agg(F.sum("_w").alias("cnt")))
                upd = (freq.groupBy(ID, "cur")
                       .agg(F.max(F.struct(F.col("cnt"),
                                           _tie_rank(tie, seed, sweep).alias("_r"),
                                           F.col("nlabel"))).alias("top"),
                            F.max("cnt").alias("mx"),
                            F.max(F.when(F.col("nlabel") == F.col("cur"), F.col("cnt"))
                                  ).alias("cur_cnt"))
                       .select(ID, F.when(F.col("cur_cnt") == F.col("mx"), F.col("cur"))
                               .otherwise(F.col("top").getField("nlabel"))
                               .alias("new_label")))
                obs = Observation()
                new_part = (part.join(upd, ID, "left")
                            .select(ID, F.coalesce("new_label", "label").alias("label"),
                                    (F.col("new_label").isNotNull() &
                                     (F.col("new_label") != F.col("label"))).alias("_chg"))
                            .observe(obs, F.sum(F.col("_chg").cast("long")).alias("chg")))
                parts[c] = runner.cut(new_part)
                n_changed += int(obs.get["chg"] or 0)
                if frontier:
                    changed_parts.append(parts[c].filter("_chg").select(ID))
                parts[c] = parts[c].select(ID, "label")
            labels = runner.checkpoint(labels_view(), sweep,
                                       extra={"algorithm": f"lpa:{tie}", "sweep": sweep,
                                              "colors": len(color_list),
                                              "changed": n_changed})
            # completeness == quiescence: a node keeps its label exactly
            # when it is in the argmax set (keep-if-best), so a sweep with
            # zero changes IS the reference's _labeling_complete condition
            # (:296-306); in frontier mode inactive nodes were complete
            # when deactivated and their neighborhoods have not changed
            runner.update_last(residual=float(n_changed))
            if n_changed == 0:
                return labels
            if frontier:
                chg = changed_parts[0]
                for p in changed_parts[1:]:
                    chg = chg.unionByName(p)
                active = runner.cut(
                    adj.join(chg, ID, "semi").select(F.col("nbr").alias(ID))
                    .unionByName(chg).distinct())
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

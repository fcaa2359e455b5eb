"""Semi-synchronous label propagation (Cordasco & Gargano 2010) on DataFrames.

Reference: ``networkx/algorithms/community/label_propagation.py:237-337``.
The reference (a) properly colors the graph with greedy largest-first
coloring (``_color_network`` ``:281-293``; ``greedy_coloring.py:23-30,265``),
(b) gives every node a unique label (``:268``), then (c) sweeps color class
by color class, setting each node's label to the most frequent label among
its neighbors with the **Prec-Max** tie-break — keep the current label if it
is in the argmax set, else take the max label (``_update_label``
``:325-337``) — until every node's label is in its neighborhood's
max-frequency set (``_labeling_complete`` ``:296-306``).

Nodes of one color are pairwise non-adjacent, so all updates within a color
are order-independent — which is exactly what makes the algorithm
expressible as synchronous DataFrame supersteps: one join + groupBy + window
per color class.  Directed graphs are rejected (``:243``).

**Coloring.**  The reference's greedy coloring is sequential (insertion
order); any *proper* coloring preserves the algorithm's guarantees, so we
use a deterministic distributed greedy coloring: vertices acquire colors in
rounds; a vertex colors itself once no uncolored neighbor has higher
priority ``(degree desc, xxhash64(id))``, taking the minimum color absent
from its already-colored neighborhood (computed JVM-side with array
functions).  Hash priorities make the expected number of rounds
O(log n) regardless of id layout.

**Labels** are the vertex ids themselves (unique, orderable, stable under
resume) instead of the reference's enumeration index — communities compare
exactly up to relabeling, and ``max(label)`` stays a deterministic rule.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def greedy_color(g: Graph, max_rounds: int = 500) -> DataFrame:
    """(id, color) — proper coloring (no edge joins two same-colored
    vertices).  Distributed analogue of ``nx.coloring.greedy_color``
    (``greedy_coloring.py:265``, strategy ``largest_first`` ``:23-30``).

    Per-round state is cut with a parquet round-trip (see superstep.py for
    why ``localCheckpoint`` chains are off-limits)."""
    runner = SuperstepRunner(None, name="coloring")
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))).cache()
    try:
      with fixed_plan(g.edges.sparkSession):
        deg = adj.groupBy(ID).agg(F.count("*").alias("deg"))
        prio = (g.vertices().join(deg, ID, "left")
                .select(ID, F.coalesce("deg", F.lit(0)).alias("deg"),
                        F.xxhash64(ID).alias("h")))
        # isolated vertices: color 0 immediately
        state = prio.select(
            ID, "deg", "h",
            F.when(F.col("deg") == 0, F.lit(0)).otherwise(F.lit(None).cast("int"))
             .alias("color"))
        state = runner.cut(state)
        for _ in range(max_rounds):
            remaining = state.filter(F.col("color").isNull()).count()
            if remaining == 0:
                break
            unc = state.filter(F.col("color").isNull())
            # a vertex wins the round if no uncolored neighbor outranks it
            nbr_prio = (unc.select(ID, "deg", "h")
                        .join(adj.select(F.col("nbr").alias(ID), F.col(ID).alias("v")), ID)
                        .select(F.col("v").alias(ID), F.col("deg").alias("ndeg"),
                                F.col("h").alias("nh")))
            blocked = (unc.join(nbr_prio, ID)
                       .filter((F.col("ndeg") > F.col("deg")) |
                               ((F.col("ndeg") == F.col("deg")) & (F.col("nh") < F.col("h"))))
                       .select(ID).distinct())
            winners = unc.join(blocked, ID, "anti")
            # min color not used by colored neighbors (mex), via array functions
            nbr_colors = (winners.select(ID)
                          .join(adj, ID)
                          .join(state.filter(F.col("color").isNotNull())
                                .select(F.col(ID).alias("nbr"), F.col("color").alias("nc")), "nbr")
                          .groupBy(ID).agg(F.array_sort(F.collect_set("nc")).alias("used")))
            colored = (winners.join(nbr_colors, ID, "left")
                       .withColumn("used", F.coalesce("used", F.array()))
                       .withColumn("color", F.expr(
                           "filter(sequence(0, size(used)), x -> NOT array_contains(used, x))[0]"))
                       .select(ID, "deg", "h", "color"))
            state = runner.cut(
                state.join(colored.select(ID, F.col("color").alias("_nc")), ID, "left")
                .select(ID, "deg", "h", F.coalesce("_nc", "color").alias("color")))
        return state.select(ID, "color")
    finally:
        adj.unpersist()
        runner.close()


def label_propagation_communities(
    g: Graph,
    max_sweeps: int = 100,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """(id, label) — label = a member vertex id of the community.

    Matches the reference's semi-synchronous variant up to the (valid)
    choice of proper coloring; fixture outcomes with a unique answer are
    identical, ambiguous fixtures land on one of the reference-accepted
    answers (``test_label_propagation.py:88-104``).
    """
    if g.directed:
        raise ValueError("label_propagation_communities is not implemented for "
                         "directed graphs (reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    runner = SuperstepRunner(checkpoint_dir, name="lpa_state", interval=checkpoint_interval)
    # adjacency both directions from the canonical (one-row-per-edge) table;
    # a self-loop contributes the node's own label once (reference: Counter
    # over G[node], label_propagation.py:320)
    e = g.edges
    adj = (e.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
           .union(e.filter(F.col(SRC) != F.col(DST))
                  .select(F.col(DST).alias(ID), F.col(SRC).alias("nbr")))
           ).cache()

    colors = greedy_color(g).cache()
    color_list = [r["color"] for r in
                  colors.select("color").distinct().orderBy("color").collect()]
    labels = runner.cut(g.vertices().select(ID, F.col(ID).alias("label")))
    step = 0
    try:
      with fixed_plan(spark):
        for sweep in range(max_sweeps):
            for c in color_list:
                members = colors.filter(F.col("color") == c).select(ID)
                # neighbor label frequencies for this color class only
                freq = (adj.join(members, ID, "semi")
                        .join(labels.select(F.col(ID).alias("nbr"),
                                            F.col("label").alias("nlabel")), "nbr")
                        .groupBy(ID, "nlabel").agg(F.count("*").alias("cnt")))
                w = Window.partitionBy(ID)
                ties = (freq.withColumn("mx", F.max("cnt").over(w))
                        .filter(F.col("cnt") == F.col("mx")))
                cur = labels.withColumnRenamed("label", "cur")
                upd = (ties.join(cur, ID)
                       .groupBy(ID, "cur")
                       .agg(F.max("nlabel").alias("top"),
                            F.max(F.when(F.col("nlabel") == F.col("cur"), 1).otherwise(0))
                             .alias("has_cur"))
                       .select(ID, F.when(F.col("has_cur") == 1, F.col("cur"))
                               .otherwise(F.col("top")).alias("new_label")))
                labels = (labels.join(upd, ID, "left")
                          .select(ID, F.coalesce("new_label", "label").alias("label")))
                labels = runner.checkpoint(labels, step,
                                           extra={"algorithm": "lpa", "sweep": sweep,
                                                  "color": int(c)})
                step += 1
            # completeness: every node with neighbors has label in argmax set
            freq = (adj.join(labels.select(F.col(ID).alias("nbr"),
                                           F.col("label").alias("nlabel")), "nbr")
                    .groupBy(ID, "nlabel").agg(F.count("*").alias("cnt")))
            w = Window.partitionBy(ID)
            ties = (freq.withColumn("mx", F.max("cnt").over(w))
                    .filter(F.col("cnt") == F.col("mx")))
            incomplete = (labels.join(ties.withColumnRenamed("nlabel", "label"),
                                      [ID, "label"], "anti")
                          .join(adj.select(ID).distinct(), ID, "semi")
                          .count())
            runner.update_last(residual=float(incomplete))
            if incomplete == 0:
                return labels
        raise RuntimeError(f"LPA did not stabilize within {max_sweeps} sweeps")
    finally:
        adj.unpersist()
        colors.unpersist()
        runner.close()

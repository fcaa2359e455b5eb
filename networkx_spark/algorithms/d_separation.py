"""d-separation on DAGs (Bayes-ball reachability).

Reference: ``networkx/algorithms/d_separation.py:233``
(``is_d_separator``): x ⟂ y | z iff the Bayes-ball walk from x cannot
reach y — a two-mode reachability where "backward" visits expand to
predecessors and successors unless the node is in z, and "forward"
visits expand to successors unless in z, plus to predecessors when the
node is in ``ancestors(x) ∪ x ∪ z`` (the opened-collider rule).

Spark shape: the deque walk is order-independent set closure, so it
distributes as a two-channel frontier BFS — state (id, mode) with one
frontier join per superstep, y-hits observed on the cut (early exit),
the ancestor set from one reverse-reachability BFS.  O(V) state, the
same envelope as connected components.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _as_set_df(spark, s: Iterable | DataFrame, name: str) -> DataFrame:
    if isinstance(s, DataFrame):
        return s.select(F.col(s.columns[0]).cast("string").alias(ID)).distinct()
    if isinstance(s, (str, int)):
        s = [s]
    return spark.createDataFrame([(str(v),) for v in s],
                                 "id string").distinct()


def _reach(adj: DataFrame, frontier: DataFrame, runner, max_iter: int):
    """Plain reachability closure over ``adj(id, nbr)`` from frontier."""
    visited = runner.cut(frontier)
    cur = visited
    for _ in range(max_iter):
        nxt = runner.cut(cur.join(adj, ID)
                         .select(F.col("nbr").alias(ID)).distinct()
                         .join(visited, ID, "anti"))
        if nxt.limit(1).count() == 0:
            break
        visited = runner.cut(visited.unionByName(nxt))
        cur = nxt
    return visited


def is_d_separator(g: Graph, x, y, z, max_iter: int = 10_000) -> bool:
    """True iff z d-separates x from y (``d_separation.py:233``)."""
    if not g.directed:
        raise ValueError("d-separation requires a directed acyclic graph "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    xs = _as_set_df(spark, x, "x").cache()
    ys = _as_set_df(spark, y, "y").cache()
    zs = _as_set_df(spark, z, "z").cache()
    for a, b in ((xs, ys), (xs, zs), (ys, zs)):
        if a.join(b, ID, "semi").limit(1).count():
            raise ValueError("The sets are not disjoint "
                             "(reference NetworkXError)")
    verts = g.vertices().select(F.col(ID).cast("string").alias(ID))
    missing = (xs.unionByName(ys).unionByName(zs)
               .join(verts, ID, "anti").limit(1).count())
    if missing:
        raise KeyError("node not found in G (reference NodeNotFound)")
    # DAG check via the generation peel (raises on cycles)
    from networkx_spark.algorithms.dag import topological_generations
    topological_generations(g).limit(1).count()

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    succ = (g.edges.select(F.col(SRC).cast("string").alias(ID),
                           F.col(DST).cast("string").alias("nbr"))
            .distinct().repartition(n_part, ID).cache())
    pred = (g.edges.select(F.col(DST).cast("string").alias(ID),
                           F.col(SRC).cast("string").alias("nbr"))
            .distinct().repartition(n_part, ID).cache())

    # keep_scratch=0 (no rotation): the ancestor set and both visited
    # channels stay referenced across many later cuts
    runner = SuperstepRunner(None, name="dsep", keep_scratch=0)
    try:
      with fixed_plan(spark):
        anc_or_z = (_reach(pred, xs, runner, max_iter)
                    .unionByName(zs).unionByName(xs).distinct())
        anc_or_z = runner.cut(anc_or_z)

        # state: (id, mode) with mode 'b' (backward visit) / 'f' (forward)
        state = runner.cut(xs.select(ID, F.lit("b").alias("mode")))
        frontier = state
        for _ in range(max_iter):
            if frontier.join(ys, ID, "semi").limit(1).count():
                return False
            b = frontier.filter(F.col("mode") == "b")
            f = frontier.filter(F.col("mode") == "f")
            # backward expansion: skip z entirely; else preds→b, succs→f
            b_open = b.join(zs, ID, "anti").select(ID)
            new_b = (b_open.join(pred, ID)
                     .select(F.col("nbr").alias(ID),
                             F.lit("b").alias("mode")))
            new_f = (b_open.join(succ, ID)
                     .select(F.col("nbr").alias(ID),
                             F.lit("f").alias("mode")))
            # forward expansion: collider opens to preds when in anc_or_z;
            # succs unless in z
            f_coll = f.join(anc_or_z, ID, "semi").select(ID)
            new_b2 = (f_coll.join(pred, ID)
                      .select(F.col("nbr").alias(ID),
                              F.lit("b").alias("mode")))
            f_open = f.join(zs, ID, "anti").select(ID)
            new_f2 = (f_open.join(succ, ID)
                      .select(F.col("nbr").alias(ID),
                              F.lit("f").alias("mode")))
            nxt = runner.cut(
                new_b.unionByName(new_f).unionByName(new_b2)
                .unionByName(new_f2).distinct()
                .join(state, [ID, "mode"], "anti"))
            if nxt.limit(1).count() == 0:
                return True
            state = runner.cut(state.unionByName(nxt))
            frontier = nxt
        return True
    finally:
        for df in (xs, ys, zs, succ, pred):
            df.unpersist()
        runner.close()


def d_separated(g: Graph, x, y, z, **kw) -> bool:
    """Deprecated alias kept for surface parity
    (``d_separation.py:683``)."""
    return is_d_separator(g, x, y, z, **kw)

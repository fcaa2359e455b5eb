"""Cycle basis and cycle detection for undirected graphs.

Reference: ``networkx/algorithms/cycles.py:28`` (``cycle_basis``: the
fundamental cycles of a spanning forest — one cycle per non-tree edge,
closing through the tree path between its endpoints) and ``:119``
(``find_cycle``).  The reference DFS-walks one tree; any spanning forest
yields a valid basis (same GF(2) cycle space), so the engine reuses the
min-id-rooted BFS forest of :mod:`networkx_spark.algorithms.bridges` and
computes EVERY fundamental cycle simultaneously:

each non-tree edge {u, v} owns two cursors starting at u and v that walk
parent pointers toward the root; each superstep lifts the deeper cursor
(ties lift u) one level via ONE join against the forest table, appending
to that side's path array.  Cursors meet exactly at the LCA — both path
arrays end with it — so the cycle is ``u_path + reverse(v_path[:-1])``.
Supersteps = the longest tree path among all cycles (≤ 2·BFS depth —
~10-20 on web graphs); every superstep advances ALL unfinished cycles at
once.

Scale note: materializing a basis is inherently O(Σ cycle length) output;
the per-superstep state is one row per UNFINISHED non-tree edge with two
bounded arrays — rows leave the loop as soon as their cursors meet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def cycle_basis(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(cycle_id, pos, node): one fundamental cycle per non-tree edge of
    the BFS spanning forest, vertices in cycle order (u → … → lca → … → v;
    the closing edge v-u is implicit).  ``cycle_id`` names the non-tree
    edge as ``"u:v"``.  The basis spans the same GF(2) cycle space as the
    reference's (pytest verifies rank and span equality)."""
    from networkx_spark.algorithms.bridges import bfs_forest, _canonical_edges
    if g.directed:
        raise ValueError("cycle_basis is defined for undirected graphs "
                         "(reference raises for DiGraph input)")
    spark = g.edges.sparkSession
    forest = bfs_forest(g, max_iter=max_iter)
    edges = _canonical_edges(g)
    tree = (forest.filter(F.col("parent").isNotNull())
            .select(F.least(ID, "parent").alias("u"),
                    F.greatest(ID, "parent").alias("v")))
    nontree = edges.join(tree, ["u", "v"], "anti")
    fmap = forest.select(ID, "parent", "depth").cache()

    du = fmap.select(F.col(ID).alias("u"), F.col("depth").alias("du"))
    dv = fmap.select(F.col(ID).alias("v"), F.col("depth").alias("dv"))
    state = (nontree.join(du, "u").join(dv, "v")
             .select(F.concat_ws(":", F.col("u").cast("string"),
                                 F.col("v").cast("string")).alias("cid"),
                     F.array(F.col("u")).alias("pu"),
                     F.array(F.col("v")).alias("pv"),
                     F.col("u").alias("cu"), F.col("du").alias("dcu"),
                     F.col("v").alias("cv"), F.col("dv").alias("dcv")))
    runner = SuperstepRunner(None, name="cycle_basis")
    done = None
    try:
      with fixed_plan(spark):
        state = runner.cut(state)
        for _ in range(max_iter):
            fin = state.filter(F.col("cu") == F.col("cv"))
            done = fin if done is None else done.unionByName(fin)
            done = runner.cut(done)
            state = state.filter(F.col("cu") != F.col("cv"))
            if state.isEmpty():
                break
            lift_u = F.col("dcu") >= F.col("dcv")
            cursor = F.when(lift_u, F.col("cu")).otherwise(F.col("cv"))
            step = (state.withColumn("_c", cursor)
                    .join(fmap.select(F.col(ID).alias("_c"),
                                      F.col("parent").alias("_p"),
                                      (F.col("depth") - 1).alias("_d")), "_c"))
            state = runner.cut(step.select(
                "cid",
                F.when(lift_u, F.concat("pu", F.array("_p")))
                 .otherwise(F.col("pu")).alias("pu"),
                F.when(lift_u, F.col("_p")).otherwise(F.col("cu")).alias("cu"),
                F.when(lift_u, F.col("_d")).otherwise(F.col("dcu")).alias("dcu"),
                F.when(~lift_u, F.concat("pv", F.array("_p")))
                 .otherwise(F.col("pv")).alias("pv"),
                F.when(~lift_u, F.col("_p")).otherwise(F.col("cv")).alias("cv"),
                F.when(~lift_u, F.col("_d")).otherwise(F.col("dcv")).alias("dcv")))
        else:
            raise RuntimeError("cycle_basis did not converge")
        # cycle = u-path (ends at lca) + reversed v-path without its lca
        cyc = done.select(
            "cid",
            F.concat(F.col("pu"),
                     F.reverse(F.slice(F.col("pv"), 1,
                                       F.greatest(F.size("pv") - 1, F.lit(0))))
                     ).alias("cyc"))
        return cyc.select("cid", F.posexplode("cyc").alias("pos", "node")) \
                  .withColumnRenamed("cid", "cycle_id")
    finally:
        fmap.unpersist()
        runner.close()


def has_cycle(g: Graph) -> bool:
    """Undirected cycle existence: any non-tree edge exists ⇔ m > n − c;
    directed graphs route to the DAG check."""
    if g.directed:
        from networkx_spark.algorithms.dag import is_directed_acyclic_graph
        return not is_directed_acyclic_graph(g)
    from networkx_spark.algorithms.components import number_connected_components
    m = (g.symmetrized()
         .select(F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct().count())
    n = g.number_of_vertices()
    return m > n - number_connected_components(g)


def all_simple_paths(g: Graph, source, target, cutoff: int) -> DataFrame:
    """(path array<id>) — every simple path from ``source`` to ``target``
    of at most ``cutoff`` edges; reference
    ``networkx/algorithms/simple_paths.py:68`` (``all_simple_paths``),
    which DFS-generates lazily.  The distributed form expands ALL partial
    paths one hop per superstep (frontier join + ``array_contains``
    simplicity filter), so wall time is ``cutoff`` joins regardless of how
    many paths exist; the result-set size is the caller's responsibility —
    ``cutoff`` is required here precisely because the unbounded count is
    exponential (the reference's default cutoff n−1 is the anti-scale
    path)."""
    if cutoff < 1:
        raise ValueError("cutoff must be >= 1")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = g.edges.select(SRC, DST) if g.directed else g.symmetrized().select(SRC, DST)
    adj = (e.filter(F.col(SRC) != F.col(DST)).distinct()
           .withColumnRenamed(SRC, "_cur").repartition(n_part, "_cur").cache())
    id_t = g.edges.schema[SRC].dataType
    try:
        frontier = spark.createDataFrame([(source,)], f"x {id_t.simpleString()}") \
            .select(F.array("x").alias("path"), F.col("x").alias("_cur"))
        done = frontier.filter(F.lit(False)).select("path")
        for _ in range(cutoff):
            step = (frontier.join(adj, "_cur")
                    .filter(~F.array_contains("path", F.col(DST)))
                    .select(F.concat("path", F.array(DST)).alias("path"),
                            F.col(DST).alias("_cur")))
            step = step.localCheckpoint(eager=True)
            done = done.unionByName(
                step.filter(F.col("_cur") == F.lit(target)).select("path"))
            frontier = step.filter(F.col("_cur") != F.lit(target))
            if frontier.isEmpty():
                break
        return done
    finally:
        adj.unpersist()

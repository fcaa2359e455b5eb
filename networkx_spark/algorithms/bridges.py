"""Bridges and 2-edge-connected components — BFS forest + XOR covering.

Reference: ``networkx/algorithms/bridges.py:9`` (``bridges``: an edge is a
bridge iff removing it raises the number of connected components) and
``networkx/algorithms/connectivity/edge_kcomponents.py`` (2-edge-connected
components = components after removing all bridges).  The reference walks a
chain decomposition (sequential DFS); DFS does not distribute, so the
engine uses the classic spanning-forest + cycle-covering characterization
instead:

1. Build a rooted spanning forest.  A tree edge (v, parent(v)) is a bridge
   iff NO non-tree edge connects subtree(v) with the rest of the graph;
   non-tree edges are never bridges (they close a cycle by construction).
2. Give every non-tree edge {u, w} a pseudo-random 64-bit value and XOR it
   into both endpoints.  For any vertex v, the XOR over subtree(v) then
   equals the XOR over exactly the non-tree edges with ONE endpoint inside
   the subtree (edges with both endpoints inside cancel) — zero iff the
   subtree is uncovered, i.e. iff the tree edge above v is a bridge.
   This is the standard Monte-Carlo XOR-covering trick (one-sided error:
   k >= 1 covering edges XOR to zero with probability 2^-64; two
   independent hash channels push that to 2^-128 — at 10^12 edges the
   expected number of misclassified edges is < 10^-24).

Everything is superstep DataFrame joins:

- the forest comes from ONE hash-min loop that carries (component, parent,
  depth) together: adopting a smaller component label from neighbor u sets
  parent = u, depth = depth(u) + 1, so at the fixpoint parent pointers form
  a BFS tree rooted at each component's minimum-id vertex (unit-weight
  Bellman-Ford with min-id source election) — no separate CC pass;
- the subtree XOR folds bottom-up by depth level: one groupBy(parent) per
  level, O(BFS depth) supersteps — web graphs have ~10-hop BFS depth.

Scale posture: state is one (id, comp, parent, depth) table; every
superstep shuffles only the state on the vertex id, the adjacency is
cached pre-partitioned, and lineage is cut per superstep
(SuperstepRunner).  No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def bfs_forest(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, comp, parent, depth): a BFS spanning forest, one tree per
    connected component, rooted at the component's minimum vertex id
    (parent is NULL for roots).  Hash-min connected components with the
    parent/depth of the winning offer carried along — converges in
    O(diameter) supersteps to comp = min id and depth = BFS distance from
    the root."""
    if g.directed:
        raise ValueError("bfs_forest is defined for undirected graphs")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized().select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
           .filter(F.col(ID) != F.col("nbr"))
           .repartition(n_part, ID).cache())
    runner = SuperstepRunner(None, name="bfs_forest")
    try:
      with fixed_plan(spark):
        state = runner.cut(g.vertices().select(
            ID, F.col(ID).alias("comp"),
            F.lit(None).cast(g.vertices().schema[ID].dataType).alias("parent"),
            F.lit(0).cast("int").alias("depth")))
        for _ in range(max_iter):
            # best offer to each vertex: lexicographic min over
            # (neighbor's comp, neighbor's depth + 1, neighbor id) — the
            # smallest component label wins; among its senders, the
            # shallowest then smallest-id neighbor becomes the parent
            offers = (state.join(adj, ID)
                      .groupBy(F.col("nbr").alias(ID))
                      .agg(F.min(F.struct(
                          F.col("comp").alias("c"),
                          (F.col("depth") + 1).alias("d"),
                          F.col(ID).alias("p"))).alias("o")))
            better = (F.col("o.c") < F.col("comp")) | (
                (F.col("o.c") == F.col("comp"))
                & (F.col("o.d") < F.col("depth")))
            new = (state.join(offers, ID, "left")
                   .select(ID,
                           F.when(better, F.col("o.c")).otherwise(F.col("comp")).alias("comp"),
                           F.when(better, F.col("o.p")).otherwise(F.col("parent")).alias("parent"),
                           F.when(better, F.col("o.d")).otherwise(F.col("depth")).alias("depth"),
                           F.coalesce(better.cast("long"), F.lit(0)).alias("_chg")))
            obs = Observation()
            new = runner.cut(new.observe(obs, F.sum("_chg").alias("chg"))
                             .drop("_chg"))
            state = new
            if int(obs.get["chg"] or 0) == 0:
                return state
        raise RuntimeError(f"bfs_forest did not converge in {max_iter} supersteps")
    finally:
        adj.unpersist()
        runner.close()


def _canonical_edges(g: Graph) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v, self-loops dropped
    (a self-loop is never a bridge and XOR-cancels anyway)."""
    return (g.symmetrized()
            .select(F.least(SRC, DST).alias("u"), F.greatest(SRC, DST).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def bridge_labels(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(u, v, is_bridge) for every distinct undirected edge (u < v,
    self-loops excluded): the full per-edge bridge classification."""
    spark = g.edges.sparkSession
    forest = bfs_forest(g, max_iter=max_iter)
    edges = _canonical_edges(g)

    tree = (forest.filter(F.col("parent").isNotNull())
            .select(F.least(ID, "parent").alias("u"),
                    F.greatest(ID, "parent").alias("v"),
                    F.col(ID).alias("child")))
    nontree = edges.join(tree.select("u", "v"), ["u", "v"], "anti")
    # two independent 64-bit channels: misclassification needs a
    # simultaneous collision in both
    r = nontree.select(
        "u", "v",
        F.xxhash64(F.concat_ws(":", F.col("u").cast("string"),
                               F.col("v").cast("string")), F.lit("xc1")).alias("r1"),
        F.xxhash64(F.concat_ws(":", F.col("u").cast("string"),
                               F.col("v").cast("string")), F.lit("xc2")).alias("r2"))
    ends = (r.select(F.col("u").alias(ID), "r1", "r2")
            .unionByName(r.select(F.col("v").alias(ID), "r1", "r2")))
    acc = (ends.groupBy(ID)
           .agg(F.expr("bit_xor(r1)").alias("x1"), F.expr("bit_xor(r2)").alias("x2")))

    runner = SuperstepRunner(None, name="bridges")
    try:
      with fixed_plan(spark):
        state = runner.cut(
            forest.join(acc, ID, "left")
            .select(ID, "parent", "depth",
                    F.coalesce("x1", F.lit(0)).alias("x1"),
                    F.coalesce("x2", F.lit(0)).alias("x2")))
        max_depth = state.agg(F.max("depth")).first()[0] or 0
        # bottom-up fold: depth-d subtree values XOR into their parents —
        # after processing level d, every vertex at depth d-1 holds the
        # XOR over its full subtree
        for d in range(max_depth, 0, -1):
            up = (state.filter(F.col("depth") == d)
                  .groupBy(F.col("parent").alias(ID))
                  .agg(F.expr("bit_xor(x1)").alias("c1"),
                       F.expr("bit_xor(x2)").alias("c2")))
            state = runner.cut(
                state.join(up, ID, "left")
                .select(ID, "parent", "depth",
                        F.when(F.col("c1").isNotNull(),
                               F.expr("x1 ^ c1")).otherwise(F.col("x1")).alias("x1"),
                        F.when(F.col("c2").isNotNull(),
                               F.expr("x2 ^ c2")).otherwise(F.col("x2")).alias("x2")))
        tree_flag = (tree.join(
            state.select(F.col(ID).alias("child"), "x1", "x2"), "child")
            .select("u", "v", ((F.col("x1") == 0) & (F.col("x2") == 0)).alias("is_bridge")))
        return (edges.join(tree_flag, ["u", "v"], "left")
                .select("u", "v", F.coalesce("is_bridge", F.lit(False)).alias("is_bridge")))
    finally:
        runner.close()


def bridges(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(u, v) bridges only — ``nx.bridges`` (``bridges.py:9``)."""
    return (bridge_labels(g, max_iter=max_iter)
            .filter("is_bridge").select("u", "v"))


def has_bridges(g: Graph, max_iter: int = 10_000) -> bool:
    """``nx.has_bridges`` (``bridges.py:83``)."""
    return bool(bridge_labels(g, max_iter=max_iter).filter("is_bridge").head(1))


def two_edge_connected_components(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, comp): 2-edge-connected components = connected components after
    deleting every bridge (``connectivity/edge_kcomponents.py``,
    ``bridge_components``); comp = min member id.  Vertices all of whose
    edges are bridges become singletons."""
    from networkx_spark.algorithms.components import connected_components
    keep = bridge_labels(g, max_iter=max_iter).filter(~F.col("is_bridge"))
    verts = g.vertices()
    sub = Graph.from_edges(
        keep.select(F.col("u").alias(SRC), F.col("v").alias(DST)),
        directed=False)
    labels = connected_components(sub) if not sub.edges.isEmpty() else None
    base = verts.select(ID, F.col(ID).alias("comp"))
    if labels is None:
        return base
    return (verts.join(labels.withColumnRenamed("component", "comp"), ID, "left")
            .select(ID, F.coalesce("comp", F.col(ID)).alias("comp")))

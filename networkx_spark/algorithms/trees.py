"""Tree/forest recognition and DAG longest paths.

Reference: ``networkx/algorithms/tree/recognition.py:219`` (``is_tree``),
``:162`` (``is_forest``), ``:83`` (``is_arborescence``), ``:123``
(``is_branching``), and ``networkx/algorithms/dag.py:959``
(``dag_longest_path``) / ``:1055`` (``dag_longest_path_length``).

Recognition needs only counts + existing primitives: an undirected graph
is a forest iff m = n − #components (equivalently: acyclic), a tree adds
#components = 1; a branching is a directed forest (of the underlying
undirected graph) with max in-degree ≤ 1, an arborescence is a branching
that is a tree.  Each check is one or two aggregations over tables the
engine already derives — no traversal.

``dag_longest_path`` is dynamic programming over topological generations:
process generations in order, relaxing ``dist(v) = max(dist(u) + w(u,v))``
— one join + max-agg per generation (the SSSP relax join with max), with
the argmax predecessor carried for path reconstruction.  Supersteps =
longest-path length, the same dependency depth the reference's sequential
DP pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID, WEIGHT
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def is_forest(g: Graph) -> bool:
    """``recognition.py:162``; empty graphs raise like the reference
    (``NetworkXPointlessConcept``)."""
    from networkx_spark.algorithms.components import number_connected_components
    und = g.to_undirected() if g.directed else g
    n = und.number_of_vertices()
    if n == 0:
        raise ValueError("graph has no nodes (reference "
                         "NetworkXPointlessConcept)")
    m = und.edges.select(
        F.least(SRC, DST), F.greatest(SRC, DST)).distinct().count()
    if m >= n:          # a forest always has m = n - c < n: skip the CC run
        return False
    return m == n - number_connected_components(und)


def is_tree(g: Graph) -> bool:
    """``recognition.py:219``: connected forest (n − 1 edges, one
    component)."""
    from networkx_spark.algorithms.components import number_connected_components
    und = g.to_undirected() if g.directed else g
    n = und.number_of_vertices()
    if n == 0:
        raise ValueError("graph has no nodes (reference "
                         "NetworkXPointlessConcept)")
    m = und.edges.select(
        F.least(SRC, DST), F.greatest(SRC, DST)).distinct().count()
    return m == n - 1 and number_connected_components(und) == 1


def is_branching(g: Graph) -> bool:
    """``recognition.py:123``: directed forest with in-degree ≤ 1."""
    if not g.directed:
        raise ValueError("is_branching is defined for directed graphs")
    max_in = (g.edges.groupBy(DST).agg(F.count("*").alias("c"))
              .agg(F.max("c")).first()[0] or 0)
    return max_in <= 1 and is_forest(g)


def is_arborescence(g: Graph) -> bool:
    """``recognition.py:83``: branching that is a tree (one root)."""
    if not g.directed:
        raise ValueError("is_arborescence is defined for directed graphs")
    max_in = (g.edges.groupBy(DST).agg(F.count("*").alias("c"))
              .agg(F.max("c")).first()[0] or 0)
    return max_in <= 1 and is_tree(g)


def dag_longest_path_dists(g: Graph, weighted: bool = False,
                           max_rounds: int = 100_000) -> DataFrame:
    """(id, dist, pred): longest-path distance from any source to ``id``
    and the argmax predecessor (NULL at sources).  Raises on cycles via
    the generation peel (``dag.py:959``; reference default_weight=1 is the
    unweighted case — set ``weighted`` to use the edge weight column)."""
    from networkx_spark.algorithms.dag import topological_generations
    if not g.directed:
        raise ValueError("dag_longest_path is defined for directed graphs")
    spark = g.edges.sparkSession
    gens = topological_generations(g, max_rounds=max_rounds)
    w = (F.col(WEIGHT).cast("double") if weighted
         else F.lit(1.0)).alias("w")
    edges = g.edges.select(SRC, DST, w)
    runner = SuperstepRunner(None, name="dag_lp")
    try:
      with fixed_plan(spark):
        # loop invariants are CACHED, not cut: the runner rotates scratch
        # snapshots, so a cut table referenced on every superstep would
        # be deleted out from under the loop
        gens = gens.cache()
        edges = edges.cache()
        n_gen = gens.agg(F.max("generation")).first()[0]
        id_t = g.edges.schema[SRC].dataType
        state = runner.cut(
            gens.filter(F.col("generation") == 0)
            .select(ID, F.lit(0.0).alias("dist"),
                    F.lit(None).cast(id_t).alias("pred")))
        for gen in range(1, int(n_gen or 0) + 1):
            # relax into this generation only: every predecessor of a
            # generation-g vertex lives in an earlier generation, so one
            # max-agg per generation completes its DP value
            tgt = gens.filter(F.col("generation") == gen)
            relax = (state.join(edges.withColumnRenamed(SRC, ID), ID)
                     .join(tgt.select(F.col(ID).alias(DST)), DST)
                     .groupBy(DST)
                     .agg(F.max(F.struct((F.col("dist") + F.col("w")).alias("d"),
                                         F.col(ID).alias("p"))).alias("best")))
            nxt = relax.select(F.col(DST).alias(ID),
                               F.col("best.d").alias("dist"),
                               F.col("best.p").alias("pred"))
            state = runner.cut(state.unionByName(nxt))
        return state
    finally:
        gens.unpersist()
        edges.unpersist()
        runner.close()


def dag_longest_path_length(g: Graph, weighted: bool = False) -> float:
    """``dag.py:1055``: the maximum DP distance (edge count when
    unweighted)."""
    d = dag_longest_path_dists(g, weighted=weighted)
    return float(d.agg(F.max("dist")).first()[0] or 0.0)


def is_graphical(degrees: DataFrame, col: str | None = None) -> bool:
    """Erdős–Gallai test: is the degree sequence realizable as a simple
    undirected graph — ``nx.is_graphical`` (``graphical.py:22``, the
    ``eg`` method).  Input is a one-column DataFrame (or ``col`` names
    it).  Distributed form: sort descending with a dense rank, prefix
    sums via a running-total window, and the n−1 Erdős–Gallai
    inequalities checked as one aggregation — no driver-side sequence.

    The rank/prefix windows are global-ordered; a degree SEQUENCE check
    is inherently a total order over one numeric column, the cheapest
    possible global sort (single bigint column, Tungsten radix sort).
    Only the k ≤ Durfee-number inequalities (d_k ≥ k, at most √(2m) of
    them) are checked — the rest are implied — so the tail join is
    O(√(2m)·n), not O(n²).
    """
    from pyspark.sql import Window
    c = col or degrees.columns[0]
    d = degrees.select(F.col(c).cast("long").alias("d"))
    stats = d.agg(F.sum("d").alias("s"), F.count("*").alias("n"),
                  F.min("d").alias("mn")).first()
    if (stats["s"] or 0) % 2 == 1:
        return False
    if stats["n"] == 0:
        return True
    if (stats["mn"] or 0) < 0:
        return False
    w = Window.orderBy(F.desc("d"))
    ranked = (d.withColumn("k", F.row_number().over(w))
              .withColumn("pre", F.sum("d").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    n = int(stats["n"])
    # Σ_{i<=k} d_i <= k(k-1) + Σ_{i>k} min(d_i, k) for every k
    dk = (ranked.select(F.col("k").alias("_k"), F.col("d").alias("_dk"),
                        F.col("pre").alias("_pre"))
          # Durfee cut: inequalities with d_k < k are implied by k' < k
          .filter(F.col("_dk") >= F.col("_k")))
    tail = (dk.alias("a").join(ranked.alias("b"),
                               F.col("b.k") > F.col("a._k"))
            .groupBy("a._k", "a._pre")
            .agg(F.sum(F.least(F.col("b.d"), F.col("a._k"))).alias("_t")))
    viol = (tail.filter(F.col("_pre") >
                        F.col("_k") * (F.col("_k") - 1) + F.col("_t"))
            .head(1))
    if viol:
        return False
    # k = n (empty tail) inequality: sum <= n(n-1)
    return (stats["s"] or 0) <= n * (n - 1)

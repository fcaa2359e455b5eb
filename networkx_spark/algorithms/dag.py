"""DAG utilities — topological generations / sort / acyclicity by peeling.

Reference: ``networkx/algorithms/dag.py:164`` (``topological_sort``, a
Kahn in-degree queue), ``:242`` (``topological_generations``: vertices
whose in-degree reaches zero in the same wave share a generation) and
``:40`` (``is_directed_acyclic_graph``: the sort raising
``NetworkXUnfeasible`` ⇔ a cycle exists).  ``ancestors``/``descendants``
(``dag.py:56,96``) are plain reachability.

The distributed form IS Kahn's algorithm: each superstep computes the
in-degrees of the surviving subgraph, peels the zero-in-degree wave as
one generation, and drops their out-edges.  Rounds = longest-path length;
each round is one Spark job (agg + anti-join + lineage cut with the
surviving-edge count observed on the write).  A non-empty fixpoint with
no zero-in-degree vertex is exactly a cycle.

Scale posture: every round touches only the surviving edges (shrinking
monotonically); state is the accumulated (id, generation) table.  The
O(longest-path) round count is inherent to topological sorting — the
reference's sequential queue pays the same dependency depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


class HasACycle(ValueError):
    """The graph contains a cycle (reference ``NetworkXUnfeasible``,
    raised by ``topological_sort``, ``dag.py:211-214``)."""


def topological_generations(g: Graph, max_rounds: int = 100_000) -> DataFrame:
    """(id, generation): generation g = vertices whose in-degree hits zero
    after the first g waves are removed (``dag.py:242-299``).  Raises
    :class:`HasACycle` when vertices remain with no zero-in-degree wave
    (the reference raises ``NetworkXUnfeasible`` on iteration,
    ``dag.py:296-298``)."""
    if not g.directed:
        # reference: topological ops are undefined for undirected graphs
        raise ValueError("Topological sort is defined for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    runner = SuperstepRunner(None, name="topo", keep_scratch=0)
    try:
      with fixed_plan(spark):
        out = spark.createDataFrame(
            [], g.vertices().schema.add("generation", "long"))
        verts = runner.cut(g.vertices())
        e = runner.cut(g.edges.select(SRC, DST))
        n_left = verts.count()
        gen = 0
        while n_left > 0 and gen <= max_rounds:
            indeg = e.groupBy(DST).agg(F.count("*").alias("_in"))
            wave = (verts.join(indeg.withColumnRenamed(DST, ID), ID, "anti")
                    .select(ID, F.lit(gen).cast("long").alias("generation")))
            obs_w = Observation()
            wave = runner.cut(wave.observe(obs_w, F.count(F.lit(1)).alias("n")))
            peeled = int(obs_w.get["n"] or 0)
            if peeled == 0:
                raise HasACycle(
                    "Graph contains a cycle or graph changed during iteration")
            out = out.unionByName(wave)
            if peeled == n_left:
                break
            obs_v = Observation()
            verts = runner.cut(
                verts.join(wave.select(ID), ID, "anti")
                .observe(obs_v, F.count(F.lit(1)).alias("n")))
            e = runner.cut(
                e.join(wave.select(F.col(ID).alias(SRC)), SRC, "anti"))
            n_left = int(obs_v.get["n"] or 0)
            gen += 1
        return out
    finally:
        runner.close()


def topological_sort(g: Graph) -> DataFrame:
    """(id, generation) whose (generation, id) order is a deterministic
    valid topological order — the row form of ``dag.py:164``'s iterator
    (any generation-respecting order is valid; the reference's own order
    depends on dict insertion order)."""
    return topological_generations(g)


def is_directed_acyclic_graph(g: Graph) -> bool:
    """``dag.py:40-55``: directed and cycle-free."""
    if not g.directed:
        return False
    try:
        topological_generations(g)
        return True
    except HasACycle:
        return False


def ancestors(g: Graph, source) -> DataFrame:
    """Vertices with a path TO ``source``, excluding it (``dag.py:56``) —
    reachability on the reversed graph."""
    from networkx_spark.algorithms.bfs import descendants
    return descendants(g.reverse(), source)


# --------------------------------------------------- reachability algebra
def transitive_closure(g: Graph, reflexive=False,
                       max_rounds: int = 64) -> DataFrame:
    """(src, dst) edge rows of the transitive closure (reference
    ``dag.py:669``): edge (v, w) ⇔ a nontrivial path v→w exists, plus the
    original edges.  ``reflexive`` follows the reference's three-valued
    contract (``dag.py:744-755``): False (default) keeps the self-loops
    that nontrivial cycles create, True adds (v, v) for every vertex,
    None strips created self-loops; original self-loop edges survive all
    three (the reference starts from ``G.copy()``).

    Directed graphs run **path doubling** — R ← R ∪ (R ⋈ R), log₂(longest
    shortest path) rounds, each one self-join + distinct; the reference
    pays a per-node BFS instead.  Undirected graphs shortcut through
    hash-min components (reachability ⇔ same component).  The OUTPUT is
    inherently O(Σ reachable pairs) — same as the reference's; run it on
    graphs whose closure fits, e.g. condensed web graphs.
    """
    if reflexive not in (None, True, False):
        raise ValueError("Incorrect value for the parameter `reflexive` "
                         "(reference NetworkXError)")
    spark = g.edges.sparkSession
    verts = g.vertices()
    loops = g.edges.filter(F.col(SRC) == F.col(DST)).select(SRC, DST)
    if not g.directed:
        from networkx_spark.algorithms.components import connected_components
        comp = connected_components(g)
        pairs = (comp.join(comp.withColumnRenamed(ID, "_v"), "component")
                 .filter(F.col(ID) < F.col("_v"))
                 .select(F.col(ID).alias(SRC), F.col("_v").alias(DST)))
        out = pairs.unionByName(loops).distinct()
        if reflexive is True:
            out = out.unionByName(
                verts.select(F.col(ID).alias(SRC), F.col(ID).alias(DST))
            ).distinct()
        return out

    runner = SuperstepRunner(None, name="closure", keep_scratch=4)
    try:
      with fixed_plan(spark):
        r = runner.cut(g.edges.select(SRC, DST).distinct())
        n = r.count()
        for _ in range(max_rounds):
            hop = (r.join(r.select(F.col(SRC).alias("_m"),
                                   F.col(DST).alias("_d")),
                          F.col(DST) == F.col("_m"))
                   .select(SRC, F.col("_d").alias(DST)))
            obs = Observation()
            r = runner.cut(r.unionByName(hop).distinct()
                           .observe(obs, F.count(F.lit(1)).alias("n")))
            n_new = int(obs.get["n"] or 0)
            if n_new == n:
                break
            n = n_new
        else:
            raise RuntimeError(f"closure did not converge in {max_rounds} "
                               "doubling rounds")
        out = r
        if reflexive is True:
            out = out.unionByName(
                verts.select(F.col(ID).alias(SRC), F.col(ID).alias(DST))
            ).distinct()
        elif reflexive is None:
            out = (out.filter(F.col(SRC) != F.col(DST))
                   .unionByName(loops).distinct())
        # one final cut: the returned DataFrame is backed by the newest
        # scratch snapshot, which survives rotation and close()
        return runner.cut(out)
    finally:
        runner.close()


def transitive_reduction(g: Graph) -> DataFrame:
    """(src, dst) rows of the transitive reduction of a DAG (reference
    ``dag.py:819``): keep edge (u, v) iff no path u→v longer than 1
    exists.  Raises on non-DAG input like the reference.

    One closure (path doubling) + one join: (u, v) is redundant iff some
    out-edge (u, w), w ≠ v, reaches v in the closure.
    """
    if not g.directed:
        raise ValueError("Directed acyclic graph required for "
                         "transitive_reduction (reference NetworkXError)")
    # reflexive=False keeps cycle-induced (v, v) pairs (reference
    # semantics; reflexive=None strips them), so a non-DAG is detectable
    # here; on a DAG the two forms are identical
    clo = transitive_closure(g, reflexive=False)
    if clo.filter(F.col(SRC) == F.col(DST)).limit(1).count():
        raise HasACycle("Directed acyclic graph required for "
                        "transitive_reduction (reference NetworkXError)")
    e = g.edges.select(SRC, DST).distinct()
    # rows (u, w) ⋈ closure (w, v) → candidate redundant edge (u, v)
    ew = e.select(SRC, F.col(DST).alias("_w"))
    cwv = clo.select(F.col(SRC).alias("_w"), F.col(DST).alias("_v"))
    redundant = (ew.join(cwv, "_w")
                 .filter(F.col("_w") != F.col("_v"))
                 .select(SRC, F.col("_v").alias(DST))
                 .distinct())
    return e.join(redundant, [SRC, DST], "anti")

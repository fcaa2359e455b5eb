"""Closeness and harmonic centrality — batched multi-source BFS.

Reference: ``networkx/algorithms/centrality/closeness.py:20``
(``closeness_centrality``): for every node u the INCOMING shortest-path
distances d(v, u) are computed (the reference BFSes ``G.reverse()`` for
directed graphs, ``closeness.py:107-113``), then

    C(u) = (r - 1) / Σ_v d(v, u)        r = |reachable-to-u| incl. u

and with the Wasserman–Faust improvement (``wf_improved=True``, the
default) the score is scaled by ``(r - 1)/(n - 1)`` so vertices of small
components do not get inflated scores (``closeness.py:119-124``).
Unreachable/isolated vertices score 0.

``networkx/algorithms/centrality/harmonic.py:13``
(``harmonic_centrality``): H(u) = Σ_{v≠u} 1/d(v, u), also over incoming
distances, no normalization, unreachable pairs contribute 0.

Both reference implementations loop a per-source Dijkstra/BFS; here ALL
requested sources run as ONE batched frontier state keyed ``(s, id)``
exactly like :mod:`~networkx_spark.algorithms.betweenness` — one Spark
job per BFS level serves every source, jobs = graph diameter.

Scale posture: exact mode is O(V²) state rows — for fixture-sized parity
only.  At web scale pass ``sources`` (the vertices whose centrality you
want — state is O(|sources|·V)); an all-vertex exact run at 10¹⁰ pages is
out of reach for ANY engine (it is all-pairs shortest paths).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _incoming_levels(g: Graph, sources: Optional[DataFrame],
                     max_depth: int) -> DataFrame:
    """Cumulative BFS state (s, id, dist): dist = d(id → s) — BFS from
    each source s over REVERSED edges (incoming-distance semantics; for
    undirected graphs the symmetrized adjacency makes the direction
    moot).  Returns the full state table including the (s, s, 0) rows."""
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # reversed adjacency: a frontier vertex x pulls the vertices v with
    # edge v→x, i.e. join on dst
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(DST).alias(ID), F.col(SRC).alias("nbr")).distinct()
           .repartition(n_part, ID).cache())
    if sources is None:
        sources = g.vertices()
    # keep_scratch=2: each union references only the previous cut, and the
    # returned state (the newest cut) survives rotation; scratch files live
    # until process exit (superstep.py:301-305), so the caller may
    # aggregate lazily after close()
    runner = SuperstepRunner(None, name="closeness", keep_scratch=2)
    try:
      with fixed_plan(spark):
        state = runner.cut(sources.select(F.col(ID).alias("s"), ID,
                                          F.lit(0).alias("dist")))
        frontier = state
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(adj, ID)
                   .select("s", F.col("nbr").alias(ID)).distinct()
                   .join(state.select("s", ID), ["s", ID], "anti")
                   .select("s", ID, F.lit(d).alias("dist")))
            obs = Observation()
            state = runner.cut(
                state.unionByName(nxt)
                .observe(obs, F.sum(F.when(F.col("dist") == d, 1)
                                    .otherwise(0)).alias("n")))
            if int(obs.get["n"] or 0) == 0:
                break
            frontier = state.filter(F.col("dist") == d)
        return state
    finally:
        adj.unpersist()
        runner.close()


def closeness_centrality(g: Graph, sources: Optional[DataFrame] = None,
                         wf_improved: bool = True,
                         max_depth: int = 10_000) -> DataFrame:
    """(id, closeness) for every requested vertex
    (``closeness.py:20-126``).  ``sources=None`` → all vertices (exact,
    fixture-scale); pass a vertex DataFrame for the sampled scale path."""
    spark = g.edges.sparkSession
    n = g.vertices().count()
    if n == 0:
        return spark.createDataFrame([], "id long, closeness double")
    levels = _incoming_levels(g, sources, max_depth)
    agg = (levels.groupBy("s")
           .agg(F.count(F.lit(1)).alias("r"), F.sum("dist").alias("tot")))
    c = F.when((F.col("r") > 1) & (F.col("tot") > 0),
               (F.col("r") - 1) / F.col("tot")).otherwise(F.lit(0.0))
    if wf_improved and n > 1:
        c = c * (F.col("r") - 1) / F.lit(float(n - 1))
    out = agg.select(F.col("s").alias(ID), c.alias("closeness"))
    base = sources if sources is not None else g.vertices()
    return (base.join(out, ID, "left")
            .select(ID, F.coalesce("closeness", F.lit(0.0)).alias("closeness")))


def harmonic_centrality(g: Graph, sources: Optional[DataFrame] = None,
                        max_depth: int = 10_000) -> DataFrame:
    """(id, harmonic) — Σ 1/d(v, u) over v ≠ u (``harmonic.py:13-80``)."""
    spark = g.edges.sparkSession
    if g.vertices().limit(1).count() == 0:
        return spark.createDataFrame([], "id long, harmonic double")
    levels = _incoming_levels(g, sources, max_depth)
    agg = (levels.filter(F.col("dist") > 0).groupBy("s")
           .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic")))
    base = sources if sources is not None else g.vertices()
    return (base.join(agg.withColumnRenamed("s", ID), ID, "left")
            .select(ID, F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")))


# ------------------------------------------------------- degree centrality
def degree_centrality(g: Graph) -> DataFrame:
    """(id, centrality) — degree / (n−1)
    (``centrality/degree_alg.py:9-50``); n ≤ 1 → 1.0 for every node."""
    return _degree_centrality(g, g.degrees())


def in_degree_centrality(g: Graph) -> DataFrame:
    """(id, centrality) — in-degree / (n−1) (``degree_alg.py:54``);
    directed only, like the reference's ``@not_implemented_for``."""
    if not g.directed:
        raise ValueError("in_degree_centrality not defined for undirected "
                         "graphs (reference raises NetworkXNotImplemented)")
    return _degree_centrality(g, g.in_degrees())


def out_degree_centrality(g: Graph) -> DataFrame:
    """(id, centrality) — out-degree / (n−1) (``degree_alg.py:104``)."""
    if not g.directed:
        raise ValueError("out_degree_centrality not defined for undirected "
                         "graphs (reference raises NetworkXNotImplemented)")
    return _degree_centrality(g, g.out_degrees())


def _degree_centrality(g: Graph, deg: DataFrame) -> DataFrame:
    n = g.number_of_vertices()
    if n <= 1:
        return g.vertices().select(ID, F.lit(1.0).alias("centrality"))
    return deg.select(ID, (F.col("degree") / F.lit(float(n - 1)))
                      .alias("centrality"))

"""Girvan–Newman community detection as repeated edge-betweenness splits.

Reference: ``networkx/algorithms/community/centrality.py:girvan_newman``:
copy the graph undirected, drop self-loops, then repeatedly remove the
edge with the highest :func:`edge_betweenness_centrality` until the
number of connected components increases, yielding the component
partition at each such level.

Spark shape: the driver loop holds only the (tiny) list of removed edge
pairs; each iteration is one batched-Brandes edge-betweenness run
(2·diameter Spark jobs regardless of vertex count, see
``betweenness.py``) plus one hash-min connected-components run.  The
current edge set is the original DataFrame minus an ``isin`` filter over
the removed pairs — one filter expression, no per-iteration lineage
growth.

Scale posture: exact Girvan–Newman is inherently O(removals · E·V) —
the reference's own docs call it impractical beyond small graphs.  This
is a fixture/parity-tier operator; the production community-detection
paths are :func:`~networkx_spark.algorithms.louvain.louvain_communities`
and the LPA family.  ``max_removals`` bounds the driver loop.

Tie-breaking: the reference takes ``max(betweenness, key=...)`` — first
maximum in edge-insertion order; here ties break lexicographically on
(src, dst).  Identical whenever the maximum is unique (all parity
fixtures); documented divergence otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.algorithms.betweenness import edge_betweenness_centrality
from networkx_spark.algorithms.components import connected_components


def girvan_newman(g: Graph, levels: int = 1,
                  max_removals: int = 10_000) -> list[DataFrame]:
    """First ``levels`` Girvan–Newman partitions, coarsest first.

    Returns a list of ``(id, community)`` DataFrames (community = min
    vertex id of the community), one per level at which the component
    count increased — the reference generator's successive yields.
    """
    vertices = g.vertices()
    base = (g.edges.select(F.least(SRC, DST).alias(SRC),
                           F.greatest(SRC, DST).alias(DST))
            .filter(F.col(SRC) != F.col(DST)).distinct().cache())
    key = F.concat_ws("\x00", SRC, DST)

    removed: list[str] = []
    results: list[DataFrame] = []

    def current() -> DataFrame:
        e = base
        if removed:
            e = e.filter(~key.isin(removed))
        return e

    cur = Graph(base, directed=False, vertices=vertices)
    cc = connected_components(cur)
    ncomp = cc.select("component").distinct().count()
    n_edges = base.count()

    try:
        while len(results) < levels and n_edges > 0:
            for _ in range(max_removals):
                cur = Graph(current(), directed=False, vertices=vertices)
                eb = edge_betweenness_centrality(cur, normalized=True)
                top = (eb.orderBy(F.desc("betweenness"), SRC, DST)
                       .limit(1).collect())
                if not top:
                    return results
                removed.append(f"{top[0][SRC]}\x00{top[0][DST]}")
                n_edges -= 1
                cc = connected_components(
                    Graph(current(), directed=False, vertices=vertices))
                c = cc.select("component").distinct().count()
                if c > ncomp:
                    ncomp = c
                    results.append(cc)
                    break
                if n_edges == 0:
                    return results
            else:
                raise RuntimeError(
                    f"girvan_newman: no split within max_removals="
                    f"{max_removals}")
        return results
    finally:
        base.unpersist()


def edge_betweenness_partition(g: Graph, number_of_sets: int,
                               max_removals: int = 10_000) -> DataFrame:
    """(id, community) after removing highest-edge-betweenness edges until
    ≥ ``number_of_sets`` components exist (reference
    ``community/divisive.py:11`` ``edge_betweenness_partition``; the
    reference's ``nx.connected_components`` restricts it to undirected
    graphs in practice, mirrored here via symmetrization)."""
    vertices = g.vertices()
    n = vertices.count()
    if number_of_sets <= 0:
        raise ValueError("number_of_sets must be >0 (reference NetworkXError)")
    if number_of_sets > n:
        raise ValueError("number_of_sets must be <= len(G) "
                         "(reference NetworkXError)")
    if number_of_sets == 1:
        return vertices.select(
            ID, F.lit("0").alias("community"))
    if number_of_sets == n:
        return vertices.select(ID, F.col(ID).alias("community"))

    base = (g.edges.select(F.least(SRC, DST).alias(SRC),
                           F.greatest(SRC, DST).alias(DST))
            .filter(F.col(SRC) != F.col(DST)).distinct().cache())
    key = F.concat_ws("\x00", SRC, DST)
    removed: list[str] = []

    def current() -> DataFrame:
        return base.filter(~key.isin(removed)) if removed else base

    try:
        cc = connected_components(
            Graph(current(), directed=False, vertices=vertices))
        ncomp = cc.select("component").distinct().count()
        for _ in range(max_removals):
            if ncomp >= number_of_sets:
                return cc.withColumnRenamed("component", "community")
            eb = edge_betweenness_centrality(
                Graph(current(), directed=False, vertices=vertices),
                normalized=True)
            top = (eb.orderBy(F.desc("betweenness"), SRC, DST)
                   .limit(1).collect())
            if not top:
                return cc.withColumnRenamed("component", "community")
            removed.append(f"{top[0][SRC]}\x00{top[0][DST]}")
            cc = connected_components(
                Graph(current(), directed=False, vertices=vertices))
            ncomp = cc.select("component").distinct().count()
        raise RuntimeError("edge_betweenness_partition: target not reached "
                           f"within max_removals={max_removals}")
    finally:
        base.unpersist()

"""Breadth-first search as iterative frontier joins.

Reference: ``networkx/algorithms/traversal/breadth_first_search.py`` and the
unweighted shortest-path layer
(``algorithms/shortest_paths/unweighted.py``).  The frontier join
(``frontier ⋈ edges on src``) is the engine's hottest primitive
(SURVEY §2.3); distances come out exact because every superstep visits the
full next level at once.

Scale posture: the visited set is ONE cumulative ``(id, distance)`` state
table rewritten per level (hash-min-CC style) — the anti-join that prunes
already-seen vertices scans a single parquet relation instead of a union of
per-level snapshots whose plan (and file count) grows with depth.  Web
graphs have ~10-hop diameters, so the O(V·depth) state I/O is bounded; the
new-frontier cardinality rides the state write as an observed metric
(CollectMetrics) — ONE Spark job per level, no separate count job.  The
adjacency is cached pre-partitioned on the join key, so each level shuffles
only the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner


class NodeNotFound(Exception):
    """Source vertex absent from the graph (reference ``nx.NodeNotFound``,
    ``networkx/exception.py:69``; raised by
    ``single_source_shortest_path_length``, ``unweighted.py:60-61``)."""


def bfs_distances(g: Graph, source, max_depth: int = 10_000) -> DataFrame:
    """(id, distance) for vertices reachable from ``source`` — the
    semantics of ``nx.single_source_shortest_path_length``.

    Raises :class:`NodeNotFound` when ``source`` is not a vertex, matching
    the reference (``unweighted.py:60-61``).
    """
    spark = g.edges.sparkSession
    if not g.has_vertex(source):
        raise NodeNotFound(f"Source {source!r} is not in G")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized().select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
           .repartition(n_part, ID).cache())
    src_type = g.edges.schema[SRC].dataType.simpleString()
    seed = str(source) if src_type == "string" else source
    runner = SuperstepRunner(None, name="bfs")
    try:
        visited = runner.cut(
            spark.createDataFrame([(seed, 0)], f"id {src_type}, distance int"))
        frontier = visited
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(adj, ID)
                   .select(F.col("nbr").alias(ID)).distinct()
                   .join(visited.select(ID), ID, "anti")
                   .select(ID, F.lit(d).alias("distance"), F.lit(1).alias("_new")))
            obs = Observation()
            visited = runner.cut(
                visited.withColumn("_new", F.lit(0)).unionByName(nxt)
                .observe(obs, F.sum("_new").alias("n")).drop("_new"))
            if int(obs.get["n"] or 0) == 0:
                break
            # distance pushdown prunes the new frontier out of the snapshot
            frontier = visited.filter(F.col("distance") == d)
        return visited
    finally:
        adj.unpersist()
        runner.close()


def descendants(g: Graph, source) -> DataFrame:
    """Vertices reachable from source, excluding it (``nx.descendants``)."""
    return (bfs_distances(g, source)
            .filter(F.col("distance") > 0).select(ID))


def predecessor(g: Graph, source, max_depth: int = 10_000) -> DataFrame:
    """(id, pred) — EVERY predecessor of ``id`` on some shortest path from
    ``source``; the row-form of the reference's ``nx.predecessor`` dict of
    lists (``shortest_paths/unweighted.py:400``; the source's empty list is
    the absence of rows here).

    Derived in ONE post-hoc join against the distance table — a vertex u
    is a predecessor of v iff edge u→v exists and dist(u) + 1 == dist(v) —
    rather than collected during traversal; pure function of the distance
    table, so it is deterministic and SQL-oracle-expressible.
    """
    dist = bfs_distances(g, source, max_depth=max_depth)
    adj = g.symmetrized().select(SRC, DST)
    du = dist.select(F.col(ID).alias(SRC), F.col("distance").alias("_du"))
    dv = dist.select(F.col(ID).alias(DST), F.col("distance").alias("_dv"))
    return (adj.join(du, SRC).join(dv, DST)
            .filter(F.col("_du") + 1 == F.col("_dv"))
            .select(F.col(DST).alias(ID), F.col(SRC).alias("pred"))
            .distinct())


def bfs_tree(g: Graph, source, max_depth: int = 10_000) -> DataFrame:
    """Edges (src, dst) of a BFS tree rooted at ``source`` — the reference's
    ``nx.bfs_tree`` (``traversal/breadth_first_search.py:434``).

    The reference's tree depends on adjacency-dict iteration order; here the
    parent is the MINIMUM shortest-path predecessor — any single-parent
    choice among shortest-path predecessors yields a valid BFS tree (same
    vertex set, same depths), and min is deterministic and oracle-friendly.
    """
    return (predecessor(g, source, max_depth=max_depth)
            .groupBy(ID).agg(F.min("pred").alias(SRC))
            .select(SRC, F.col(ID).alias(DST)))


def single_source_shortest_path(g: Graph, source) -> DataFrame:
    """(id, distance, path array) — ``nx.single_source_shortest_path``
    (``unweighted.py:298``), built over the unweighted shortest-path tree
    (see :func:`~networkx_spark.algorithms.sssp.single_source_dijkstra_path`
    for the layered construction and its scale posture)."""
    from networkx_spark.algorithms.sssp import single_source_dijkstra_path
    return (single_source_dijkstra_path(g, source, weight=False)
            .select(ID, F.col("distance").cast("long").alias("distance"), "path"))


def ego_graph(g: Graph, n, radius: int = 1, center: bool = True,
              undirected: bool = False) -> Graph:
    """Subgraph induced on the vertices within ``radius`` hops of ``n`` —
    ``nx.ego_graph`` (``generators/ego.py:10``).  BFS distance table +
    one induced-subgraph semi-join; ``undirected=True`` ignores edge
    direction for the reach like the reference."""
    base = g.to_undirected() if (undirected and g.directed) else g
    dist = bfs_distances(base, n, max_depth=radius)
    ball = dist.filter(F.col("distance") <= radius).select(ID)
    if not center:
        src_type = g.edges.schema[SRC].dataType.simpleString()
        seed = str(n) if src_type == "string" else n
        ball = ball.filter(F.col(ID) != F.lit(seed))
    return g.subgraph(ball)

"""Breadth-first search as iterative frontier joins.

Reference: ``networkx/algorithms/traversal/breadth_first_search.py`` and the
unweighted shortest-path layer
(``algorithms/shortest_paths/unweighted.py``).  The frontier join
(``frontier ⋈ edges on src``) is the engine's hottest primitive
(SURVEY §2.3); distances come out exact because every superstep visits the
full next level at once.

Scale posture: each level cuts ONLY the new frontier (O(level size) write),
never the accumulated visited set — the visited view is a lazy union of the
per-level parquet snapshots, so total state I/O is O(V) over the whole
traversal instead of O(V · diameter).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
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
    adj = g.symmetrized().select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
    src_type = g.edges.schema[SRC].dataType.simpleString()
    seed = str(source) if src_type == "string" else source
    # keep_scratch=0: every level's snapshot stays referenced by the final
    # union — rotation would delete files still backing the result
    runner = SuperstepRunner(None, name="bfs", keep_scratch=0)
    try:
        frontier = runner.cut(
            spark.createDataFrame([(seed, 0)], f"id {src_type}, distance int"))
        levels = [frontier]
        visited = frontier
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(adj, ID)
                   .select(F.col("nbr").alias(ID)).distinct()
                   .join(visited.select(ID), ID, "anti")
                   .withColumn("distance", F.lit(d)))
            nxt = runner.cut(nxt)
            if nxt.count() == 0:
                break
            levels.append(nxt)
            visited = reduce(DataFrame.unionByName, levels)
            frontier = nxt
        return visited
    finally:
        runner.close()


def descendants(g: Graph, source) -> DataFrame:
    """Vertices reachable from source, excluding it (``nx.descendants``)."""
    return (bfs_distances(g, source)
            .filter(F.col("distance") > 0).select(ID))

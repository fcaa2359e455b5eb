"""Breadth-first search as iterative frontier joins.

Reference: ``networkx/algorithms/traversal/breadth_first_search.py`` and the
unweighted shortest-path layer
(``algorithms/shortest_paths/unweighted.py``).  The frontier join
(``frontier ⋈ edges on src``) is the engine's hottest primitive
(SURVEY §2.3); distances come out exact because every superstep visits the
full next level at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner


def bfs_distances(g: Graph, source, max_depth: int = 10_000) -> DataFrame:
    """(id, distance) for vertices reachable from ``source`` — the
    semantics of ``nx.single_source_shortest_path_length``."""
    spark = g.edges.sparkSession
    adj = g.symmetrized().select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
    src_type = g.edges.schema[SRC].dataType.simpleString()
    seed = str(source) if src_type == "string" else source
    runner = SuperstepRunner(None, name="bfs")
    try:
        visited = spark.createDataFrame([(seed, 0)], f"id {src_type}, distance int")
        frontier = visited
        visited = runner.cut(visited)
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(adj, ID)
                   .select(F.col("nbr").alias(ID)).distinct()
                   .join(visited, ID, "anti")
                   .withColumn("distance", F.lit(d)))
            nxt = runner.cut(nxt)
            if nxt.count() == 0:
                return visited
            visited = runner.cut(visited.unionByName(nxt))
            frontier = nxt
        return visited
    finally:
        runner.close()


def descendants(g: Graph, source) -> DataFrame:
    """Vertices reachable from source, excluding it (``nx.descendants``)."""
    return (bfs_distances(g, source)
            .filter(F.col("distance") > 0).select(ID))

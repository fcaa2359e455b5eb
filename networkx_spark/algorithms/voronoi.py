"""Voronoi cells under the shortest-path metric.

Reference: ``networkx/algorithms/voronoi.py:9`` (``voronoi_cells``):
every vertex belongs to the cell of the nearest center node
(``multi_source_dijkstra_path`` then grouping by the path's origin);
unreachable vertices form the special ``'unreachable'`` cell.

Spark shape: there is no need for per-center keyed BFS state — the cell
assignment is the argmin over centers, so ONE relax loop carrying
``(distance, center)`` per vertex suffices (the same frontier-pruned
Bellman-Ford superstep as ``sssp.py``, with the merge ordered on the
``(distance, center-key)`` struct).  State is O(V) rows regardless of
the number of centers — this is the web-scale graph-partitioner shape
(seed hubs → cells), not a fixture op.

Tie-breaking: the reference inherits Dijkstra's heap pop order for
equidistant centers (insertion-order dependent); here ties break to the
smallest center id (numeric strings numerically), which is
parallelism-independent and deterministic.  Parity tests use tie-free
fixtures; the divergence is documented here.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _center_key(col):
    """(is_non_numeric, length, value) — numeric ids order numerically."""
    digits = col.rlike(r"^[0-9]+$")
    return [F.when(digits, 0).otherwise(1).alias("_k0"),
            F.when(digits, F.length(col)).otherwise(0).alias("_k1"),
            col.alias("_k2")]


def voronoi_cells(g: Graph, center_nodes: Iterable | DataFrame,
                  weight: bool = True,
                  max_iter: Optional[int] = None) -> DataFrame:
    """(id, center) — nearest-center assignment; unreachable vertices get
    ``center = NULL`` (the reference's ``'unreachable'`` cell)."""
    spark = g.edges.sparkSession
    if isinstance(center_nodes, DataFrame):
        centers = center_nodes.select(F.col(ID).cast("string").alias(ID))
    else:
        rows = [(str(c),) for c in center_nodes]
        if not rows:
            raise ValueError("center_nodes must not be empty "
                             "(reference ValueError)")
        centers = spark.createDataFrame(rows, "id string")
    centers = centers.distinct()
    if centers.limit(1).count() == 0:
        raise ValueError("center_nodes must not be empty "
                         "(reference ValueError)")

    wcol = F.col(WEIGHT).cast("double") if weight and WEIGHT in g.edges.columns \
        else F.lit(1.0)
    adj = g.symmetrized().select(F.col(SRC).cast("string").alias(SRC),
                                 F.col(DST).cast("string").alias(DST),
                                 wcol.alias("_w"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(n_part, SRC).cache()
    if max_iter is None:
        max_iter = max(16, g.number_of_vertices())

    def best(dist_col, center_col):
        return F.struct(dist_col.alias("d"),
                        *_center_key(center_col)).alias("best")

    runner = SuperstepRunner(None, name="voronoi", keep_scratch=2)
    try:
      with fixed_plan(spark):
        state = runner.cut(centers.select(
            ID, best(F.lit(0.0), F.col(ID)),
            F.lit(True).alias("improved")))
        for _ in range(max_iter):
            frontier = state.filter("improved").select(ID, "best")
            cand = (frontier.join(adj, frontier[ID] == adj[SRC])
                    .groupBy(F.col(DST).alias(ID))
                    .agg(F.min(best(F.col("best.d") + F.col("_w"),
                                    F.col("best._k2"))).alias("_c")))
            obs = Observation()
            merged = (state.select(ID, "best").join(cand, ID, "full")
                      .select(ID,
                              F.when(F.col("best").isNull()
                                     | (F.col("_c").isNotNull()
                                        & (F.col("_c") < F.col("best"))),
                                     F.col("_c")).otherwise(F.col("best"))
                              .alias("best"),
                              (F.col("_c").isNotNull()
                               & (F.col("best").isNull()
                                  | (F.col("_c") < F.col("best"))))
                              .alias("improved"))
                      .observe(obs, F.sum(F.col("improved").cast("long"))
                               .alias("n")))
            state = runner.cut(merged)
            if int(obs.get["n"] or 0) == 0:
                break
        assigned = state.select(ID, F.col("best._k2").alias("center"))
        return (g.vertices().select(F.col(ID).cast("string").alias(ID))
                .join(assigned, ID, "left"))
    finally:
        adj.unpersist()
        runner.close()

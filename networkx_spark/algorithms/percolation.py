"""Percolation centrality.

Reference: ``networkx/algorithms/centrality/percolation.py:18``
(``percolation_centrality``): betweenness-style pair dependencies where
each source s weights its dependency on w by ``x_s / (Σx − x_w)``
(the percolation states x), scaled by ``1/(n−2)``; with uniform states
it reduces to (unnormalized-per-pair) betweenness.

Spark shape: the batched multi-source Brandes (``betweenness.py``)
already materializes the per-source dependency table δ_s(w) level by
level — percolation is ONE extra join + weighted aggregation over that
table, so the cost envelope is identical to exact betweenness
(2·diameter Spark jobs, O(V²) state for the all-source exact mode).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, ID
from networkx_spark.algorithms.betweenness import _batched_brandes


def percolation_centrality(g: Graph, states: DataFrame | dict,
                           max_depth: int = 10_000) -> DataFrame:
    """(id, percolation) for every vertex.  ``states`` is a dict or a
    DataFrame (id, percolation-state in [0, 1])."""
    spark = g.edges.sparkSession
    if isinstance(states, dict):
        st = spark.createDataFrame(
            [(str(k), float(v)) for k, v in states.items()],
            "id string, x double")
    else:
        st = states.select(F.col(states.columns[0]).cast("string").alias(ID),
                           F.col(states.columns[1]).cast("double").alias("x"))
    st = st.cache()
    n = g.number_of_vertices()
    sum_x = float(st.agg(F.sum("x")).collect()[0][0] or 0.0)

    deltas = _batched_brandes(g, None, False, None, max_depth,
                              edges_mode=False, per_source=True)
    pc = (deltas
          .join(F.broadcast(st.select(F.col(ID).alias("s"),
                                      F.col("x").alias("_xs"))), "s")
          .join(F.broadcast(st.select(ID, F.col("x").alias("_xw"))), ID)
          .groupBy(ID)
          .agg(F.sum(F.col("delta") * F.col("_xs")
                     / (F.lit(sum_x) - F.col("_xw"))).alias("_p")))
    if n <= 2:
        # reference: 1/(n-2) rescale raises ZeroDivisionError for n <= 2
        raise ZeroDivisionError(
            "percolation_centrality is undefined for graphs with n <= 2 "
            "(reference divides by n - 2)")
    scale = 1.0 / (n - 2)
    return (g.vertices().select(F.col(ID).cast("string").alias(ID))
            .join(pc, ID, "left")
            .select(ID, (F.coalesce("_p", F.lit(0.0)) * F.lit(scale))
                    .alias("percolation")))

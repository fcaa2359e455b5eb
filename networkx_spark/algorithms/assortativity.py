"""Degree assortativity / correlation metrics.

Reference: ``networkx/algorithms/assortativity/correlation.py:19``
(``degree_assortativity_coefficient``) and ``:208``
(``degree_pearson_correlation_coefficient``) — the Pearson correlation of
the degrees at either end of every edge.  The reference builds a degree
mixing matrix and computes the correlation from it; the value is identical
to Pearson-r over the edge-end degree-pair list, which is how a DataFrame
engine wants it: two degree tables, two broadcast-or-shuffle joins onto the
edge table, one ``corr`` aggregate.  For undirected graphs every edge
contributes BOTH orientations (``assortativity/pairs.py:69-71``:
``node_degree_xy`` yields each undirected edge twice), which also makes the
statistic symmetric.

Scale posture: degree tables are one groupBy each; the pair list is edges ⋈
degrees ⋈ degrees (the degree side is |V|-sized — broadcastable for most
graphs, shuffle-joined otherwise); ``corr`` is a single partial-aggregated
scalar.  No Python, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _deg(g: Graph, kind: str) -> DataFrame:
    if kind == "out":
        return g.out_degrees()
    if kind == "in":
        return g.in_degrees()
    return g.degrees()


def degree_pairs(g: Graph, x: str = "out", y: str = "in") -> DataFrame:
    """(xd, yd) per edge-end pair — undirected edges appear in both
    orientations (``pairs.py:69-71``); directed edges once, x-degree of the
    source paired with y-degree of the target (``pairs.py:73-75``)."""
    e = g.edges.select(SRC, DST)
    if not g.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        x = y = "deg"
    xd = _deg(g, x).select(F.col(ID).alias(SRC), F.col("degree").alias("xd"))
    yd = _deg(g, y).select(F.col(ID).alias(DST), F.col("degree").alias("yd"))
    return e.join(xd, SRC).join(yd, DST).select("xd", "yd")


def degree_assortativity_coefficient(g: Graph, x: str = "out",
                                     y: str = "in") -> float:
    """Pearson correlation of edge-end degrees
    (``correlation.py:19``); NaN on degree-regular graphs (zero variance),
    matching the reference's scipy behaviour."""
    # explicit covar/stddev form: Spark 4's ANSI mode makes corr() raise
    # DIVIDE_BY_ZERO on zero-variance input where the reference yields NaN
    row = (degree_pairs(g, x, y)
           .agg(F.try_divide(
               F.covar_samp("xd", "yd"),
               F.stddev_samp("xd") * F.stddev_samp("yd")).alias("r"))
           .collect()[0])
    return float("nan") if row["r"] is None else float(row["r"])


# scipy-pearsonr variant computes the same statistic (``correlation.py:208``)
degree_pearson_correlation_coefficient = degree_assortativity_coefficient

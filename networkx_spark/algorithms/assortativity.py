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


# --------------------------------------------------- attribute assortativity
def attribute_pairs(g: Graph, attribute: str) -> DataFrame:
    """(xa, ya) attribute values at either end of every edge — the
    reference's ``node_attribute_xy`` (``assortativity/pairs.py:8``):
    undirected edges appear in both orientations, self-loops once (exactly
    :meth:`Graph.symmetrized`); vertices without the attribute contribute
    null, like the reference's ``.get(attribute, None)``."""
    if g._vertex_attrs is None or attribute not in g._vertex_attrs.columns:
        raise KeyError(f"no vertex attribute {attribute!r}")
    va = g._vertex_attrs.select(ID, attribute)
    e = g.symmetrized().select(SRC, DST)
    xa = va.select(F.col(ID).alias(SRC), F.col(attribute).alias("xa"))
    ya = va.select(F.col(ID).alias(DST), F.col(attribute).alias("ya"))
    return e.join(xa, SRC, "left").join(ya, DST, "left").select("xa", "ya")


def attribute_assortativity_coefficient(g: Graph, attribute: str) -> float:
    """Newman Eq. (2): ``(tr(M) − ΣM²) / (1 − ΣM²)`` over the categorical
    mixing matrix M (``correlation.py:163``, ``attribute_ac``
    ``mixing.py``-adjacent).  M never materializes as a matrix: with
    ``a_k = Σ_i M_ik`` (column sums) and ``b_k = Σ_j M_kj`` (row sums),
    ``Σ_{ij}(M²)_{ij} = Σ_k a_k·b_k`` — so the whole statistic is two
    small aggregations over the (xa, ya) pair counts, category-count-sized,
    never vertex-count-sized."""
    m = attribute_pairs(g, attribute).groupBy("xa", "ya").count().cache()
    try:
        tot_tr = m.agg(
            F.sum("count").alias("tot"),
            F.sum(F.when(F.col("xa").eqNullSafe(F.col("ya")), F.col("count"))
                  .otherwise(F.lit(0))).alias("tr")).collect()[0]
        total, tr = float(tot_tr["tot"] or 0.0), float(tot_tr["tr"] or 0.0)
        if total == 0:
            return float("nan")
        rows = m.groupBy(F.col("xa").alias("k")).agg(F.sum("count").alias("b"))
        cols = m.groupBy(F.col("ya").alias("k")).agg(F.sum("count").alias("a"))
        s = (rows.join(cols, rows["k"].eqNullSafe(cols["k"]))
             .agg(F.sum(F.col("a") * F.col("b"))).collect()[0][0]) or 0.0
        ssq = float(s) / (total * total)
        if ssq == 1.0:
            return float("nan")          # degenerate: reference divides by 0
        return (tr / total - ssq) / (1.0 - ssq)
    finally:
        m.unpersist()


def numeric_assortativity_coefficient(g: Graph, attribute: str) -> float:
    """Pearson correlation of a NUMERIC attribute at edge ends
    (``correlation.py:210``) — same try_divide NaN-safety as the degree
    variant (ANSI mode raises on zero variance where the reference
    returns NaN)."""
    row = (attribute_pairs(g, attribute)
           .select(F.col("xa").cast("double"), F.col("ya").cast("double"))
           .agg(F.try_divide(
               F.covar_samp("xa", "ya"),
               F.stddev_samp("xa") * F.stddev_samp("ya")).alias("r"))
           .collect()[0])
    return float("nan") if row["r"] is None else float(row["r"])

"""Rich-club coefficient.

Reference ``networkx/algorithms/richclub.py:14`` (``rich_club_coefficient``):
for each degree ``k``, ``φ(k) = 2·E_k / (N_k·(N_k−1))`` where ``N_k`` is
the number of nodes of degree > k and ``E_k`` the number of edges joining
two such nodes; keys run over ``k`` while ``N_k > 1`` (``_compute_rc``,
``richclub.py:110-135``).  Undirected simple graphs only; self-loops raise
(``richclub.py:95-98``).

Distributed shape: an edge joins the >k club for every ``k <
min(deg(u), deg(v))``, so ``E_k`` is a suffix-sum of the edge min-degree
histogram and ``N_k`` a suffix-sum of the node degree histogram.  Both
histograms are single shuffles over the data; the suffix sums run on the
k-grid (``max_degree`` rows — output-sized, not data-sized), where a
single-partition running-sum window is the right plan.

``normalized=True`` (reference default) divides by the same statistic on
a degree-preserving null model produced by ``Q·m`` *sequential* random
double-edge swaps (``richclub.py:100-106``) — an inherently serial MCMC
chain with no distributed equivalent that preserves its distribution;
this engine raises ``NotImplementedError`` for it and implements the raw
coefficient (``normalized=False``) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def rich_club_coefficient(g: Graph, normalized: bool = False) -> DataFrame:
    """(k, phi) for each degree ``k`` with ``N_k ≥ 2`` (``richclub.py:14``)."""
    if g.directed:
        raise ValueError("rich_club_coefficient is not implemented for "
                         "directed graphs (reference raises "
                         "NetworkXNotImplemented)")
    if normalized:
        raise NotImplementedError(
            "normalized rich-club requires the reference's sequential "
            "double_edge_swap null model (richclub.py:100-106), which has "
            "no order-preserving distributed form; use normalized=False")
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("rich_club_coefficient is not implemented for "
                         "graphs with self loops (reference raises)")
    spark = g.edges.sparkSession

    deg = g.degrees()                                   # (id, degree)
    nhist = deg.groupBy(F.col("degree").alias("d")).agg(
        F.count("*").alias("cnt"))
    # each canonical undirected edge once; its club membership threshold
    du = deg.select(F.col(ID).alias(SRC), F.col("degree").alias("_du"))
    dv = deg.select(F.col(ID).alias(DST), F.col("degree").alias("_dv"))
    ehist = (g.edges.join(du, SRC).join(dv, DST)
             .select(F.least("_du", "_dv").alias("d"))
             .groupBy("d").agg(F.count("*").alias("cnt")))

    dmax = deg.agg(F.max("degree")).collect()[0][0]
    if dmax is None or dmax == 0:
        return spark.createDataFrame([], "k long, phi double")

    # k-grid 0..dmax-1; N_k = total_nodes − Σ_{d≤k} nhist(d),
    # E_k = total_edges − Σ_{d≤k} ehist(d) — running sums on the grid
    ks = spark.range(int(dmax)).select(F.col("id").alias("k"))
    n_total = deg.count()
    m_total = g.edges.count()
    win = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    grid = (ks
            .join(nhist.select(F.col("d").alias("k"),
                               F.col("cnt").alias("_nc")), "k", "left")
            .join(ehist.select(F.col("d").alias("k"),
                               F.col("cnt").alias("_ec")), "k", "left")
            .select("k",
                    (F.lit(n_total)
                     - F.sum(F.coalesce("_nc", F.lit(0))).over(win)).alias("nk"),
                    (F.lit(m_total)
                     - F.sum(F.coalesce("_ec", F.lit(0))).over(win)).alias("ek")))
    return (grid.filter(F.col("nk") >= 2)
            .select(F.col("k").cast("long").alias("k"),
                    (2.0 * F.col("ek")
                     / (F.col("nk") * (F.col("nk") - 1))).alias("phi")))

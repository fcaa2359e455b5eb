"""Neighbor-degree statistics: average neighbor degree and k-nearest-
neighbor degree connectivity.

Reference:

* ``average_neighbor_degree`` — ``networkx/algorithms/assortativity/
  neighbor_degree.py:7``: per-node mean (weighted) degree of the
  neighborhood, ``k_nn,i = (1/s_i) Σ_{j∈N(i)} w_ij · k_j``, where the
  neighborhood is chosen by ``source`` ('in' = predecessors, 'out' =
  successors, 'in+out' = both; undirected graphs only support the
  default) and ``k_j`` is the **unweighted** ``target``-degree of the
  neighbor (the reference precomputes ``t_deg`` explicitly unweighted).
  Zero-degree nodes map to 0.0.
* ``average_degree_connectivity`` — ``networkx/algorithms/assortativity/
  connectivity.py:9``: the same numerator aggregated by the node's
  **unweighted** source-degree ``k``; denominator is the sum of the
  nodes' *weighted* source-degrees, ``{k: Σ_n s_n·k_nn,n / Σ_n s_n}``.
  Undirected graphs only support the default ``source=target='in+out'``.
  Reference quirk preserved: for directed graphs with ``source='in+out'``
  the numerator iterates ``G.neighbors(n)`` — the SUCCESSORS only
  (``connectivity.py:83-90``) — while the group key and the denominator
  still use the full in+out degree.

Spark shape: one incidence table (id, nbr, w) built by column swaps
(never a point lookup), one join against the unweighted target-degree
table, one groupBy — all JVM-side whole-stage-codegen column math; at
web scale this is a single shuffle on ``nbr`` plus one on ``id``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID

_KINDS = ("in", "out", "in+out")


def _incidence(g: Graph, source: str) -> DataFrame:
    """(id, nbr, w) rows of the ``source`` neighborhood.

    Directed 'in+out' lists a self-loop twice (once via ``G.pred``, once
    via ``G.succ``), exactly like the reference's ``G_P[n] + G_S[n]``
    sums (``neighbor_degree.py:150-160``).
    """
    e = g.edges
    out = e.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"),
                   F.col(WEIGHT).alias("w"))
    if not g.directed:
        # undirected neighborhood = G.adj: both directions, self-loop once
        return (g.symmetrized()
                .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"),
                        F.col(WEIGHT).alias("w")))
    inc = e.select(F.col(DST).alias(ID), F.col(SRC).alias("nbr"),
                   F.col(WEIGHT).alias("w"))
    if source == "out":
        return out
    if source == "in":
        return inc
    return out.unionByName(inc)


def _target_degrees(g: Graph, target: str) -> DataFrame:
    """Unweighted ``target``-degree per vertex, renamed (nbr, t_deg) —
    the reference's ``t_deg`` dict is explicitly unweighted
    (``neighbor_degree.py:137``)."""
    if not g.directed:
        d = g.degrees()
    elif target == "out":
        d = g.out_degrees()
    elif target == "in":
        d = g.in_degrees()
    else:
        d = g.degrees()
    return d.select(F.col(ID).alias("nbr"), F.col("degree").alias("t_deg"))


def _source_degrees(g: Graph, source: str, weighted: bool) -> DataFrame:
    if not g.directed:
        return g.degrees(weighted=weighted)
    if source == "out":
        return g.out_degrees(weighted=weighted)
    if source == "in":
        return g.in_degrees(weighted=weighted)
    return g.degrees(weighted=weighted)


def _check_args(g: Graph, source: str, target: str, undirected_default: str):
    if source not in _KINDS or target not in _KINDS:
        raise ValueError(f"source/target must be one of {_KINDS}")
    if not g.directed and (source != undirected_default
                           or target != undirected_default):
        raise ValueError(
            "source and target arguments are only supported for directed "
            "graphs (reference NetworkXError)")


def average_neighbor_degree(g: Graph, source: str = "out",
                            target: str = "out",
                            weight: Optional[bool] = None) -> DataFrame:
    """(id, avg_nbr_degree) — mean unweighted ``target``-degree of the
    ``source`` neighborhood, weighted by edge weight when ``weight`` is
    truthy (``neighbor_degree.py:7-166``).  Zero-degree nodes → 0.0."""
    _check_args(g, source, target, undirected_default="out")
    w = bool(weight)
    inc = _incidence(g, source)
    tdeg = _target_degrees(g, target)
    num = (inc.join(tdeg, "nbr")
           .groupBy(ID)
           .agg(F.sum((F.col("w") if w else F.lit(1.0))
                      * F.col("t_deg")).alias("_num")))
    sdeg = _source_degrees(g, source, weighted=w)
    return (sdeg.join(num, ID, "left")
            .select(ID,
                    F.when(F.col("degree") == 0, F.lit(0.0))
                     .otherwise(F.coalesce("_num", F.lit(0.0))
                                / F.col("degree"))
                     .alias("avg_nbr_degree")))


def average_degree_connectivity(g: Graph, source: str = "in+out",
                                target: str = "in+out",
                                weight: Optional[bool] = None) -> DataFrame:
    """(k, connectivity) — average nearest-neighbor degree of nodes with
    (unweighted) source-degree ``k`` (``connectivity.py:9-135``):
    ``Σ_n s_n·k_nn,n / Σ_n s_n`` over nodes of degree ``k``; 0.0 when the
    weighted-degree sum is zero (degree-0 group)."""
    _check_args(g, source, target, undirected_default="in+out")
    w = bool(weight)
    # reference quirk: directed 'in+out' sums over G.neighbors = successors
    # only (connectivity.py:83-90), unlike average_neighbor_degree's
    # G_P + G_S union
    inc_kind = "out" if (g.directed and source == "in+out") else source
    inc = _incidence(g, inc_kind)
    tdeg = _target_degrees(g, target)
    # per-node numerator s_n = Σ_nbr w_edge · t_deg(nbr)
    num = (inc.join(tdeg, "nbr")
           .groupBy(ID)
           .agg(F.sum((F.col("w") if w else F.lit(1.0))
                      * F.col("t_deg")).alias("_num")))
    k_of = _source_degrees(g, source, weighted=False) \
        .withColumnRenamed("degree", "k")
    dnorm = _source_degrees(g, source, weighted=w) \
        .withColumnRenamed("degree", "_sdeg")
    per_node = (k_of.join(dnorm, ID)
                .join(num, ID, "left")
                .select("k", F.coalesce("_num", F.lit(0.0)).alias("_num"),
                        F.col("_sdeg").cast("double").alias("_sdeg")))
    return (per_node.groupBy("k")
            .agg(F.sum("_num").alias("_s"), F.sum("_sdeg").alias("_d"))
            .select(F.col("k").cast("long").alias("k"),
                    F.when(F.col("_d") == 0, F.col("_s"))
                     .otherwise(F.col("_s") / F.col("_d"))
                     .alias("connectivity")))

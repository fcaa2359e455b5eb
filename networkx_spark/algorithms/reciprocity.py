"""Reciprocity — the fraction of directed edges that are reciprocated.

Reference: ``networkx/algorithms/reciprocity.py:11``
(``overall_reciprocity``, ``:83``: ``r = |E ∩ E^T| / |E|`` counting each
direction of a mutual pair) and the per-node form (``reciprocity``,
``:11-55``: for node u, reciprocated incident pairs / total incident
pairs over the union of in- and out-neighborhoods).

One self-join (edges ⋈ reversed edges) — no iteration; the join keys on
(src, dst) so it shuffles each side once and Catalyst picks sort-merge or
broadcast by size.  Undirected input raises like the reference
(``NetworkXNotImplemented``; ``reciprocity.py:9,81``), and
``overall_reciprocity`` on an empty graph raises ``NetworkXError``
("Not defined for empty graphs", ``:96-97``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _require_directed(g: Graph) -> None:
    if not g.directed:
        raise ValueError("Not implemented for undirected graphs "
                         "(reference raises NetworkXNotImplemented)")


def overall_reciprocity(g: Graph) -> float:
    """``|E ∩ E^T| / |E|`` over the loop-free distinct edge set
    (``reciprocity.py:83-98``)."""
    _require_directed(g)
    # the reference computes (|E| − |undirected(E)|)·2 / |E|: a mutual
    # NON-LOOP pair collapses 2→1 and contributes 2 reciprocated edges; a
    # self-loop collapses 1→1 and contributes 0 (though it still counts in
    # the denominator) — so loops are excluded from the numerator only
    e = g.edges.select(SRC, DST).distinct()
    nl = e.filter(F.col(SRC) != F.col(DST))
    rev = nl.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    row = (nl.join(rev, [SRC, DST], "left_semi")
           .agg(F.count(F.lit(1)).alias("mutual"))
           .crossJoin(e.agg(F.count(F.lit(1)).alias("total")))
           .collect()[0])
    if row["total"] == 0:
        raise ValueError("Not defined for empty graphs "
                         "(reference raises NetworkXError)")
    return row["mutual"] / row["total"]


def reciprocity(g: Graph, nodes: DataFrame | None = None) -> DataFrame:
    """(id, reciprocity) per node: 2·|mutual incident pairs| /
    |in ∪ out neighborhood pairs counted with direction|
    (``reciprocity.py:30-55``: ``overlap/total`` with
    ``total = |pred| + |succ|`` and ``overlap`` counting both directions
    of each mutual pair).  Vertices with no incident edges get NULL —
    the reference raises per-node; a row form keeps them distinguishable.
    """
    _require_directed(g)
    e = g.edges.select(SRC, DST).distinct()
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    mutual = e.join(rev, [SRC, DST], "left_semi")
    m_cnt = (mutual.select(F.col(SRC).alias(ID))
             .unionAll(mutual.select(F.col(DST).alias(ID)))
             .groupBy(ID).agg(F.count("*").alias("_m")))
    t_cnt = (e.select(F.col(SRC).alias(ID))
             .unionAll(e.select(F.col(DST).alias(ID)))
             .groupBy(ID).agg(F.count("*").alias("_t")))
    base = nodes if nodes is not None else g.vertices()
    return (base.join(t_cnt, ID, "left").join(m_cnt, ID, "left")
            .select(ID, (F.coalesce(F.col("_m"), F.lit(0)) / F.col("_t"))
                    .alias("reciprocity")))

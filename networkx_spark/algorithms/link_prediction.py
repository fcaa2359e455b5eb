"""Link-prediction indices as DataFrame joins.

Semantics follow the reference ``networkx/algorithms/link_prediction.py``:

* ``resource_allocation_index`` (``link_prediction.py:52``):
  RA(u,v) = Σ_{w ∈ CN(u,v)} 1/deg(w)
* ``jaccard_coefficient`` (``link_prediction.py:115``):
  J(u,v) = |CN(u,v)| / |N(u) ∪ N(v)|
* ``adamic_adar_index`` (``link_prediction.py:180``):
  AA(u,v) = Σ_{w ∈ CN(u,v)} 1/log(deg(w))
* ``preferential_attachment`` (``link_prediction.py:352``):
  PA(u,v) = deg(u) · deg(v)

All four are undirected-only in the reference
(``@not_implemented_for("directed")``); this module raises likewise.

Physical strategy — the reference iterates a Python generator per pair;
here each index is a constant number of shuffles independent of pair count:

* an explicit ``pairs`` DataFrame (u, v) is scored with two neighbor joins
  (u-side expansion, v-side semi-join) + one groupBy — work bounded by
  Σ deg(u) over the pairs, never by |V|².
* ``pairs=None`` deviates deliberately from the reference's "all non-edges"
  default (O(|V|²) rows — the anti-scale path): the candidate set is the
  wedge closure (all non-adjacent pairs with ≥1 common neighbor), i.e.
  exactly the pairs with a non-zero RA/AA/Jaccard score.  For
  ``preferential_attachment`` — non-zero on *every* pair — ``pairs`` is
  required.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID

U, V, W = "u", "v", "_w"


def _require_undirected(g: Graph, fn: str) -> None:
    if g.directed:
        raise ValueError(
            f"{fn} is not implemented for directed graphs "
            "(reference @not_implemented_for('directed')); "
            "use g.to_undirected() first")


def _adj(g: Graph) -> DataFrame:
    """Distinct undirected neighbor rows (a, b), self-loops dropped — the
    neighbor-SET view the reference's ``G[u]`` iteration sees."""
    return (g.symmetrized()
            .filter(F.col(SRC) != F.col(DST))
            .select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
            .distinct())


def _neighbor_set_sizes(adj: DataFrame) -> DataFrame:
    return adj.groupBy(F.col("a").alias(ID)).agg(F.count("*").alias("deg"))


def candidate_pairs(g: Graph) -> DataFrame:
    """Non-adjacent pairs (u < v) sharing ≥1 neighbor — the wedge closure.

    One self-join on the shared endpoint (Σ deg² wedge work, same bound as
    the triangle kernel) + an anti-join against the edge set.
    """
    _require_undirected(g, "candidate_pairs")
    adj = _adj(g)
    l, r = adj.alias("l"), adj.alias("r")
    wedges = (l.join(r, (F.col("l.a") == F.col("r.a")) & (F.col("l.b") < F.col("r.b")))
              .select(F.col("l.b").alias(U), F.col("r.b").alias(V))
              .distinct())
    ue = adj.filter(F.col("a") < F.col("b")).select(
        F.col("a").alias(U), F.col("b").alias(V))
    return wedges.join(ue, [U, V], "anti")


def _common_neighbors(adj: DataFrame, pairs: DataFrame) -> DataFrame:
    """(u, v, w) rows: w ∈ N(u) ∩ N(v) for each candidate pair."""
    nu = adj.select(F.col("a").alias(U), F.col("b").alias(W))
    nv = adj.select(F.col("a").alias(V), F.col("b").alias(W))
    return (pairs.join(nu, U)
            .join(nv, [V, W], "semi")
            .filter((F.col(W) != F.col(U)) & (F.col(W) != F.col(V))))


def _pairs_or_candidates(g: Graph, pairs: Optional[DataFrame]) -> DataFrame:
    if pairs is not None:
        return pairs.select(F.col(pairs.columns[0]).alias(U),
                            F.col(pairs.columns[1]).alias(V))
    return candidate_pairs(g)


def resource_allocation_index(g: Graph, pairs: Optional[DataFrame] = None) -> DataFrame:
    """(u, v, score) with RA(u,v) = Σ 1/deg(w) over common neighbors w
    (``link_prediction.py:52``)."""
    _require_undirected(g, "resource_allocation_index")
    adj = _adj(g)
    deg = _neighbor_set_sizes(adj).withColumnRenamed(ID, W)
    cn = _common_neighbors(adj, _pairs_or_candidates(g, pairs))
    return (cn.join(deg, W)
            .groupBy(U, V)
            .agg(F.sum(F.lit(1.0) / F.col("deg")).alias("score")))


def adamic_adar_index(g: Graph, pairs: Optional[DataFrame] = None,
                      cn: Optional[DataFrame] = None) -> DataFrame:
    """(u, v, score) with AA(u,v) = Σ 1/log(deg(w))
    (``link_prediction.py:180``).  deg(w) = 1 (log 0) cannot occur: a common
    neighbor has ≥ 2 neighbors by construction.  ``cn`` lets callers reuse
    a cached :func:`_common_neighbors` table across several indices (the
    wedge expansion dominates the cost)."""
    _require_undirected(g, "adamic_adar_index")
    adj = _adj(g)
    deg = _neighbor_set_sizes(adj).withColumnRenamed(ID, W)
    if cn is None:
        cn = _common_neighbors(adj, _pairs_or_candidates(g, pairs))
    return (cn.join(deg, W)
            .groupBy(U, V)
            .agg(F.sum(F.lit(1.0) / F.log(F.col("deg"))).alias("score")))


def jaccard_coefficient(g: Graph, pairs: Optional[DataFrame] = None,
                        cn: Optional[DataFrame] = None) -> DataFrame:
    """(u, v, score) with J(u,v) = |CN| / |N(u) ∪ N(v)|
    (``link_prediction.py:115``; union size via inclusion-exclusion on the
    neighbor-SET sizes, so self-loops and parallel edges never double-count).
    ``cn`` as in :func:`adamic_adar_index`."""
    _require_undirected(g, "jaccard_coefficient")
    adj = _adj(g)
    deg = _neighbor_set_sizes(adj)
    if cn is None:
        cn = _common_neighbors(adj, _pairs_or_candidates(g, pairs))
    cn = cn.groupBy(U, V).agg(F.count("*").alias("_cn"))
    du = deg.select(F.col(ID).alias(U), F.col("deg").alias("_du"))
    dv = deg.select(F.col(ID).alias(V), F.col("deg").alias("_dv"))
    return (cn.join(du, U).join(dv, V)
            .select(U, V, (F.col("_cn") /
                           (F.col("_du") + F.col("_dv") - F.col("_cn")))
                    .alias("score")))


def preferential_attachment(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score) with PA(u,v) = deg(u)·deg(v)
    (``link_prediction.py:352``).  ``pairs`` is required: PA is non-zero on
    every non-edge, so the reference's all-non-edges default is O(|V|²) —
    callers at scale must bring a bounded candidate set.  Uses the
    reference's ``G.degree`` (self-loops count twice), not the neighbor-set
    size."""
    _require_undirected(g, "preferential_attachment")
    p = pairs.select(F.col(pairs.columns[0]).alias(U),
                     F.col(pairs.columns[1]).alias(V))
    deg = g.degrees()
    du = deg.select(F.col(ID).alias(U), F.col("degree").alias("_du"))
    dv = deg.select(F.col(ID).alias(V), F.col("degree").alias("_dv"))
    return (p.join(du, U).join(dv, V)
            .select(U, V, (F.col("_du") * F.col("_dv")).cast("double").alias("score")))


def cn_soundarajan_hopcroft(g: Graph, communities: DataFrame,
                            pairs: Optional[DataFrame] = None) -> DataFrame:
    """(u, v, score): common neighbors + a bonus per common neighbor in
    the SAME community as both endpoints — reference
    ``link_prediction.py:263`` (``cn_soundarajan_hopcroft``).
    ``communities`` is (id, community); score = |CN| + Σ_{w∈CN} f(w)
    where f(w) = 1 iff community(u) == community(v) == community(w)."""
    _require_undirected(g, "cn_soundarajan_hopcroft")
    adj = _adj(g)
    p = _pairs_or_candidates(g, pairs)
    com = communities.select(
        F.col(communities.columns[0]).alias("_id"),
        F.col(communities.columns[1]).alias("_c"))
    cu = com.select(F.col("_id").alias(U), F.col("_c").alias("_cu"))
    cv = com.select(F.col("_id").alias(V), F.col("_c").alias("_cv"))
    cw = com.select(F.col("_id").alias(W), F.col("_c").alias("_cw"))
    cn = _common_neighbors(adj, p)
    scored = (cn.join(cu, U).join(cv, V).join(cw, W)
              .groupBy(U, V)
              .agg((F.count("*")
                    + F.sum(((F.col("_cu") == F.col("_cv"))
                             & (F.col("_cw") == F.col("_cu"))).cast("long")))
                   .alias("score")))
    return (p.join(scored, [U, V], "left")
            .select(U, V, F.coalesce("score", F.lit(0)).alias("score")))


def within_inter_cluster(g: Graph, communities: DataFrame, delta: float = 0.001,
                         pairs: Optional[DataFrame] = None) -> DataFrame:
    """(u, v, score): within-cluster common neighbors over inter-cluster
    ones — reference ``link_prediction.py:433`` (``within_inter_cluster``;
    score = |W| / (|CN − W| + δ) when community(u) == community(v), else
    0; the reference raises for δ ≤ 0)."""
    _require_undirected(g, "within_inter_cluster")
    if delta <= 0:
        raise ValueError("Delta must be greater than zero")
    adj = _adj(g)
    p = _pairs_or_candidates(g, pairs)
    com = communities.select(
        F.col(communities.columns[0]).alias("_id"),
        F.col(communities.columns[1]).alias("_c"))
    cu = com.select(F.col("_id").alias(U), F.col("_c").alias("_cu"))
    cv = com.select(F.col("_id").alias(V), F.col("_c").alias("_cv"))
    cw = com.select(F.col("_id").alias(W), F.col("_c").alias("_cw"))
    cn = _common_neighbors(adj, p)
    counts = (cn.join(cu, U).join(cv, V).join(cw, W)
              .groupBy(U, V, "_cu", "_cv")
              .agg(F.sum((F.col("_cw") == F.col("_cu")).cast("long")).alias("_win"),
                   F.count("*").alias("_cn")))
    scored = counts.select(
        U, V,
        F.when(F.col("_cu") != F.col("_cv"), F.lit(0.0))
         .otherwise(F.round(F.col("_win") / (F.col("_cn") - F.col("_win")
                                             + F.lit(delta)), 6)).alias("score"))
    return (p.join(scored, [U, V], "left")
            .select(U, V, F.coalesce("score", F.lit(0.0)).alias("score")))

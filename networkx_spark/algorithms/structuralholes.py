"""Structural holes: Burt's effective size and constraint.

Reference ``networkx/algorithms/structuralholes.py``:
``effective_size`` (``:53``) — ES(u) = Σ_{v∈N(u)} [1 − Σ_w p_uw·m_vw]
(redundancy form, ``:133-139``); for unweighted undirected graphs the
reference switches to Borgatti's simplification ``deg − 2·ties/deg``
(``:144-151``), which is algebraically IDENTICAL to the general form
there (p_uw = 1/deg(u), m_vw = [vw ∈ E], so Σ_v Σ_w p·m =
2·triangles(u)/deg(u)) — this engine always evaluates the general form.
``constraint`` (``:166``) — C(u) = Σ_{v∈N(u)} ℓ(u,v) with
ℓ(u,v) = (p_uv + Σ_w p_uw·p_wv)² (``local_constraint``, ``:227-283``).

Definitions ride the **mutual-weight table** mw(u,v) = w(u→v) + w(v→u)
(``:9-28``), normalized per-ego by sum (p) or by max (m) (``:32-49``);
neighborhoods are ``all_neighbors`` = predecessors ∪ successors.

Spark shape: mw is one union + groupBy; p and m are window-free
groupBy+join normalizations; the redundancy / indirect-constraint sums
are wedge joins (ego ⋈ p ⋈ m on the shared middle vertex) — Σ deg²
work, the same class as square clustering, all JVM-side.  NaN follows
the reference's rule exactly (``:146,216``): a vertex with no
SUCCESSORS (``len(G[v]) == 0``) scores NaN — in a directed graph that
includes vertices that still have predecessors.  (Corner divergence:
a vertex whose only edge is a self-loop gets NaN here; the reference
computes a value from the self-mutual weight.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID

def _nan():
    # built lazily: F.lit needs an active SparkContext at call time
    return F.lit(float("nan"))


def _mutual_weights(g: Graph, weight: Optional[str]) -> DataFrame:
    """(src, dst, mw): mutual weight per unordered neighbor pair, one row
    per direction.  For undirected graphs the reference's a_uv + a_vu =
    2w scales every entry of an ego's row equally, so it cancels in both
    the sum- and max-normalizations — the symmetrized weight itself is
    used."""
    w = (F.col(WEIGHT) if weight else F.lit(1.0)).cast("double").alias("w")
    e = g.edges.filter(F.col(SRC) != F.col(DST))
    both = (e.select(F.col(SRC), F.col(DST), w)
            .unionByName(e.select(F.col(DST).alias(SRC),
                                  F.col(SRC).alias(DST), w)))
    agg = both.groupBy(SRC, DST).agg(F.sum("w").alias("mw"))
    if not g.directed:
        # canonical undirected rows appear once per direction already
        agg = both.groupBy(SRC, DST).agg(F.max("w").alias("mw"))
    return agg


def _normalized(mw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """p (sum-normalized) and m (max-normalized) mutual weights."""
    sums = mw.groupBy(SRC).agg(F.sum("mw").alias("_s"), F.max("mw").alias("_m"))
    j = mw.join(sums, SRC)
    p = j.select(SRC, DST, (F.col("mw") / F.col("_s")).alias("p"))
    m = j.select(SRC, DST, (F.col("mw") / F.col("_m")).alias("m"))
    return p, m


def _has_successors(g: Graph) -> DataFrame:
    """(id, _has) for vertices with at least one successor — the
    reference's ``len(G[v]) != 0`` NaN guard (``:146,216``); undirected
    canonical edges count both endpoints."""
    s = g.edges.select(F.col(SRC).alias(ID))
    if not g.directed:
        s = s.union(g.edges.select(F.col(DST).alias(ID)))
    return s.distinct().withColumn("_has", F.lit(1))


def effective_size(g: Graph, weight: Optional[str] = None) -> DataFrame:
    """(id, effective_size) for every vertex (``structuralholes.py:53``).
    NaN for isolated vertices."""
    mw = _mutual_weights(g, weight).cache()
    p, m = _normalized(mw)
    # redundancy of v in u's network: Σ_w p(u,w)·m(v,w); the wedge join
    # below pairs every neighbor v of u with every shared contact w
    nbr = mw.select(F.col(SRC).alias("u"), F.col(DST).alias("v"))
    red = (nbr
           .join(p.select(F.col(SRC).alias("u"), F.col(DST).alias("w"),
                          "p"), "u")
           .join(m.select(F.col(SRC).alias("v"), F.col(DST).alias("w"),
                          "m"), ["v", "w"])
           .groupBy("u", "v").agg(F.sum(F.col("p") * F.col("m")).alias("r")))
    es = (nbr.join(red, ["u", "v"], "left")
          .groupBy("u")
          .agg(F.sum(F.lit(1.0) - F.coalesce("r", F.lit(0.0)))
               .alias("effective_size")))
    out = (g.vertices().join(es.withColumnRenamed("u", ID), ID, "left")
           .join(_has_successors(g), ID, "left")
           .select(ID, F.when(F.col("_has").isNull(), _nan())
                   .otherwise(F.coalesce("effective_size", _nan()))
                   .alias("effective_size")))
    mw.unpersist()
    return out


def constraint(g: Graph, weight: Optional[str] = None) -> DataFrame:
    """(id, constraint) for every vertex (``structuralholes.py:166``).
    NaN for isolated vertices."""
    mw = _mutual_weights(g, weight).cache()
    p, _ = _normalized(mw)
    p = p.cache()
    ind = (p.select(F.col(SRC).alias("u"), F.col(DST).alias("w"),
                    F.col("p").alias("p_uw"))
           .join(p.select(F.col(SRC).alias("w"), F.col(DST).alias("v"),
                          F.col("p").alias("p_wv")), "w")
           .groupBy("u", "v")
           .agg(F.sum(F.col("p_uw") * F.col("p_wv")).alias("ind")))
    # ℓ(u,v) summed over v ∈ N(u): the p rows ARE the neighbor pairs
    lc = (p.select(F.col(SRC).alias("u"), F.col(DST).alias("v"), "p")
          .join(ind, ["u", "v"], "left")
          .select("u", ((F.col("p") + F.coalesce("ind", F.lit(0.0))) ** 2)
                  .alias("l")))
    con = lc.groupBy("u").agg(F.sum("l").alias("constraint"))
    out = (g.vertices().join(con.withColumnRenamed("u", ID), ID, "left")
           .join(_has_successors(g), ID, "left")
           .select(ID, F.when(F.col("_has").isNull(), _nan())
                   .otherwise(F.coalesce("constraint", _nan()))
                   .alias("constraint")))
    p.unpersist()
    mw.unpersist()
    return out

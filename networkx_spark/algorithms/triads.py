"""Triadic census of a directed graph.

Reference ``networkx/algorithms/triads.py:133`` (``triadic_census``,
Batagelj & Mrvar's subquadratic algorithm): count how many of the 16
isomorphism classes of 3-vertex digraphs occur as (induced) triads.  The
``TRICODES`` table below is the published Batagelj–Mrvar encoding (their
paper, http://vlado.fmf.uni-lj.si/pub/networks/doc/triads/triads.pdf;
the reference embeds the same constants at ``triads.py:26-91``): the six
possible arcs among an ordered triple (v, u, w) form a 6-bit code, and
codes that are isomorphic up to permutation share a class.

Distributed shape (same asymptotics as the reference, O(m·d̄) not O(n³)):

1. dyad table — each connected unordered pair once, with mutual/asym
   flags (one groupBy over the edge table);
2. connected triads — triples with ≥ 2 connected pairs enumerated as
   wedges of the support (undirected) adjacency, deduped by sorted
   triple, classified by joining the three pair-flag rows (the 6-bit
   code), one groupBy;
3. single-dyad triads — closed form per connected pair (a, b):
   ``n − deg(a) − deg(b) + common(a, b)`` third vertices touch neither
   endpoint (degrees and common-neighbor counts from the same wedge
   table) — summed separately over mutual pairs (→ "102") and asym
   pairs (→ "012");
4. null triads — ``C(n,3)`` minus everything else.

Self-loops are dropped (triad types are defined on simple digraphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID

# Batagelj–Mrvar 6-bit code → triad class (public constants; reference
# triads.py:26-105, original in the paper cited in the module docstring)
TRICODES = (
    1, 2, 2, 3, 2, 4, 6, 8, 2, 6, 5, 7, 3, 8, 7, 11, 2, 6, 4, 8, 5, 9, 9,
    13, 6, 10, 9, 14, 7, 14, 12, 15, 2, 5, 6, 7, 6, 9, 10, 14, 4, 9, 9,
    12, 8, 13, 14, 15, 3, 7, 8, 11, 7, 12, 14, 15, 8, 14, 13, 15, 11, 15,
    15, 16,
)
TRIAD_NAMES = ("003", "012", "102", "021D", "021U", "021C", "111D", "111U",
               "030T", "030C", "201", "120D", "120U", "120C", "210", "300")
TRICODE_TO_NAME = {i: TRIAD_NAMES[code - 1] for i, code in enumerate(TRICODES)}


def triadic_census(g: Graph) -> DataFrame:
    """(triad_type, count) — one row per the 16 classes, zeros included
    (``triads.py:133``).  Directed graphs only, like the reference."""
    if not g.directed:
        raise ValueError("triadic_census is not defined for undirected "
                         "graphs (reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    e = (g.edges.filter(F.col(SRC) != F.col(DST))
         .select(SRC, DST).distinct())

    # dyads: one row per connected unordered pair, mutual/asym flags
    dyads = (e.select(F.least(SRC, DST).alias("a"),
                      F.greatest(SRC, DST).alias("b"),
                      (F.col(SRC) < F.col(DST)).alias("_f"))
             .groupBy("a", "b")
             .agg(F.max(F.when(F.col("_f"), 1).otherwise(0)).alias("fwd"),
                  F.max(F.when(~F.col("_f"), 1).otherwise(0)).alias("rev"))
             ).cache()

    n = g.number_of_vertices()
    sym = (dyads.select(F.col("a").alias(ID), F.col("b").alias("nbr"))
           .unionByName(dyads.select(F.col("b").alias(ID),
                                     F.col("a").alias("nbr")))).cache()
    deg = sym.groupBy(ID).agg(F.count("*").alias("deg"))

    # wedges of the support graph: center c, endpoints x < y
    wedges = (sym.select(F.col(ID).alias("c"), F.col("nbr").alias("x"))
              .join(sym.select(F.col(ID).alias("c2"), F.col("nbr").alias("y")),
                    F.col("c") == F.col("c2"))
              .filter(F.col("x") < F.col("y"))
              .select("c", "x", "y")).cache()

    # ---- triples with >= 2 connected pairs, classified by 6-bit code
    trip = (wedges
            .select(F.array_sort(F.array("c", "x", "y")).alias("t"))
            .select(F.col("t")[0].alias("t1"), F.col("t")[1].alias("t2"),
                    F.col("t")[2].alias("t3"))
            .distinct())

    def pair(tA, tB, fbit, rbit, tag):
        return (dyads.select(F.col("a").alias(tA), F.col("b").alias(tB),
                             (F.col("fwd") * fbit
                              + F.col("rev") * rbit).alias(tag)))

    coded = (trip
             .join(pair("t1", "t2", 1, 2, "_c12"), ["t1", "t2"], "left")
             .join(pair("t1", "t3", 4, 8, "_c13"), ["t1", "t3"], "left")
             .join(pair("t2", "t3", 16, 32, "_c23"), ["t2", "t3"], "left")
             .select((F.coalesce("_c12", F.lit(0))
                      + F.coalesce("_c13", F.lit(0))
                      + F.coalesce("_c23", F.lit(0))).alias("code")))
    name_map = spark.createDataFrame(
        [(c, TRICODE_TO_NAME[c]) for c in range(64)], "code int, triad_type string")
    connected = (coded.join(F.broadcast(name_map), "code")
                 .groupBy("triad_type").agg(F.count("*").alias("count")))

    # ---- single-dyad triads: per connected pair, third vertices adjacent
    # to neither endpoint = n − deg(a) − deg(b) + common(a, b)
    common = wedges.groupBy(F.col("x").alias("a"), F.col("y").alias("b")) \
        .agg(F.count("*").alias("com"))
    per_pair = (dyads
                .join(common, ["a", "b"], "left")
                .join(deg.select(F.col(ID).alias("a"), F.col("deg").alias("_da")), "a")
                .join(deg.select(F.col(ID).alias("b"), F.col("deg").alias("_db")), "b")
                .select("fwd", "rev",
                        (F.lit(n) - F.col("_da") - F.col("_db")
                         + F.coalesce("com", F.lit(0))).alias("iso3")))
    row = per_pair.agg(
        F.sum(F.when((F.col("fwd") == 1) & (F.col("rev") == 1),
                     F.col("iso3")).otherwise(F.lit(0))).alias("c102"),
        F.sum(F.when((F.col("fwd") + F.col("rev")) == 1,
                     F.col("iso3")).otherwise(F.lit(0))).alias("c012"),
    ).collect()[0]
    c102, c012 = int(row["c102"] or 0), int(row["c012"] or 0)

    counts = {r["triad_type"]: int(r["count"]) for r in connected.collect()}
    counts["102"] = counts.get("102", 0) + c102
    counts["012"] = counts.get("012", 0) + c012
    total = n * (n - 1) * (n - 2) // 6
    counts["003"] = total - sum(counts.values())
    for nm in TRIAD_NAMES:
        counts.setdefault(nm, 0)

    for df in (dyads, sym, wedges):
        df.unpersist()
    return spark.createDataFrame(
        [(nm, counts[nm]) for nm in TRIAD_NAMES],
        "triad_type string, count long")

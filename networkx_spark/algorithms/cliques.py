"""Maximal-clique enumeration and k-clique (percolation) communities.

Reference: ``networkx/algorithms/clique.py:17`` (``find_cliques`` —
Bron–Kerbosch with pivoting) and
``networkx/algorithms/community/kclique.py:8`` (``k_clique_communities``
— Palla clique percolation: maximal cliques of size ≥ k are adjacent
when they share ≥ k−1 vertices; communities are unions of percolation
components).

Spark shape (parallel Bron–Kerbosch by vertex ordering, the standard
distributed formulation):

1. fix a total vertex order (degree, then id) — the same orientation
   trick that bounds the triangle wedge join;
2. for every center c ship the induced subgraph of its FULL neighborhood
   N(c) (a wedge join, Σ_c |E(N(c))| rows — the triangle-count envelope)
   to one ``applyInPandas`` group;
3. per group, run pivoted Bron–Kerbosch with R={c}, P=N⁺(c), X=N⁻(c):
   every maximal clique of G is emitted EXACTLY ONCE, by its
   minimum-order member — no global dedup pass needed.

The per-center recursion is Python, but each group is a vertex
neighborhood (web-graph neighborhoods are small; the wedge join itself
is the same cost ceiling as ``triangles.py``), and groups run
Arrow-batched across all executors.

Percolation adjacency: two cliques share ≥ k−1 vertices iff they share
some (k−1)-subset, so cliques are joined on exploded sorted
(k−1)-subset keys (C(|c|, k−1) rows per clique — bounded by
``max_clique_size``) and the clique-overlap graph's connected
components are the communities.
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.algorithms.components import connected_components


def _ordered_neighborhoods(g: Graph):
    """(center, u, v, u_after, v_after) rows: the induced edges of every
    center's neighborhood, each endpoint flagged as ordered after the
    center; plus (center, u, NULL, u_after, NULL) member rows so leaves
    without internal edges still reach the group."""
    spark = g.edges.sparkSession
    sym = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).cast("string").alias(SRC),
                   F.col(DST).cast("string").alias(DST)).distinct())
    deg = sym.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("_d"))
    rank = deg.select(ID, F.struct(F.col("_d"), F.col(ID)).alias("_r"))
    m = (sym.select(F.col(SRC).alias("c"), F.col(DST).alias("u"))
         .join(rank.select(F.col(ID).alias("c"),
                           F.col("_r").alias("_rc")), "c")
         .join(rank.select(F.col(ID).alias("u"),
                           F.col("_r").alias("_ru")), "u")
         .select("c", "u", (F.col("_ru") > F.col("_rc")).alias("u_after")))
    edges_in = (m.select("c", F.col("u").alias(SRC), "u_after")
                .join(sym, SRC)
                .join(m.select("c", F.col("u").alias(DST),
                               F.col("u_after").alias("v_after")),
                      ["c", DST])
                .select("c", F.col(SRC).alias("u"), F.col(DST).alias("v"),
                        "u_after", "v_after"))
    members = m.select("c", "u", F.lit(None).cast("string").alias("v"),
                       "u_after", F.lit(None).cast("boolean").alias("v_after"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return members.unionByName(edges_in).repartition(n_part, "c")


def _bk_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pivoted Bron–Kerbosch for one center: R={c}, P=N⁺(c), X=N⁻(c)."""
    c = pdf["c"].iloc[0]
    after = {}
    adj: dict[str, set[str]] = {}
    for u, ua in zip(pdf["u"], pdf["u_after"]):
        after[u] = bool(ua)
        adj.setdefault(u, set())
    for u, v in zip(pdf["u"], pdf["v"]):
        if v is not None and not (isinstance(v, float) and pd.isna(v)):
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    P = {u for u, aft in after.items() if aft}
    X = {u for u, aft in after.items() if not aft}
    out: list[list[str]] = []

    def bk(R: set, P: set, X: set) -> Iterator[None]:
        if not P and not X:
            out.append(sorted(R))
            return
        pivot = max(P | X, key=lambda u: len(adj.get(u, set()) & P))
        for v in list(P - adj.get(pivot, set())):
            nv = adj.get(v, set())
            bk(R | {v}, P & nv, X & nv)
            P.discard(v)
            X.add(v)

    bk({c}, P, X)
    # dtype=object keeps empty frames as list<string>, not float64
    return pd.DataFrame({"clique": pd.Series(out, dtype=object)})


def find_cliques(g: Graph) -> DataFrame:
    """(clique array<string>) — every maximal clique, sorted members,
    each exactly once (``clique.py:17`` semantics; undirected only like
    the reference's ``@not_implemented_for('directed')``)."""
    if g.directed:
        raise ValueError("find_cliques not defined for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    grouped = _ordered_neighborhoods(g)
    cliques = grouped.groupBy("c").applyInPandas(
        _bk_group, "clique array<string>")
    # isolated vertices: singleton maximal cliques, absent from adjacency
    iso = (g.vertices()
           .join(g.symmetrized().select(F.col(SRC).alias(ID)).distinct(),
                 ID, "anti")
           .select(F.array(F.col(ID).cast("string")).alias("clique")))
    return cliques.unionByName(iso)


def k_clique_communities(g: Graph, k: int,
                         max_clique_size: int = 64) -> DataFrame:
    """(id, community) — Palla k-clique percolation
    (``community/kclique.py:8``); community = min clique-member id of the
    percolation component.  Vertices in no size-≥k clique are absent,
    like the reference (its communities only cover percolating nodes)."""
    if k < 2:
        raise ValueError(f"k={k}, k must be greater than 1 "
                         "(reference NetworkXError)")
    spark = g.edges.sparkSession
    cl = (find_cliques(g)
          .filter(F.size("clique") >= k)
          .withColumn("_cid", F.md5(F.to_json(F.col("clique")))))
    cl = cl.cache()
    if cl.limit(1).count() == 0:
        return spark.createDataFrame([], "id string, community string")
    big = cl.filter(F.size("clique") > max_clique_size).limit(1).count()
    if big:
        raise ValueError(
            f"a maximal clique exceeds max_clique_size={max_clique_size}; "
            "the (k-1)-subset explosion would be combinatorial — raise the "
            "cap explicitly if the clique size distribution allows it")

    @F.pandas_udf("array<string>")
    def subsets(cliques: pd.Series) -> pd.Series:
        return cliques.apply(lambda c: ["\x00".join(s)
                                        for s in combinations(c, k - 1)])

    keyed = cl.select("_cid", "clique",
                      F.explode(subsets(F.col("clique"))).alias("_sub"))
    pairs = (keyed.select(F.col("_sub"), F.col("_cid").alias("a"))
             .join(keyed.select(F.col("_sub"), F.col("_cid").alias("b")),
                   "_sub")
             .filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    cg = Graph(pairs.select(F.col("a").alias(SRC), F.col("b").alias(DST)),
               directed=False,
               vertices=cl.select(F.col("_cid").alias(ID)))
    comp = connected_components(cg)
    # label = the percolation component id (min clique-hash): communities
    # OVERLAP in CPM (a hub vertex percolates in several), so a
    # min-member label would collide across distinct communities
    return (cl.join(comp, cl["_cid"] == comp[ID])
            .select(F.col("component").alias("community"),
                    F.explode("clique").alias("id"))
            .select("id", "community").distinct())

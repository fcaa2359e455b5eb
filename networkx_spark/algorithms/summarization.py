"""Graph summarization — dedensification (hub-edge compression).

Reference: ``networkx/algorithms/summarization.py:69`` (``dedensify``,
Maccioni & Abadi KDD'16): nodes sharing an identical set H of
high-degree neighbors (degree > threshold; in-degree when directed) get
one compressor node c — their |S|·|H| hub edges become |S| + |H| edges
(S→c, c→H), applied only when that is an actual reduction.  Exactly the
web-graph hub problem (every page linking the same navigation hubs), and
exactly a groupBy problem:

1. one aggregation finds high-degree nodes;
2. one sorted-collect per source builds its high-neighbor set signature
   (md5 of the sorted list — the reference names compressors by
   frozenset iteration order, which is nondeterministic across runs;
   the signature is the same grouping, deterministically named);
3. one groupBy on the signature sizes each candidate group, the
   |S|·|H| > |S|+|H| test picks the winners, and the rewrite is two
   anti-joins + two projections.

No iteration, no driver state: dedensification is 4 shuffles end-to-end
at any scale.  Vertex ids widen to strings because compressor nodes are
new synthetic vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID, WEIGHT


def dedensify(g: Graph, threshold: int) -> tuple[DataFrame, DataFrame]:
    """Returns ``(edges, compressors)``: the rewritten edge table
    (src, dst — string-typed; undirected graphs canonicalized u < v) and
    the compressor table (compressor, n_sources, n_hubs).  Raises for
    ``threshold < 2`` like the reference (``summarization.py:173``)."""
    if threshold < 2:
        raise ValueError("The degree threshold must be >= 2")
    s = F.col(SRC).cast("string")
    d = F.col(DST).cast("string")
    if g.directed:
        edges = g.edges.select(s.alias("u"), d.alias("v")).distinct()
        hdeg = edges.groupBy(F.col("v").alias(ID)).agg(F.count("*").alias("_d"))
    else:
        edges = (g.symmetrized().select(s.alias("u"), d.alias("v"))
                 .filter(F.col("u") != F.col("v")).distinct())
        hdeg = edges.groupBy(F.col("v").alias(ID)).agg(F.count("*").alias("_d"))
    high = hdeg.filter(F.col("_d") > threshold).select(F.col(ID).alias("v"))

    # per-source signature over its high-degree neighbor set
    hnbrs = edges.join(F.broadcast(high), "v")
    sig = (hnbrs.groupBy("u")
           .agg(F.md5(F.array_join(F.array_sort(F.collect_list("v")), "|"))
                .alias("sig"),
                F.count("*").alias("_nh")))
    groups = (sig.groupBy("sig")
              .agg(F.count("*").alias("n_sources"),
                   F.first("_nh").alias("n_hubs")))
    winners = (groups.filter(F.col("n_hubs") * F.col("n_sources")
                             > F.col("n_hubs") + F.col("n_sources"))
               .select("sig", "n_sources", "n_hubs"))
    comp_of = (sig.join(F.broadcast(winners.select("sig")), "sig")
               .select("u", F.concat(F.lit("C_"), F.col("sig")).alias("comp")))

    # drop every source→hub edge of a winning group, wire S→c and c→H;
    # removal happens on CANONICAL edges for undirected graphs — an
    # anti-join on directed rows would let the surviving mirror row
    # resurrect the removed edge after canonicalization
    removal = comp_of.join(hnbrs, "u").select("u", "v")
    if g.directed:
        base, rem = edges, removal
    else:
        base = (edges.select(F.least("u", "v").alias("u"),
                             F.greatest("u", "v").alias("v")).distinct())
        rem = (removal.select(F.least("u", "v").alias("u"),
                              F.greatest("u", "v").alias("v")).distinct())
    kept = base.join(rem, ["u", "v"], "anti")
    to_comp = comp_of.select("u", F.col("comp").alias("v")).distinct()
    from_comp = (comp_of.join(hnbrs, "u")
                 .select(F.col("comp").alias("u"), "v").distinct())
    out = kept.unionByName(to_comp).unionByName(from_comp)
    comps = (winners.select(F.concat(F.lit("C_"), F.col("sig"))
                            .alias("compressor"), "n_sources", "n_hubs"))
    return (out.select(F.col("u").alias(SRC), F.col("v").alias(DST)), comps)


def moral_graph(g: Graph) -> Graph:
    """Moralized graph of a directed graph — reference
    ``networkx/algorithms/moral.py:26`` (``moral_graph``): the undirected
    skeleton plus an edge between every pair of nodes sharing a child
    ("marrying" co-parents).  One self-join of the edge table on the
    child; Σ in-deg² wedge work, the triangle shuffle class."""
    if not g.directed:
        raise ValueError("moral_graph is defined for directed graphs")
    e = g.edges.select(SRC, DST)
    marry = (e.alias("l").join(e.alias("r"),
                               (F.col(f"l.{DST}") == F.col(f"r.{DST}"))
                               & (F.col(f"l.{SRC}") < F.col(f"r.{SRC}")))
             .select(F.col(f"l.{SRC}").alias(SRC),
                     F.col(f"r.{SRC}").alias(DST)))
    und = (e.unionByName(marry)
           .select(F.least(SRC, DST).alias(SRC),
                   F.greatest(SRC, DST).alias(DST))
           .distinct())
    return Graph.from_edges(und, directed=False)


def snap_aggregation(g: Graph, node_attributes: DataFrame,
                     edge_attr: str | None = None,
                     max_iter: int = 10_000):
    """SNAP summarization — reference ``summarization.py:410``
    (``snap_aggregation``): the coarsest partition that (a) refines the
    node-attribute grouping and (b) is *stable* — every member of a group
    has edges (per edge type) into the same SET of groups.  Returns
    ``(membership, summary_edges)``: (id, supernode) with supernode = the
    group's minimum member id (the reference's ``Supernode-i`` names are
    insertion-order artifacts), and the distinct (u, v) superedges.

    The reference splits one eligible group at a time; here every group
    splits simultaneously by its members' neighbor-group-set signature —
    each split either procedure makes is provably required by any stable
    refinement, so both converge to the same (unique) coarsest stable
    partition, in O(#final groups) supersteps instead of one pass per
    split.  Each superstep is one adjacency join + two hash groupBys
    (WL refinement with SET semantics, seeded by attributes)."""
    if g.directed:
        raise ValueError("snap_aggregation here targets undirected graphs")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    acols = [c for c in node_attributes.columns if c != ID]
    grp = node_attributes.select(
        ID, F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                        for c in acols])).alias("grp"))
    w = (F.col(WEIGHT).cast("string") if edge_attr == WEIGHT
         else (F.col(edge_attr).cast("string") if edge_attr else F.lit("")))
    adj = (g.symmetrized().select(F.col(SRC).alias(ID),
                                  F.col(DST).alias("nbr"), w.alias("_t"))
           .repartition(n_part, ID).cache())
    try:
        prev_n = -1
        for _ in range(max_iter):
            n_groups = grp.select("grp").distinct().count()
            if n_groups == prev_n:
                break
            prev_n = n_groups
            nbr_sig = (adj.join(grp.withColumnRenamed(ID, "nbr")
                                .withColumnRenamed("grp", "_ng"), "nbr")
                       .groupBy(ID)
                       .agg(F.md5(F.array_join(F.array_sort(F.collect_set(
                           F.concat_ws("\x1f", "_t", "_ng"))), "|"))
                           .alias("_sig")))
            grp = (grp.join(nbr_sig, ID, "left")
                   .select(ID, F.md5(F.concat_ws("\x1f", "grp",
                                                 F.coalesce("_sig", F.lit(""))))
                           .alias("grp")))
            grp = grp.localCheckpoint(eager=True)
        else:
            raise RuntimeError("snap_aggregation did not converge")
        label = grp.groupBy("grp").agg(F.min(ID).alias("supernode"))
        membership = (grp.join(label, "grp").select(ID, "supernode"))
        mu = membership.select(F.col(ID).alias(SRC),
                               F.col("supernode").alias("_gu"))
        mv = membership.select(F.col(ID).alias(DST),
                               F.col("supernode").alias("_gv"))
        sedges = (g.symmetrized().select(SRC, DST)
                  .join(mu, SRC).join(mv, DST)
                  .select(F.least("_gu", "_gv").alias("u"),
                          F.greatest("_gu", "_gv").alias("v"))
                  .distinct())
        return membership, sedges
    finally:
        adj.unpersist()

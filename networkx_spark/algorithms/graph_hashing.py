"""Weisfeiler-Lehman graph hashing — iterative neighbor-label refinement.

Reference: ``networkx/algorithms/graph_hashing.py:41``
(``weisfeiler_lehman_graph_hash``) and ``:163``
(``weisfeiler_lehman_subgraph_hashes``).  Each iteration replaces every
node's label with ``hash(label + "".join(sorted(neighbor labels)))``; the
graph hash digests the per-iteration label histograms.  Isomorphic graphs
hash identically; WL-distinguishable non-isomorphic graphs differ.

The refinement step is one adjacency join + one groupBy per iteration:
``sort_array(collect_list(neighbor label))`` reproduces the reference's
sorted concatenation exactly (lexicographic string sort in both).  Two
digest modes:

- ``digest="md5"`` (default): pure JVM column functions, whole-stage
  codegen, and an exact DuckDB twin
  (``string_agg(lbl, '' ORDER BY lbl)``) — the scale path.  The digest
  family differs from the reference's blake2b, so hex values differ, but
  the REFINEMENT is identical: the induced color partition equals the
  reference's at every iteration, and the isomorphism-invariance contract
  holds verbatim.
- ``digest="blake2b"``: byte-identical to the reference (hex-for-hex),
  via an Arrow-batched pandas hash kernel — vectorized over batches, used
  by the parity tests; slower, choose it when cross-validating against
  NetworkX outputs.

Scale posture: state is one (id, label) table per iteration; each
iteration shuffles neighbor labels once (groupBy id).  The sorted
neighbor concatenation is inherent to WL — a hot vertex with d neighbors
builds an O(d·32)-byte string, the same cost the reference pays; salt-free
because the groupBy key is the vertex id (use iterations ~ graph diameter
only; 3 is the reference default).  The graph-level digest in md5 mode is
a commutative XOR multiset hash over (label, count) pairs — computed as
one aggregation with NO global sort, so it distributes; blake2b mode
reproduces the reference's sorted-histogram string with a driver-side
collector capped by the number of DISTINCT labels (≤ V, typically ≪ V).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID

_DIGESTS = ("md5", "blake2b")


def _blake2b_hash_col(df: DataFrame, in_col: str, out_col: str) -> DataFrame:
    """Arrow-batched blake2b(digest_size=16) — the reference's digest
    (``graph_hashing.py:15``), vectorized per batch."""
    import pandas as pd

    fields = [f for f in df.schema.fields if f.name != in_col]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    schema += f", {out_col} string"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.drop(columns=[in_col])
            out[out_col] = [
                hashlib.blake2b(s.encode("ascii"), digest_size=16).hexdigest()
                for s in pdf[in_col]]
            yield out

    return df.mapInPandas(kernel, schema=schema)


def _hash_col(df: DataFrame, in_col: str, out_col: str, digest: str) -> DataFrame:
    if digest == "md5":
        return df.withColumn(out_col, F.md5(F.col(in_col))).drop(in_col)
    return _blake2b_hash_col(df, in_col, out_col)


def _init_labels(g: Graph, node_attr: Optional[str]) -> DataFrame:
    if node_attr is not None:
        from networkx_spark.attributes import get_node_attributes
        nd = get_node_attributes(g, node_attr)
        return nd.select(ID, F.col(node_attr).cast("string").alias("label"))
    return (g.degrees()
            .select(ID, F.col("degree").cast("string").alias("label")))


def wl_colors(g: Graph, iterations: int = 3, digest: str = "md5",
              node_attr: Optional[str] = None,
              include_initial: bool = False) -> DataFrame:
    """(id, depth, color): the WL color of every vertex after each of
    ``iterations`` refinement rounds (depth 1..iterations; depth 0 = the
    initial degree/attribute label when ``include_initial``) — the
    row-form of ``weisfeiler_lehman_subgraph_hashes``
    (``graph_hashing.py:163``; depth-0 rows are its
    ``include_initial_labels=True``, unhashed like the reference's
    initial labels)."""
    if digest not in _DIGESTS:
        raise ValueError(f"digest must be one of {_DIGESTS}")
    if g.directed:
        raise ValueError("wl hashing here is defined for undirected graphs; "
                         "to_undirected() first")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized().select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
           .repartition(n_part, ID).cache())
    labels = _init_labels(g, node_attr)
    out = None
    if include_initial:
        out = labels.select(ID, F.lit(0).alias("depth"),
                            F.col("label").alias("color"))
    try:
        for it in range(1, iterations + 1):
            nbr = (adj.join(labels.withColumnRenamed(ID, "nbr"), "nbr")
                   .groupBy(ID)
                   .agg(F.array_join(F.array_sort(F.collect_list("label")), "")
                        .alias("agg")))
            raw = (labels.join(nbr, ID, "left")
                   .select(ID, F.concat(F.col("label"),
                                        F.coalesce("agg", F.lit(""))).alias("raw")))
            labels = _hash_col(raw, "raw", "label", digest)
            # keep the loop shallow: iterations is 3-5 in practice, so plain
            # caching beats parquet superstep cuts here
            labels = labels.localCheckpoint(eager=True)
            lvl = labels.select(ID, F.lit(it).alias("depth"),
                                F.col("label").alias("color"))
            out = lvl if out is None else out.unionByName(lvl)
        return out
    finally:
        adj.unpersist()


def weisfeiler_lehman_subgraph_hashes(g: Graph, iterations: int = 3,
                                      digest: str = "blake2b",
                                      node_attr: Optional[str] = None,
                                      include_initial_labels: bool = False
                                      ) -> DataFrame:
    """Row-form of the reference's per-node hash lists; with
    ``digest="blake2b"`` the hex values match NetworkX byte-for-byte."""
    return wl_colors(g, iterations=iterations, digest=digest,
                     node_attr=node_attr,
                     include_initial=include_initial_labels)


def weisfeiler_lehman_graph_hash(g: Graph, iterations: int = 3,
                                 digest: str = "blake2b",
                                 node_attr: Optional[str] = None) -> str:
    """Graph-level WL hash.  ``digest="blake2b"`` reproduces the
    reference hex exactly (sorted per-iteration histograms, stringified
    as Python tuples, then blake2b — ``graph_hashing.py:152-160``); the
    distinct-label histogram is the only driver-side collection.
    ``digest="md5"`` is the fully distributed variant: one XOR multiset
    aggregation over (depth, label, count) triples, no sort, no
    collection — same invariance contract, engine-specific hex."""
    colors = wl_colors(g, iterations=iterations, digest=digest,
                       node_attr=node_attr, include_initial=False)
    hist = (colors.groupBy("depth", "color").agg(F.count("*").alias("n")))
    if digest == "md5":
        row = (hist.select(F.concat_ws(":", "depth", "color", "n").alias("s"))
               .select(F.expr("conv(substring(md5(s), 1, 15), 16, 10)")
                       .cast("long").alias("h"))
               .agg(F.expr("bit_xor(h)").alias("x")).first())
        return format((row["x"] or 0) & (2 ** 64 - 1), "016x")
    # parity mode: the reference extends one flat list across iterations,
    # each iteration's counter sorted by label
    pairs = [(int(r["depth"]), r["color"], int(r["n"]))
             for r in hist.collect()]
    flat = []
    for depth in range(1, iterations + 1):
        flat.extend(sorted((c, n) for d, c, n in pairs if d == depth))
    return hashlib.blake2b(str(tuple(flat)).encode("ascii"),
                           digest_size=16).hexdigest()

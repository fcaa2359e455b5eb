"""Cut quality metrics and partition quality.

Reference: ``networkx/algorithms/cuts.py:25`` (``cut_size``), ``:88``
(``volume``), ``:131`` (``normalized_cut_size``), ``:184``
(``conductance``), ``:232`` (``edge_expansion``) and
``networkx/algorithms/community/quality.py:259`` (``partition_quality``:
coverage = intra-community edge fraction, performance = correctly
classified pairs — intra edges + inter non-edges — over all pairs).

Every metric is a constant number of semi-join + sum aggregations over
the edge table — no iteration; the S/T membership sides are broadcast
(node subsets in cut analysis are small relative to a 10¹²-edge table;
when they are not, the join degrades gracefully to a shuffled semi-join).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID, WEIGHT


def _ids(nodes: DataFrame) -> DataFrame:
    return F.broadcast(nodes.selectExpr(f"{nodes.columns[0]} AS {ID}").distinct())


def _complement(g: Graph, s: DataFrame) -> DataFrame:
    return g.vertices().join(s, ID, "anti")


def cut_size(g: Graph, S: DataFrame, T: Optional[DataFrame] = None,
             weighted: bool = False) -> float:
    """``cuts.py:25``: Σ weights of edges from S to T (both directions
    when directed; T defaults to the complement of S)."""
    s = _ids(S)
    t = _ids(T) if T is not None else _complement(g, s)
    w = F.col(WEIGHT) if weighted else F.lit(1)
    e = g.edges if g.directed else g.symmetrized()
    fwd = (e.join(s.withColumnRenamed(ID, SRC), SRC)
           .join(t.withColumnRenamed(ID, DST), DST)
           .agg(F.sum(w)).first()[0] or 0)
    if not g.directed:
        # symmetrized rows count each S-T edge exactly once when S, T
        # are disjoint (the S->T orientation)
        return float(fwd)
    rev = (e.join(t.withColumnRenamed(ID, SRC), SRC)
           .join(s.withColumnRenamed(ID, DST), DST)
           .agg(F.sum(w)).first()[0] or 0)
    return float(fwd + rev)


def volume(g: Graph, S: DataFrame, weighted: bool = False) -> float:
    """``cuts.py:88``: Σ (out-)degrees of S."""
    s = _ids(S)
    deg = g.out_degrees(weighted=weighted)
    return float(deg.join(s, ID).agg(F.sum("degree")).first()[0] or 0)


def normalized_cut_size(g: Graph, S: DataFrame,
                        T: Optional[DataFrame] = None,
                        weighted: bool = False) -> float:
    """``cuts.py:131``: cut · (1/vol(S) + 1/vol(T))."""
    s = _ids(S)
    t = _ids(T) if T is not None else _complement(g, s)
    cut = cut_size(g, s, t, weighted)
    return cut * (1 / volume(g, s, weighted) + 1 / volume(g, t, weighted))


def conductance(g: Graph, S: DataFrame, T: Optional[DataFrame] = None,
                weighted: bool = False) -> float:
    """``cuts.py:184``: cut / min(vol(S), vol(T))."""
    s = _ids(S)
    t = _ids(T) if T is not None else _complement(g, s)
    return cut_size(g, s, t, weighted) / min(volume(g, s, weighted),
                                             volume(g, t, weighted))


def edge_expansion(g: Graph, S: DataFrame, T: Optional[DataFrame] = None,
                   weighted: bool = False) -> float:
    """``cuts.py:232``: cut / min(|S|, |T|)."""
    s = _ids(S)
    t = _ids(T) if T is not None else _complement(g, s)
    return cut_size(g, s, t, weighted) / min(s.count(), t.count())


def partition_quality(g: Graph, partition: DataFrame) -> Tuple[float, float]:
    """``community/quality.py:259`` for undirected graphs: returns
    (coverage, performance) of ``partition(id, community)``.  Raises if
    the partition does not cover every vertex exactly once."""
    if g.directed:
        raise ValueError("partition_quality here targets undirected graphs")
    lab = partition.select(ID, F.col(partition.columns[1]).alias("_c"))
    n = g.number_of_vertices()
    if lab.count() != n or lab.select(ID).distinct().count() != n:
        raise ValueError("partition is not a valid cover of G")
    e = (g.symmetrized()
         .select(F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    m = e.count()
    la = lab.select(F.col(ID).alias("a"), F.col("_c").alias("_ca"))
    lb = lab.select(F.col(ID).alias("b"), F.col("_c").alias("_cb"))
    intra = (e.join(la, "a").join(lb, "b")
             .filter(F.col("_ca") == F.col("_cb")).count())
    sizes = lab.groupBy("_c").count()
    intra_pairs = int(sizes.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2)).first()[0] or 0)
    total_pairs = n * (n - 1) // 2
    inter_non_edges = (total_pairs - intra_pairs) - (m - intra)
    coverage = intra / m if m else 1.0
    performance = (intra + inter_non_edges) / total_pairs if total_pairs else 1.0
    return coverage, performance

"""Lowest common ancestors on DAGs.

Reference: ``networkx/algorithms/lowest_common_ancestors.py``
(``all_pairs_lowest_common_ancestor`` ``:23``,
``lowest_common_ancestor`` ``:132``): for each pair, some common
ancestor with no successor inside the common-ancestor set; pairs with
no common ancestor are omitted; raises on non-DAG / null graphs and on
pair nodes absent from G.

The reference's pick walks successor chains from an arbitrary set
element — iteration-order dependent.  Here the pick is the common
ancestor maximizing (topological generation, id) — a generation-maximal
common ancestor can have no successor in the set, so it is always a
valid LCA, chosen deterministically at any parallelism (tests verify
membership in the reference's valid-LCA set rather than equality).

Spark shape: ancestor sets are rows of the reflexive transitive closure
(path-doubling, ``dag.py:110``), so the pair query is two closure
self-joins + one ``max_by`` aggregation — no per-pair iteration.  The
all-pairs mode materializes |pairs| × |common ancestors| join rows and
is capped by ``max_vertices`` (the reference's all-pairs mode walks n²
pairs driver-side too); the ``pairs=`` mode is the scale path.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.algorithms.dag import (topological_generations,
                                           transitive_closure)


def _nat_key(col):
    digits = col.rlike(r"^[0-9]+$")
    return [F.when(digits, 0).otherwise(1),
            F.when(digits, F.length(col)).otherwise(0), col]


def all_pairs_lowest_common_ancestor(
        g: Graph, pairs: Optional[Iterable | DataFrame] = None,
        max_vertices: int = 2_000) -> DataFrame:
    """(u, v, lca) — one row per input pair that has a common ancestor."""
    if not g.directed:
        raise ValueError("LCA only defined on directed acyclic graphs "
                         "(reference NetworkXError)")
    spark = g.edges.sparkSession
    verts = g.vertices().select(F.col(ID).cast("string").alias(ID)).cache()
    n = verts.count()
    if n == 0:
        raise ValueError("LCA meaningless on null graphs "
                         "(reference NetworkXPointlessConcept)")
    # raises on cycles (generation peel stalls) = the reference's DAG check
    gens = topological_generations(g).select(
        F.col(ID).cast("string").alias("anc"), F.col("generation"))

    anc = (transitive_closure(g, reflexive=True)
           .select(F.col(DST).cast("string").alias("node"),
                   F.col(SRC).cast("string").alias("anc")).distinct())

    if pairs is None:
        if n > max_vertices:
            raise ValueError(
                f"all-pairs LCA materializes O(n^2) pairs; {n} vertices > "
                f"max_vertices={max_vertices} — pass explicit pairs at scale")
        u = verts.select(F.col(ID).alias("u"))
        v = verts.select(F.col(ID).alias("v"))
        pdf = (u.crossJoin(v)
               .filter(F.struct(*_nat_key(F.col("u")))
                       <= F.struct(*_nat_key(F.col("v")))))
    else:
        if isinstance(pairs, DataFrame):
            pdf = pairs.select(F.col(pairs.columns[0]).cast("string")
                               .alias("u"),
                               F.col(pairs.columns[1]).cast("string")
                               .alias("v"))
        else:
            pdf = spark.createDataFrame(
                [(str(a), str(b)) for a, b in pairs], "u string, v string")
        missing = (pdf.select(F.col("u").alias(ID))
                   .unionByName(pdf.select(F.col("v").alias(ID)))
                   .join(verts, ID, "anti").limit(1).count())
        if missing:
            raise KeyError("pair node not in G (reference NodeNotFound)")

    common = (pdf
              .join(anc.select(F.col("node").alias("u"), "anc"), "u")
              .join(anc.select(F.col("node").alias("v"),
                               F.col("anc").alias("_a2")), "v")
              .filter(F.col("anc") == F.col("_a2"))
              .select("u", "v", "anc"))
    ranked = common.join(F.broadcast(gens), "anc")
    return (ranked.groupBy("u", "v")
            .agg(F.max_by("anc", F.struct(F.col("generation"),
                                          *_nat_key(F.col("anc"))))
                 .alias("lca")))


def lowest_common_ancestor(g: Graph, node1, node2, default=None):
    """Single-pair convenience (``lowest_common_ancestors.py:132``):
    returns ``default`` when the pair has no common ancestor."""
    rows = all_pairs_lowest_common_ancestor(
        g, pairs=[(node1, node2)]).collect()
    return rows[0]["lca"] if rows else default

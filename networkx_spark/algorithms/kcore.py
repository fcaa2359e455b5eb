"""k-core decomposition by distributed peeling.

Reference ``core_number`` (``networkx/algorithms/core.py:46-115``) is the
sequential Batagelj–Zaveršnik bin sort; the distributed equivalent peels:
repeatedly delete vertices of degree < k until stable — the k-core.  Core
numbers come from ascending peels: vertices present in the k-core but not
the (k+1)-core have core number k.

Self-loops are rejected like the reference (``core.py:91-96``); directed
degree = in+out (``core.py:71-72``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _peel(edges: DataFrame, k: int, max_rounds: int = 10_000) -> DataFrame:
    """Edges of the k-core: drop vertices with (total) degree < k to a
    fixpoint.  Each round is one degree aggregation + two semi-joins."""
    e = edges.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (e.select(F.col(SRC).alias(ID)).union(e.select(F.col(DST).alias(ID)))
               .groupBy(ID).agg(F.count("*").alias("deg")))
        keep = deg.filter(F.col("deg") >= k).select(ID)
        e2 = (e.join(keep.withColumnRenamed(ID, SRC), SRC, "semi")
              .join(keep.withColumnRenamed(ID, DST), DST, "semi"))
        e2 = e2.localCheckpoint(eager=True)
        if e2.count() == e.count():
            return e2
        e = e2
    raise RuntimeError("k-core peeling did not converge")


def k_core(g: Graph, k: int) -> Graph:
    """The maximal subgraph with all degrees ≥ k (``core.py:120+``)."""
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("k-core is not defined for graphs with self-loops "
                         "(reference raises NetworkXNotImplemented)")
    e = _peel(g.edges, k)
    return Graph(e, directed=g.directed)


def core_number(g: Graph, max_k: int = 10_000) -> DataFrame:
    """(id, core) for every vertex (isolated vertices → 0)."""
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("core_number is not defined for graphs with self-loops")
    spark = g.edges.sparkSession
    result = g.vertices().select(ID, F.lit(0).alias("core"))
    e = g.edges
    for k in range(1, max_k + 1):
        e = _peel(e, k)
        if e.count() == 0:
            break
        members = (e.select(F.col(SRC).alias(ID))
                   .union(e.select(F.col(DST).alias(ID))).distinct()
                   .withColumn("_k", F.lit(k)))
        result = (result.join(members, ID, "left")
                  .select(ID, F.coalesce("_k", "core").alias("core"))
                  .localCheckpoint(eager=True))
    return result

"""Node and edge boundaries of a vertex set.

Reference ``networkx/algorithms/boundary.py``:

* ``edge_boundary(G, S, T=None)`` (``:19-107``) — edges incident to S
  (for directed graphs, ``G.edges(S)`` yields **out-edges** of S) with
  exactly one endpoint in S when T is None (the XOR at ``:100``), or one
  endpoint in S and the other in T otherwise (``:102-107``).
* ``node_boundary(G, S, T=None)`` (``:110-167``) — non-member neighbors
  of S (successors for directed graphs, ``G[v]``), intersected with T
  when given (``:160-166``).

Spark shape: membership tests are broadcast-able semi/anti joins against
the (usually small) S/T node sets — never collected predicates.  At web
scale S is a DataFrame of ids; every operation below is one or two
hash/broadcast joins over the edge table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _ids(nodes: DataFrame) -> DataFrame:
    return nodes.select(F.col(nodes.columns[0]).alias(ID)).distinct()


def edge_boundary(g: Graph, nbunch1: DataFrame,
                  nbunch2: Optional[DataFrame] = None) -> DataFrame:
    """(src, dst) edges of the boundary of ``nbunch1``
    (``boundary.py:19``).  Directed graphs consider out-edges of S only,
    mirroring ``G.edges(nset1)`` on a DiGraph."""
    s = _ids(nbunch1)
    e = g.edges.select(SRC, DST)
    in_s = s.select(F.col(ID).alias(SRC)).withColumn("_s1", F.lit(True))
    in_s_d = s.select(F.col(ID).alias(DST)).withColumn("_s2", F.lit(True))
    flagged = (e.join(in_s, SRC, "left").join(in_s_d, DST, "left")
               .select(SRC, DST,
                       F.coalesce("_s1", F.lit(False)).alias("u_in"),
                       F.coalesce("_s2", F.lit(False)).alias("v_in")))
    if g.directed:
        # G.edges(S) on a DiGraph = out-edges of S
        flagged = flagged.filter(F.col("u_in"))
    else:
        flagged = flagged.filter(F.col("u_in") | F.col("v_in"))
    if nbunch2 is None:
        return (flagged.filter(F.col("u_in") != F.col("v_in"))
                .select(SRC, DST))
    t = _ids(nbunch2)
    in_t = t.select(F.col(ID).alias(SRC)).withColumn("_t1", F.lit(True))
    in_t_d = t.select(F.col(ID).alias(DST)).withColumn("_t2", F.lit(True))
    return (flagged.join(in_t, SRC, "left").join(in_t_d, DST, "left")
            .filter((F.col("u_in") & F.coalesce("_t2", F.lit(False)))
                    | (F.col("v_in") & F.coalesce("_t1", F.lit(False))))
            .select(SRC, DST))


def node_boundary(g: Graph, nbunch1: DataFrame,
                  nbunch2: Optional[DataFrame] = None) -> DataFrame:
    """(id) nodes adjacent to S but not in S (``boundary.py:110``);
    successors only for directed graphs (``G[v]`` = ``G.succ[v]``)."""
    s = _ids(nbunch1)
    adj = g.edges if g.directed else g.symmetrized()
    bdy = (adj.join(s.withColumnRenamed(ID, SRC), SRC, "semi")
           .select(F.col(DST).alias(ID)).distinct()
           .join(s, ID, "anti"))
    if nbunch2 is not None:
        bdy = bdy.join(_ids(nbunch2), ID, "semi")
    return bdy

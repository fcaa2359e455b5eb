"""Graph minors: node/edge contraction and quotient graphs.

Reference: ``networkx/algorithms/minors/contraction.py``
(``quotient_graph`` ``:99``, ``contracted_nodes`` ``:430``,
``contracted_edge`` ``:567``; ``identified_nodes`` is an alias).

Spark shape: contraction is a column remap + dedup (no shuffle beyond
one distinct); the quotient graph is ONE groupBy over the partition
mapping — the generalization of the host-graph rollup in
``webgraph.py``, and exactly the shape a 10¹²-edge page→host→domain
aggregation takes.  Attribute-dict merging (the reference's
``contraction`` annotations) is out of scope for the columnar model;
structural semantics (which edges exist) match the reference and are
pinned by the parity tests.

Block labels: the reference's quotient nodes are frozensets (or
``relabel=True`` integers); here a block is labeled by its minimum
member id — deterministic, join-friendly, stable at any parallelism.
The engine adds a ``weight`` column = number of crossing edges (the
reference's default edges are unweighted; the count is free from the
groupBy and is what the host-graph use case wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def contracted_nodes(g: Graph, u, v, self_loops: bool = True) -> Graph:
    """Merge ``v`` into ``u`` (``contraction.py:430``): v's edges reroute
    to u; u–v edges become u–u self-loops only when ``self_loops``."""
    u, v = str(u), str(v)
    e = g.edges.select(F.col(SRC).cast("string").alias(SRC),
                       F.col(DST).cast("string").alias(DST))
    between = (((F.col(SRC) == u) & (F.col(DST) == v))
               | ((F.col(SRC) == v) & (F.col(DST) == u)))
    if not self_loops:
        e = e.filter(~between)
    remap = (e.select(
        F.when(F.col(SRC) == v, u).otherwise(F.col(SRC)).alias(SRC),
        F.when(F.col(DST) == v, u).otherwise(F.col(DST)).alias(DST))
        .distinct())
    if not g.directed:
        remap = (remap.select(F.least(SRC, DST).alias(SRC),
                              F.greatest(SRC, DST).alias(DST)).distinct())
    verts = (g.vertices().select(F.col(ID).cast("string").alias(ID))
             .filter(F.col(ID) != v))
    return Graph(remap, directed=g.directed, vertices=verts)


identified_nodes = contracted_nodes


def contracted_edge(g: Graph, edge, self_loops: bool = True) -> Graph:
    """Contract an existing edge (``contraction.py:567``; raises when the
    edge is absent, like the reference's ValueError)."""
    u, v = str(edge[0]), str(edge[1])
    e = g.edges.select(F.col(SRC).cast("string").alias(SRC),
                       F.col(DST).cast("string").alias(DST))
    cond = ((F.col(SRC) == u) & (F.col(DST) == v))
    if not g.directed:
        cond = cond | ((F.col(SRC) == v) & (F.col(DST) == u))
    if e.filter(cond).limit(1).count() == 0:
        raise ValueError(f"Edge {edge} does not exist in graph G; "
                         "cannot contract it (reference ValueError)")
    return contracted_nodes(g, u, v, self_loops=self_loops)


def quotient_graph(g: Graph, partition: DataFrame,
                   self_loops: bool = False) -> Graph:
    """Quotient by an explicit partition mapping (``contraction.py:99``):
    ``partition`` is a DataFrame (id, block); blocks become vertices
    labeled by their min member id; blocks B ≠ C are adjacent iff some
    edge crosses them.  Raises when the mapping is not a cover (the
    reference's equivalence-class validation)."""
    pid, pblock = partition.columns[0], partition.columns[1]
    m = partition.select(F.col(pid).cast("string").alias(ID),
                         F.col(pblock).cast("string").alias("_b"))
    dup = m.groupBy(ID).count().filter("count > 1").limit(1).count()
    verts = g.vertices().select(F.col(ID).cast("string").alias(ID))
    missing = verts.join(m, ID, "anti").limit(1).count()
    extra = m.join(verts, ID, "anti").limit(1).count()
    if dup or missing or extra:
        raise ValueError("each vertex must belong to exactly one block and "
                         "every mapping row must name a graph vertex "
                         "(reference NetworkXException: not a valid "
                         "partition of the nodes of G)")
    lab = m.groupBy("_b").agg(F.min(ID).alias("_lab"))
    mm = F.broadcast(m.join(lab, "_b").select(ID, "_lab"))
    e = (g.edges.select(F.col(SRC).cast("string").alias(SRC),
                        F.col(DST).cast("string").alias(DST))
         .join(mm.withColumnRenamed(ID, SRC)
               .withColumnRenamed("_lab", "_bu"), SRC)
         .join(mm.withColumnRenamed(ID, DST)
               .withColumnRenamed("_lab", "_bv"), DST)
         .select(F.col("_bu").alias(SRC), F.col("_bv").alias(DST)))
    if not self_loops:
        e = e.filter(F.col(SRC) != F.col(DST))
    if not g.directed:
        e = e.select(F.least(SRC, DST).alias(SRC),
                     F.greatest(SRC, DST).alias(DST))
    q = e.groupBy(SRC, DST).agg(F.count(F.lit(1)).cast("double")
                                .alias("weight"))
    return Graph(q, directed=g.directed,
                 vertices=lab.select(F.col("_lab").alias(ID)))

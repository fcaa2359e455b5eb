"""s-metric (Li et al. 2005).

Reference ``networkx/algorithms/smetric.py:7`` (``s_metric``): the sum of
``deg(u) * deg(v)`` over every edge — a scalar that measures how
hub-connected a graph is (maximal for "scale-free" cores where hubs link
to hubs).  On a DataFrame engine this is the degree-pair machinery the
assortativity family already has, reduced with one ``sum`` instead of a
Pearson ``corr``: two degree joins onto the edge table, one partial-
aggregated scalar.  No Python, no iteration, no driver-side state.

The reference counts each undirected edge ONCE (it iterates ``G.edges()``),
unlike ``node_degree_xy`` which yields both orientations — so this module
joins degrees onto the raw canonical edge list rather than reusing
``degree_pairs``.  Self-loops contribute ``deg(v)²`` with the reference's
degree convention (self-loop counts 2 in an undirected degree).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def s_metric(g: Graph) -> float:
    """``sum(deg(u) * deg(v) for (u, v) in edges)`` (``smetric.py:60``).

    Directed graphs use total degree (in+out), matching the reference's
    ``G.degree`` on a DiGraph.
    """
    deg = g.degrees()
    du = deg.select(F.col(ID).alias(SRC), F.col("degree").alias("_du"))
    dv = deg.select(F.col(ID).alias(DST), F.col("degree").alias("_dv"))
    row = (g.edges.select(SRC, DST)
           .join(du, SRC).join(dv, DST)
           .agg(F.sum(F.col("_du") * F.col("_dv")).alias("s"))
           .collect()[0])
    return float(row["s"] or 0.0)

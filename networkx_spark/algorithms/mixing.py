"""Mixing matrices — the joint degree/attribute distribution over edges.

Reference ``networkx/algorithms/assortativity/mixing.py:117``
(``degree_mixing_dict``), ``:149`` (``degree_mixing_matrix``), ``:18``
(``attribute_mixing_dict``), ``:57`` (``attribute_mixing_matrix``): the
count (or, normalized, the joint probability) of (x, y) value pairs at
either end of every edge, the table the assortativity coefficients are
derived from.

The reference materializes a dense numpy matrix over a driver-side value
mapping — fine for a 34-node karate club, hopeless for a web graph whose
degree support spans six orders of magnitude.  The engine returns the
matrix in **sparse (x, y, weight) row form**: the degree-pair /
attribute-pair edge-end table (`assortativity.degree_pairs` /
`attribute_pairs`, which already encode the reference's
both-orientations-for-undirected convention from
``assortativity/pairs.py:69-75``) reduced by one ``groupBy(x, y).count()``
— a single shuffle on the (x, y) key, partially aggregated map-side.
Normalization divides by the total via a scalar broadcast, not a second
pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.algorithms.assortativity import _deg, attribute_pairs


def _mixing(pairs: DataFrame, normalized: bool) -> DataFrame:
    out = (pairs.groupBy("x", "y")
           .agg(F.count(F.lit(1)).cast("double").alias("weight")))
    if not normalized:
        return out
    total = pairs.count()
    return out.withColumn("weight", F.col("weight") / F.lit(float(total)))


def degree_mixing(g: Graph, x: str = "out", y: str = "in",
                  normalized: bool = False) -> DataFrame:
    """(x, y, weight) sparse joint degree distribution
    (``mixing.py:117,149``).  ``normalized=False`` gives counts (the
    ``degree_mixing_dict`` default), ``True`` the joint probability (the
    ``degree_mixing_matrix`` default).

    Pairs come from :meth:`Graph.symmetrized` — both orientations for
    undirected edges, self-loops ONCE — matching the reference generator
    exactly (``pairs.py``: "each edge is produced twice ... with the
    exception of self-loop edges which only appear once")."""
    e = g.symmetrized().select(SRC, DST)
    if not g.directed:
        x = y = "deg"
    xd = _deg(g, x).select(F.col(ID).alias(SRC), F.col("degree").alias("x"))
    yd = _deg(g, y).select(F.col(ID).alias(DST), F.col("degree").alias("y"))
    return _mixing(e.join(xd, SRC).join(yd, DST).select("x", "y"),
                   normalized)


def attribute_mixing(g: Graph, attribute: str,
                     normalized: bool = False) -> DataFrame:
    """(x, y, weight) sparse joint attribute distribution
    (``mixing.py:18,57``).  Vertices without the attribute pair as null,
    like the reference's ``.get(attribute, None)``."""
    p = attribute_pairs(g, attribute).select(F.col("xa").alias("x"),
                                             F.col("ya").alias("y"))
    return _mixing(p, normalized)

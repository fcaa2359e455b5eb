"""Regular-graph checks.

Reference: ``networkx/algorithms/regular.py`` (``is_regular`` ``:12``,
``is_k_regular`` ``:50``).  One degree aggregation + one countDistinct —
two Spark jobs, no state.  ``k_factor`` is out of scope (it requires
maximum-matching machinery the engine intentionally lacks; see
``mst.maximal_matching``'s scale note).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkx_spark.graph import Graph


def is_regular(g: Graph) -> bool:
    """Every vertex has the same degree (directed: same in-degree AND
    same out-degree across vertices) — ``regular.py:12``."""
    if g.number_of_vertices() == 0:
        raise ValueError("Graph has no nodes "
                         "(reference NetworkXPointlessConcept)")
    if not g.directed:
        return (g.degrees().select("degree").distinct().count() == 1)
    din = g.in_degrees().select("degree")
    dout = g.out_degrees().select("degree")
    return (din.distinct().count() == 1 and dout.distinct().count() == 1)


def is_k_regular(g: Graph, k: int) -> bool:
    """Every vertex has degree exactly k — ``regular.py:50`` (undirected
    only, like the reference's ``@not_implemented_for('directed')``)."""
    if g.directed:
        raise ValueError("is_k_regular not defined for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    bad = g.degrees().filter(F.col("degree") != k).limit(1).count()
    return bad == 0

"""Eulerian-property checks and tournament recognition.

Reference: ``networkx/algorithms/euler.py:21`` (``is_eulerian``: every
vertex of even degree — balanced in/out when directed — and one
[strongly] connected component over the non-isolated vertices), ``:239``
(``has_eulerian_path``: the classic ≤-one-unbalanced-pair condition plus
weak connectivity), and ``networkx/algorithms/tournament.py:63``
(``is_tournament``: every vertex pair joined by exactly one directed
edge, no self-loops).

All three are degree aggregations + one components call — the traversal
that CONSTRUCTS the circuit (``eulerian_circuit``) is inherently
sequential (Hierholzer walks one edge at a time) and is out of scope;
the checks are what a distributed engine can answer at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _one_component(g: Graph, strongly: bool) -> bool:
    """Exactly one component covering EVERY vertex — isolates make the
    graph disconnected in the reference (``euler.py:64-69``:
    ``is_connected``/``is_strongly_connected`` over the full node set)."""
    from networkx_spark.algorithms.components import connected_components
    from networkx_spark.algorithms.scc import strongly_connected_components
    sub = Graph.from_edges(g.edges.select(SRC, DST),
                           directed=strongly)
    labels = (strongly_connected_components(sub) if strongly
              else connected_components(sub.to_undirected()
                                        if sub.directed else sub))
    lab_col = [c for c in labels.columns if c != ID][0]
    return (labels.select(lab_col).distinct().count() == 1
            and labels.count() == g.number_of_vertices())


def is_eulerian(g: Graph) -> bool:
    """``euler.py:21``."""
    if g.edges.isEmpty():
        return False
    if g.directed:
        out_d = g.out_degrees().withColumnRenamed("degree", "o")
        in_d = g.in_degrees().withColumnRenamed("degree", "i")
        unbalanced = (out_d.join(in_d, ID)
                      .filter(F.col("o") != F.col("i")).head(1))
        if unbalanced:
            return False
        return _one_component(g, strongly=True)
    odd = g.degrees().filter(F.col("degree") % 2 == 1).head(1)
    if odd:
        return False
    return _one_component(g, strongly=False)


def has_eulerian_path(g: Graph) -> bool:
    """``euler.py:239`` (source-free form)."""
    if g.edges.isEmpty():
        return False
    if is_eulerian(g):
        return True
    if g.directed:
        d = (g.out_degrees().withColumnRenamed("degree", "o")
             .join(g.in_degrees().withColumnRenamed("degree", "i"), ID)
             .select((F.col("o") - F.col("i")).alias("diff")))
        counts = (d.groupBy("diff").count().collect())
        by = {r["diff"]: r["count"] for r in counts}
        extra = {k: v for k, v in by.items() if k != 0}
        if set(extra) - {1, -1} or extra.get(1, 0) > 1 or extra.get(-1, 0) > 1:
            return False
        return _one_component(g, strongly=False)
    n_odd = g.degrees().filter(F.col("degree") % 2 == 1).count()
    if n_odd not in (0, 2):
        return False
    return _one_component(g, strongly=False)


def is_tournament(g: Graph) -> bool:
    """``tournament.py:63``: no self-loops, and every unordered vertex
    pair joined by exactly one directed edge — checked without an n²
    pair table: m must equal n(n−1)/2 with zero reciprocal pairs and
    zero duplicate/self edges."""
    if not g.directed:
        raise ValueError("is_tournament is defined for directed graphs")
    e = g.edges.select(SRC, DST)
    if e.filter(F.col(SRC) == F.col(DST)).head(1):
        return False
    n = g.number_of_vertices()
    m = e.distinct().count()
    if m != e.count() or m != n * (n - 1) // 2:
        return False
    recip = (e.alias("a").join(
        e.alias("b"),
        (F.col("a." + SRC) == F.col("b." + DST))
        & (F.col("a." + DST) == F.col("b." + SRC))).head(1))
    return not recip

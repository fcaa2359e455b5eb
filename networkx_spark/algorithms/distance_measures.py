"""Graph distance measures: eccentricity, diameter, radius, center,
periphery.

Reference ``networkx/algorithms/distance_measures.py:241-540``:
``eccentricity(G, v)`` = max shortest-path distance from v to every other
node (per-node BFS loop in the reference); raises when the graph is not
(strongly) connected — "Found infinite path length …" (``:313-319``).
``diameter`` = max eccentricity, ``radius`` = min, ``center`` = nodes at
radius, ``periphery`` = nodes at diameter (``:330,445,498,386``).

Spark shape: ONE batched multi-source BFS over all vertices (state keyed
``(s, id)``, one job per BFS level — reusing the closeness-centrality
frontier machinery) followed by a groupBy max.  Exact all-vertex mode is
O(V²) state rows — all-pairs shortest paths, fixture-scale by nature; at
web scale pass ``sources`` to bound the state (the reference's
``usebounds`` pruning is likewise a heuristic over per-node BFS).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, ID
from networkx_spark.algorithms.centrality import _incoming_levels


def eccentricity(g: Graph, sources: Optional[DataFrame] = None,
                 max_depth: int = 10_000) -> DataFrame:
    """(id, eccentricity) — max finite distance from each vertex
    (``distance_measures.py:241``).  Raises when any vertex cannot reach
    every other vertex, matching the reference's connectivity error
    (``:313-319``)."""
    n = g.number_of_vertices()
    # _incoming_levels rows are (s, id, dist) with dist = d(id → s), so
    # grouping by id gives OUTGOING distances from id — the reference's
    # nx.shortest_path_length(G, n) orientation
    levels = _incoming_levels(g, None, max_depth)
    ecc = (levels.groupBy(ID)
           .agg(F.max("dist").alias("eccentricity"),
                F.count("*").alias("_reached")))
    bad = ecc.filter(F.col("_reached") < n).limit(1).count()
    if bad or ecc.count() < n:
        kind = ("digraph is not strongly connected" if g.directed
                else "graph is not connected")
        raise ValueError(f"Found infinite path length because the {kind} "
                         "(reference NetworkXError)")
    out = ecc.select(ID, F.col("eccentricity").cast("long").alias("eccentricity"))
    if sources is not None:
        out = out.join(sources.select(ID), ID, "semi")
    return out


def _ecc_scalar(g: Graph, agg) -> int:
    row = eccentricity(g).agg(agg("eccentricity").alias("v")).collect()[0]
    return int(row["v"])


def diameter(g: Graph) -> int:
    """Max eccentricity (``distance_measures.py:330``)."""
    return _ecc_scalar(g, F.max)


def radius(g: Graph) -> int:
    """Min eccentricity (``distance_measures.py:445``)."""
    return _ecc_scalar(g, F.min)


def center(g: Graph) -> DataFrame:
    """(id) vertices with eccentricity == radius (``:498``)."""
    ecc = eccentricity(g)
    r = ecc.agg(F.min("eccentricity")).collect()[0][0]
    return ecc.filter(F.col("eccentricity") == r).select(ID)


def periphery(g: Graph) -> DataFrame:
    """(id) vertices with eccentricity == diameter (``:386``)."""
    ecc = eccentricity(g)
    d = ecc.agg(F.max("eccentricity")).collect()[0][0]
    return ecc.filter(F.col("eccentricity") == d).select(ID)


# ------------------------------------------- path-sum aggregate measures
def _pair_distances(g: Graph, max_depth: int) -> DataFrame:
    """Ordered-pair distance table (s, id, dist) with dist ≥ 1 — one
    batched all-source BFS, shared by every Σ-over-pairs measure below."""
    return _incoming_levels(g, None, max_depth).filter(F.col("dist") > 0)


def wiener_index(g: Graph, max_depth: int = 10_000) -> float:
    """Σ over unordered pairs of d(u, v)
    (reference ``networkx/algorithms/wiener.py:26`` ``wiener_index``).
    Disconnected / non-strongly-connected graphs return ``inf`` like the
    reference (``wiener.py:80-84``).  Directed graphs sum over ordered
    pairs (the reference sums ``shortest_path_length`` over all sources,
    which double-counts undirected pairs and then halves — identical)."""
    n = g.number_of_vertices()
    dists = _pair_distances(g, max_depth)
    row = dists.agg(F.sum("dist").alias("tot"),
                    F.count("*").alias("pairs")).collect()[0]
    expected = n * (n - 1)
    if (row["pairs"] or 0) < expected:
        return float("inf")
    tot = float(row["tot"] or 0)
    return tot if g.directed else tot / 2.0


def average_shortest_path_length(g: Graph, max_depth: int = 10_000) -> float:
    """Σ d(u,v) / (n(n−1)) over ordered pairs (reference
    ``shortest_paths/generic.py:356`` ``average_shortest_path_length``).
    Raises on <2 vertices and on disconnected input like the reference
    (``generic.py:427-435``)."""
    n = g.number_of_vertices()
    if n < 2:
        raise ValueError("Graph has fewer than two nodes "
                         "(reference NetworkXPointlessConcept)")
    dists = _pair_distances(g, max_depth)
    row = dists.agg(F.sum("dist").alias("tot"),
                    F.count("*").alias("pairs")).collect()[0]
    if (row["pairs"] or 0) < n * (n - 1):
        kind = "strongly connected" if g.directed else "connected"
        raise ValueError(f"Graph is not {kind} (reference NetworkXError)")
    return float(row["tot"]) / float(n * (n - 1))


def global_efficiency(g: Graph, max_depth: int = 10_000) -> float:
    """Mean over ordered vertex pairs of 1/d(u,v), unreachable pairs
    contributing 0 (reference ``algorithms/efficiency_measures.py:60``
    ``global_efficiency``; undirected only there — same guard here)."""
    if g.directed:
        raise ValueError("global_efficiency not defined for directed "
                         "graphs (reference raises NetworkXNotImplemented)")
    n = g.number_of_vertices()
    denom = n * (n - 1)
    if denom == 0:
        return 0.0
    row = (_pair_distances(g, max_depth)
           .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("inv")).collect()[0])
    return float(row["inv"] or 0.0) / float(denom)

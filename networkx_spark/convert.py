"""Small-graph converters (reference ``networkx/convert.py`` /
``convert_matrix.py``).

These are **collectors**: they materialize the graph on the driver, which
is the point — the reference's dict-of-dicts and dense-ndarray forms ARE
driver-side structures.  Guarded by a vertex-count cap so nobody points
them at the 10¹²-document table; the distributed interchange format is
the edge table itself (``Graph.edges`` / ``Graph.from_edges``).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import SparkSession

from networkx_spark.graph import Graph, SRC, DST, WEIGHT

_CAP = 100_000


def _guard(g: Graph, cap: int):
    n = g.number_of_vertices()
    if n > cap:
        raise ValueError(
            f"driver-side conversion of {n} vertices exceeds cap={cap}; "
            f"use the distributed edge table instead")
    return n


def to_dict_of_dicts(g: Graph, cap: int = _CAP) -> dict:
    """``nx.to_dict_of_dicts`` (``convert.py:301``): adjacency dict with
    ``{'weight': w}`` edge data, both directions for undirected."""
    _guard(g, cap)
    out: dict = {r["id"]: {} for r in g.vertices().collect()}
    for r in g.symmetrized().collect():
        out[r[SRC]][r[DST]] = {"weight": r[WEIGHT]}
        if not g.directed and r[SRC] != r[DST]:
            out[r[DST]][r[SRC]] = {"weight": r[WEIGHT]}
    return out


def from_dict_of_dicts(spark: SparkSession, d: dict,
                       directed: bool = True) -> Graph:
    """``nx.from_dict_of_dicts`` (``convert.py:341``): an undirected dict
    lists each edge under both endpoints — collapse to one row so weights
    are not double-counted (the reference's seen-set, ``convert.py:383``)."""
    rows = [(str(u), str(v), float((dd or {}).get("weight", 1.0)))
            for u, nbrs in d.items() for v, dd in nbrs.items()]
    if not directed:
        rows = list({(min(u, v), max(u, v)): (u, v, w)
                     for u, v, w in rows}.values())
    return Graph.from_edge_list(spark, rows, directed=directed,
                                nodes=list(d))


def to_dict_of_lists(g: Graph, cap: int = _CAP) -> dict:
    """``nx.to_dict_of_lists`` (``convert.py:242``)."""
    dd = to_dict_of_dicts(g, cap)
    return {u: sorted(nbrs) for u, nbrs in dd.items()}


def from_dict_of_lists(spark: SparkSession, d: dict,
                       directed: bool = True) -> Graph:
    """``nx.from_dict_of_lists`` (``convert.py:267``)."""
    rows = [(str(u), str(v)) for u, nbrs in d.items() for v in nbrs]
    if not directed:
        rows = list({(min(u, v), max(u, v)) for u, v in rows})
    return Graph.from_edge_list(spark, rows, directed=directed, nodes=list(d))


def to_numpy_array(g: Graph, cap: int = _CAP) -> tuple[np.ndarray, list]:
    """``nx.to_numpy_array`` (``convert_matrix.py:996``): dense weighted
    adjacency over vids ordered by id; returns (matrix, nodelist).
    Parallel-edge weights were already summed by ``Graph.from_edges``,
    matching the reference's COO duplicate handling."""
    _guard(g, cap)
    vmap, e = g.with_vids()
    nodes = [r["id"] for r in vmap.orderBy("vid").collect()]
    n = len(nodes)
    a = np.zeros((n, n))
    for r in e.collect():
        a[r[SRC], r[DST]] = r[WEIGHT]
        if not g.directed:
            a[r[DST], r[SRC]] = r[WEIGHT]
    return a, nodes


def from_numpy_array(spark: SparkSession, a: np.ndarray,
                     directed: bool = True) -> Graph:
    """``nx.from_numpy_array`` (``convert_matrix.py:1181``): nonzero
    entries become weighted edges over integer ids."""
    a = np.asarray(a)
    if not directed:
        a = np.triu(a)
    i, j = np.nonzero(a)
    rows = [(int(u), int(v), float(a[u, v])) for u, v in zip(i, j)]
    nodes = list(range(a.shape[0]))
    return Graph.from_edge_list(spark, rows, directed=directed, nodes=nodes)

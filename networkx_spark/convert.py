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


def from_pandas_edgelist(spark: SparkSession, df, source: str = "source",
                         target: str = "target", edge_attr: str | None = None,
                         directed: bool = True) -> Graph:
    """``nx.from_pandas_edgelist`` (``convert_matrix.py:256``): named
    wrapper over the native path — ``spark.createDataFrame`` on the pandas
    frame, then :meth:`Graph.from_edges`.  Unlike the driver-side
    collectors this is NOT capped: Arrow ships the frame to the JVM and
    everything downstream is distributed."""
    cols = [source, target] + ([edge_attr] if edge_attr else [])
    e = spark.createDataFrame(df[cols])
    return Graph.from_edges(e, directed=directed, src=source, dst=target,
                            weight=edge_attr)


def to_pandas_edgelist(g: Graph, source: str = "source",
                       target: str = "target"):
    """``nx.to_pandas_edgelist`` (``convert_matrix.py:136``): the edge
    table as a pandas frame via Arrow.  Deliberately uncapped — ``toPandas``
    is the standard Spark driver-collect path and the caller owns sizing."""
    from pyspark.sql import functions as F
    return (g.edges.select(F.col(SRC).alias(source), F.col(DST).alias(target),
                           F.col(WEIGHT).alias("weight")).toPandas())


def to_spark_graph(spark: SparkSession, data, directed: bool = True) -> Graph:
    """Universal ingest (``nx.convert.to_networkx_graph``, ``convert.py:58``):
    type-sniffing dispatch to the matching constructor.  Accepts a
    :class:`Graph` (pass-through), a Spark edge DataFrame, a pandas
    edgelist frame, a dict-of-dicts, a dict-of-lists, a 2-D numpy array,
    or an iterable of edge tuples — the same family the reference sniffs,
    minus its nx-graph/scipy branches (the Spark edge table replaces
    both)."""
    from pyspark.sql import DataFrame as SparkDataFrame
    if isinstance(data, Graph):
        return data if data.directed == directed else (
            data.to_directed() if directed else data.to_undirected())
    if isinstance(data, SparkDataFrame):
        cols = set(data.columns)
        w = WEIGHT if WEIGHT in cols else None
        if {SRC, DST} <= cols:
            return Graph.from_edges(data, directed=directed, weight=w)
        if {"source", "target"} <= cols:
            return Graph.from_edges(data, directed=directed, src="source",
                                    dst="target", weight=w)
        raise TypeError(f"edge DataFrame needs (src,dst) or (source,target) "
                        f"columns, got {sorted(cols)}")
    if isinstance(data, dict):
        if any(isinstance(v, dict) for v in data.values()):
            return from_dict_of_dicts(spark, data, directed)
        return from_dict_of_lists(spark, data, directed)
    if isinstance(data, np.ndarray):
        if data.ndim != 2 or data.shape[0] != data.shape[1]:
            raise TypeError(f"adjacency array must be square 2-D, "
                            f"got shape {data.shape}")
        return from_numpy_array(spark, data, directed)
    try:  # pandas without a hard import-time dependency
        import pandas as pd
        if isinstance(data, pd.DataFrame):
            return from_pandas_edgelist(spark, data, directed=directed)
    except ImportError:
        pass
    try:
        return Graph.from_edge_list(spark, list(data), directed=directed)
    except (TypeError, IndexError):
        raise TypeError(f"cannot convert {type(data).__name__} to a Graph")


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


def google_matrix(g: Graph, alpha: float = 0.85, personalization: dict | None = None,
                  dangling: dict | None = None, cap: int = _CAP
                  ) -> tuple[np.ndarray, list]:
    """``nx.google_matrix`` (``link_analysis/pagerank_alg.py:176``): the
    dense PageRank transition matrix ``M = αS + (1−α)·1pᵀ`` over vids.

    A dense n×n matrix is inherently a driver-side (test/oracle) artifact —
    the reference uses it only in tests and the dense ``_pagerank_python``
    path; guarded by the same vertex cap as the other collectors.  Returns
    ``(M, nodelist)``; row order matches :func:`to_numpy_array`."""
    a, nodes = to_numpy_array(g, cap)
    n = len(nodes)
    if n == 0:
        return a, nodes
    idx = {v: i for i, v in enumerate(nodes)}
    if personalization is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.zeros(n)
        for k, v in personalization.items():
            p[idx[k]] = float(v)
        if p.sum() == 0:
            raise ZeroDivisionError("personalization vector sums to zero")
        p = p / p.sum()
    dangling_rows = np.where(a.sum(axis=1) == 0)[0]
    if dangling is None:
        dw = p
    else:
        dw = np.zeros(n)
        for k, v in dangling.items():
            dw[idx[k]] = float(v)
        s = dw.sum()
        if s == 0:
            raise ZeroDivisionError("dangling vector sums to zero")
        dw = dw / s
    a[dangling_rows] = dw
    a = a / a.sum(axis=1, keepdims=True)        # row-stochastic S
    return alpha * a + (1 - alpha) * p, nodes

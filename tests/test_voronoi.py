"""voronoi_cells vs the reference (tie-free fixtures)."""

import networkx as nx

from networkx_spark import Graph
from networkx_spark.algorithms.voronoi import voronoi_cells


def _got(spark, edges, centers, directed=False, weight=True):
    g = Graph.from_edge_list(spark, edges, directed=directed)
    rows = voronoi_cells(g, centers, weight=weight).collect()
    cells = {}
    for r in rows:
        cells.setdefault(r["center"] or "unreachable", set()).add(r["id"])
    return {k: frozenset(v) for k, v in cells.items()}


def _want(G, centers):
    cells = nx.voronoi_cells(G, set(centers))
    return {str(c): frozenset(str(v) for v in vs) for c, vs in cells.items()}


def test_path_two_centers(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    got = _got(spark, edges, [0, 5])
    want = _want(nx.Graph(edges), [0, 5])
    assert got == want


def test_weighted(spark):
    edges = [(0, 1, 1.0), (1, 2, 10.0), (2, 3, 1.0), (0, 3, 1.0)]
    got = _got(spark, edges, [0, 2])
    want = _want(nx.Graph([(u, v, {"weight": w}) for u, v, w in edges]),
                 [0, 2])
    assert got == want


def test_directed_unreachable(spark):
    edges = [(0, 1), (1, 2), (3, 2)]   # 3 unreachable from center 0
    got = _got(spark, edges, [0], directed=True)
    want = _want(nx.DiGraph(edges), [0])
    assert got == want


def test_empty_centers_raises(spark):
    import pytest
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        voronoi_cells(g, [])

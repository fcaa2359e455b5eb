"""Point-to-point shortest paths vs the reference (bidirectional Dijkstra,
A*): exact length parity; paths are checked valid-and-optimal (the
reference's own tie-breaking differs by heap order)."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.pp_paths import (NoPath, astar_path,
                                                astar_path_length,
                                                bidirectional_dijkstra)

WEDGES = [(0, 1, 2.0), (1, 2, 2.0), (2, 3, 2.0), (0, 4, 1.0), (4, 5, 1.0),
          (5, 3, 9.0), (1, 5, 3.0), (2, 6, 1.0), (6, 3, 1.0), (4, 2, 8.0)]


def _G(edges, directed):
    G = nx.DiGraph() if directed else nx.Graph()
    for u, v, w in edges:
        G.add_edge(u, v, weight=w)
    return G


def _g(spark, edges, directed):
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=directed, weight="weight", combine="min")


def _plen(G, path):
    return sum(G[u][v]["weight"] for u, v in zip(path, path[1:]))


@pytest.mark.parametrize("directed", [True, False])
def test_bidirectional_dijkstra_parity(spark, directed):
    G = _G(WEDGES, directed)
    g = _g(spark, WEDGES, directed)
    for s, t in [(0, 3), (1, 3), (0, 6)]:
        want_len, _ = nx.bidirectional_dijkstra(G, s, t)
        got_len, path = bidirectional_dijkstra(g, s, t)
        assert got_len == pytest.approx(want_len), (s, t)
        assert path[0] == s and path[-1] == t
        assert _plen(G, path) == pytest.approx(want_len)


def test_bidirectional_trivial_and_nopath(spark):
    g = _g(spark, WEDGES, True)
    assert bidirectional_dijkstra(g, 2, 2) == (0.0, [2])
    # no path back against the arrows
    with pytest.raises(NoPath):
        bidirectional_dijkstra(g, 3, 0)
    from networkx_spark.algorithms.bfs import NodeNotFound
    with pytest.raises(NodeNotFound):
        bidirectional_dijkstra(g, 0, 99)


def test_astar_matches_dijkstra_and_reference(spark):
    G = _G(WEDGES, True)
    g = _g(spark, WEDGES, True)
    # h = None -> target-pruned Dijkstra
    got_len, path = astar_path(g, 0, 3)
    want = nx.astar_path_length(G, 0, 3, weight="weight")
    assert got_len == pytest.approx(want)
    assert _plen(G, path) == pytest.approx(want)
    # admissible heuristic: exact distance-to-target lower bound works
    dist_to_t = nx.single_source_dijkstra_path_length(
        G.reverse(), 3, weight="weight")
    h = spark.createDataFrame(
        [(v, float(d)) for v, d in dist_to_t.items()], "id long, h double")
    assert astar_path_length(g, 0, 3, heuristic=h) == pytest.approx(want)


def test_astar_unreachable(spark):
    g = _g(spark, [(0, 1, 1.0), (2, 3, 1.0)], True)
    with pytest.raises(NoPath):
        astar_path(g, 0, 3)

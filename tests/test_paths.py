"""Shortest-path *reconstruction* (predecessors, trees, paths) vs the
reference oracle — distances must match exactly; the specific tree/path may
differ from the reference's iteration-order-dependent pick, so paths are
checked for validity (edges exist, weights telescope to the distance)."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.bfs import (
    NodeNotFound, bfs_distances, bfs_tree, predecessor,
    single_source_shortest_path)
from networkx_spark.algorithms.sssp import (
    shortest_path, single_source_dijkstra_path, sssp_predecessors)
from networkx_spark.generators import KARATE_EDGES
from tests.conftest import as_dict


def _wkarate():
    return [(u, v, float(1 + (u * 31 + v * 17) % 5)) for u, v in KARATE_EDGES]


def _ref_graph():
    G = nx.Graph()
    G.add_weighted_edges_from(_wkarate())
    return G


def test_sssp_predecessors_realize_reference_distances(spark):
    g = Graph.from_edge_list(spark, _wkarate(), directed=False)
    rows = {r["id"]: r for r in sssp_predecessors(g, 0).collect()}
    G = _ref_graph()
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert {k: v["distance"] for k, v in rows.items()} == {
        str(k): float(v) for k, v in want.items()}
    w = {(str(u), str(v)): d for u, v, d in _wkarate()}
    w.update({(b, a): d for (a, b), d in list(w.items())})
    for vid, r in rows.items():
        if r["pred"] is None:
            assert vid == "0"
        else:
            # pred edge exists and telescopes: dist(pred) + w == dist(v)
            assert rows[r["pred"]]["distance"] + w[(r["pred"], vid)] == r["distance"]


def test_single_source_dijkstra_path_valid_and_length_matches(spark):
    g = Graph.from_edge_list(spark, _wkarate(), directed=False)
    got = {r["id"]: (r["distance"], r["path"])
           for r in single_source_dijkstra_path(g, 0).collect()}
    G = _ref_graph()
    want_d = nx.single_source_dijkstra_path_length(G, 0)
    assert set(got) == {str(k) for k in want_d}
    for vid, (dist, path) in got.items():
        assert path[0] == "0" and path[-1] == vid
        assert dist == pytest.approx(want_d[int(vid)])
        # every hop is a real edge and the weights telescope to the distance
        total = 0.0
        for a, b in zip(path, path[1:]):
            assert G.has_edge(int(a), int(b))
            total += G[int(a)][int(b)]["weight"]
        assert total == pytest.approx(dist)


def test_shortest_path_single_target(spark):
    g = Graph.from_edge_list(spark, _wkarate(), directed=False)
    p = shortest_path(g, 0, 33)
    G = _ref_graph()
    want = nx.single_source_dijkstra_path_length(G, 0)[33]
    total = sum(G[int(a)][int(b)]["weight"] for a, b in zip(p, p[1:]))
    assert p[0] == "0" and p[-1] == "33"
    assert total == pytest.approx(want)


def test_shortest_path_unreachable_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(NodeNotFound):
        shortest_path(g, 0, 3)


def test_bfs_predecessor_matches_reference(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = {}
    for r in predecessor(g, 0).collect():
        got.setdefault(r["id"], set()).add(r["pred"])
    G = nx.Graph(KARATE_EDGES)
    want = {str(k): {str(p) for p in ps}
            for k, ps in nx.predecessor(G, 0).items() if ps}
    assert got == want


def test_bfs_tree_depths_match_reference(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    edges = [(r["src"], r["dst"]) for r in bfs_tree(g, 0).collect()]
    dist = as_dict(bfs_distances(g, 0), "id", "distance")
    G = nx.Graph(KARATE_EDGES)
    want_tree = nx.bfs_tree(G, 0)
    # same vertex set; every tree edge is a real edge one level down
    assert {d for e in edges for d in e} | {"0"} == {str(n) for n in want_tree.nodes}
    assert len(edges) == want_tree.number_of_edges()
    for s, d in edges:
        assert G.has_edge(int(s), int(d))
        assert dist[d] == dist[s] + 1


def test_single_source_shortest_path_matches_reference_lengths(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = {r["id"]: r["path"] for r in single_source_shortest_path(g, 0).collect()}
    G = nx.Graph(KARATE_EDGES)
    want = nx.single_source_shortest_path(G, 0)
    assert set(got) == {str(k) for k in want}
    for vid, path in got.items():
        assert len(path) == len(want[int(vid)])
        assert path[0] == "0" and path[-1] == vid
        for a, b in zip(path, path[1:]):
            assert G.has_edge(int(a), int(b))

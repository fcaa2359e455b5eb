"""Set operations (SURVEY §2.6), HITS, k-core, BFS — vs reference oracle."""

import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.bfs import bfs_distances, descendants
from networkx_spark.algorithms.hits import hits
from networkx_spark.algorithms.kcore import core_number, k_core
from networkx_spark.operators.setops import (common_neighbors, complement, compose,
                                             difference, intersection,
                                             symmetric_difference, union)
from tests.conftest import as_dict


def _edges(g):
    return sorted((r.src, r.dst) for r in g.edges.collect())


def test_union_disjoint_rename(spark):
    a = Graph.from_edge_list(spark, [(1, 2)], directed=False)
    b = Graph.from_edge_list(spark, [(1, 2)], directed=False)
    u = union(a, b)
    assert _edges(u) == [("G-1", "G-2"), ("H-1", "H-2")]
    assert u.number_of_vertices() == 4


def test_compose_h_attrs_win(spark):
    a = Graph.from_edge_list(spark, [(1, 2, 5.0), (2, 3, 1.0)], directed=False)
    b = Graph.from_edge_list(spark, [(1, 2, 9.0), (3, 4, 1.0)], directed=False)
    c = compose(a, b)
    w = {(r.src, r.dst): r.weight for r in c.edges.collect()}
    assert w == {("1", "2"): 9.0, ("2", "3"): 1.0, ("3", "4"): 1.0}


def test_intersection_difference_symdiff(spark):
    a = Graph.from_edge_list(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    b = Graph.from_edge_list(spark, [(2, 3), (3, 4), (4, 5)], directed=False)
    assert _edges(intersection(a, b)) == [("2", "3"), ("3", "4")]
    assert _edges(difference(a, b)) == [("1", "2")]
    assert _edges(symmetric_difference(a, b)) == [("1", "2"), ("4", "5")]


def test_complement_small(spark):
    import networkx as nx
    G = nx.Graph([(0, 1), (1, 2)])
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    want = sorted((str(min(u, v)), str(max(u, v))) for u, v in nx.complement(G).edges())
    assert _edges(complement(g)) == want


def test_common_neighbors(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (0, 3), (1, 3), (2, 3)],
                             directed=False)
    got = {r.id for r in common_neighbors(g, 0, 3).collect()}
    assert got == {"1", "2"}


def test_hits_vs_reference(spark):
    import networkx as nx
    from networkx.algorithms.link_analysis.hits_alg import _hits_python
    G = nx.DiGraph([(1, 3), (2, 3), (3, 1), (4, 1), (1, 2), (2, 4)])
    # identical stopping rule (err < tol on max-normalized hubs) ⇒ both
    # implementations halt on the same superstep; values then match to fp
    want_h, want_a = _hits_python(G, tol=1e-3)
    got = hits(Graph.from_edge_list(spark, list(G.edges()), directed=True), tol=1e-3)
    gh = as_dict(got, "id", "hub")
    ga = as_dict(got, "id", "authority")
    for k in want_h:
        assert gh[str(k)] == pytest.approx(want_h[k], abs=1e-9)
        assert ga[str(k)] == pytest.approx(want_a[k], abs=1e-9)


def test_kcore_vs_reference(spark):
    import networkx as nx
    import random
    rng = random.Random(3)
    G = nx.Graph()
    G.add_nodes_from(range(30))
    for _ in range(80):
        u, v = rng.randrange(30), rng.randrange(30)
        if u != v:
            G.add_edge(u, v)
    want = {str(k): v for k, v in nx.core_number(G).items()}
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False,
                             nodes=list(G.nodes()))
    assert as_dict(core_number(g), "id", "core") == want
    k2 = k_core(g, 2)
    H = nx.k_core(G, 2)
    assert sorted((r.src, r.dst) for r in k2.edges.collect()) == \
        sorted(tuple(sorted((str(u), str(v)))) for u, v in H.edges())


def test_kcore_selfloop_rejected(spark):
    g = Graph.from_edge_list(spark, [(1, 1), (1, 2)], directed=False)
    with pytest.raises(ValueError):
        core_number(g)


def test_bfs_vs_reference(spark):
    import networkx as nx
    G = nx.Graph([(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (7, 8)])
    want = {str(k): v for k, v in nx.single_source_shortest_path_length(G, 0).items()}
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    assert as_dict(bfs_distances(g, 0), "id", "distance") == want
    assert {r.id for r in descendants(g, 7).collect()} == {"8"}


def test_bfs_directed(spark):
    g = Graph.from_edge_list(spark, [(1, 2), (2, 3), (3, 1), (4, 1)], directed=True)
    assert as_dict(bfs_distances(g, 1), "id", "distance") == \
        {"1": 0, "2": 1, "3": 2}

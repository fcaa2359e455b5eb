"""Label-propagation parity (``community/tests/test_label_propagation.py``,
FIXTURES.md §2.3) + the distributed greedy coloring it depends on."""

import pytest
from pyspark.sql import functions as F

from networkx_spark import Graph, label_propagation_communities
from networkx_spark.algorithms.label_propagation import greedy_color
from tests.conftest import as_partition


def _communities(g):
    return as_partition(label_propagation_communities(g), "id", "label")


def test_two_disjoint_triangles(spark):
    g = Graph.from_edge_list(
        spark, [("a", "c"), ("a", "d"), ("c", "d"), ("b", "e"), ("e", "f"), ("f", "b")],
        directed=False)
    assert _communities(g) == frozenset([frozenset("acd"), frozenset("bef")])


def test_bridged_cliques_two_accepted_outcomes(spark):
    # test_label_propagation.py:88-104
    a = ["a", "b", "c", "d", "e"]
    b = ["1", "2", "3", "4", "5"]
    edges = [(u, v) for i, u in enumerate(a) for v in a[i + 1:]]
    edges += [(u, v) for i, u in enumerate(b) for v in b[i + 1:]]
    edges += [("a", "1"), ("x", "y")]
    g = Graph.from_edge_list(spark, edges, directed=False, nodes=["z"])
    got = _communities(g)
    merged = frozenset([frozenset(a + b), frozenset("xy"), frozenset("z")])
    split = frozenset([frozenset(a), frozenset(b), frozenset("xy"), frozenset("z")])
    assert got in (merged, split)


def test_singleton(spark):
    g = Graph.from_edge_list(spark, [], directed=False, nodes=["a"])
    assert _communities(g) == frozenset([frozenset("a")])


def test_directed_rejected(spark):
    g = Graph.from_edge_list(spark, [(1, 2)], directed=True)
    with pytest.raises(ValueError):
        label_propagation_communities(g)


def test_five_disjoint_triangles(spark):
    edges = []
    for t in range(5):
        a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
        edges += [(a, b), (b, c), (a, c)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = _communities(g)
    want = frozenset(frozenset({str(3 * t), str(3 * t + 1), str(3 * t + 2)})
                     for t in range(5))
    assert got == want


def test_karate_club_reasonable(spark):
    import networkx as nx
    G = nx.karate_club_graph()
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False,
                             nodes=list(G.nodes()))
    got = as_partition(label_propagation_communities(g), "id", "label")
    # all vertices covered, communities are connected, count plausible
    assert sum(len(c) for c in got) == 34
    assert 1 <= len(got) <= 12
    for comm in got:
        sub = G.subgraph(int(n) for n in comm)
        assert nx.is_connected(sub)


def test_greedy_color_proper(spark):
    import networkx as nx
    G = nx.karate_club_graph()
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    colors = {r.id: r.color for r in greedy_color(g).collect()}
    for u, v in G.edges():
        assert colors[str(u)] != colors[str(v)]
    # at most maxdeg+1 colors (greedy bound)
    assert max(colors.values()) <= max(d for _, d in G.degree())


def test_greedy_color_path_and_isolates(spark):
    g = Graph.from_edge_list(spark, [(i, i + 1) for i in range(10)], directed=False,
                             nodes=[99])
    colors = {r.id: r.color for r in greedy_color(g).collect()}
    assert colors["99"] == 0
    for i in range(10):
        assert colors[str(i)] != colors[str(i + 1)]
    assert max(colors.values()) <= 2


# ---------------------------------------------------------- seeded variants
def test_asyn_lpa_two_cliques(spark):
    # community/tests/test_asyn_lpa.py: two cliques joined by one edge
    # separate under asyn LPA
    from networkx_spark.algorithms.label_propagation import asyn_lpa_communities
    a = ["a", "b", "c", "d", "e"]
    b = ["1", "2", "3", "4", "5"]
    edges = [(u, v) for i, u in enumerate(a) for v in a[i + 1:]]
    edges += [(u, v) for i, u in enumerate(b) for v in b[i + 1:]]
    edges += [("a", "1")]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = as_partition(asyn_lpa_communities(g, seed=1), "id", "label")
    assert got in (frozenset([frozenset(a), frozenset(b)]),
                   frozenset([frozenset(a + b)]))


def test_asyn_lpa_seed_deterministic_any_partitioning(spark):
    from networkx_spark.algorithms.label_propagation import asyn_lpa_communities
    edges = []
    for t in range(4):
        a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
        edges += [(a, b), (b, c), (a, c)]
    edges += [(0, 3), (6, 9)]
    g1 = Graph.from_edge_list(spark, edges, directed=False)
    g2 = Graph(g1.edges.repartition(7), directed=False)
    r1 = {r.id: r.label for r in asyn_lpa_communities(g1, seed=7).collect()}
    r2 = {r.id: r.label for r in asyn_lpa_communities(g2, seed=7).collect()}
    assert r1 == r2


def test_asyn_lpa_weighted_pulls_node_to_heavy_side(spark):
    from networkx_spark.algorithms.label_propagation import asyn_lpa_communities
    # m sits between triangle {a,b,c} (heavy edges) and {x,y,z} (light)
    edges = [("a", "b", 5), ("b", "c", 5), ("a", "c", 5),
             ("x", "y", 1), ("y", "z", 1), ("x", "z", 1),
             ("m", "a", 5), ("m", "x", 1)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = as_partition(asyn_lpa_communities(g, weight=True, seed=3), "id", "label")
    heavy = next(c for c in got if "a" in c)
    assert "m" in heavy


def test_fast_lpa_matches_structure(spark):
    from networkx_spark.algorithms.label_propagation import (
        fast_label_propagation_communities)
    edges = []
    for t in range(5):
        a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
        edges += [(a, b), (b, c), (a, c)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = as_partition(fast_label_propagation_communities(g, seed=11), "id", "label")
    want = frozenset(frozenset({str(3 * t), str(3 * t + 1), str(3 * t + 2)})
                     for t in range(5))
    assert got == want

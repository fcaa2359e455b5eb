"""Triangle/clustering parity (``networkx/algorithms/tests/test_cluster.py``,
FIXTURES.md §2.4)."""

import pytest

from networkx_spark import Graph, triangles, clustering, transitivity, average_clustering
from networkx_spark.algorithms.triangles import total_triangles
from tests.conftest import as_dict

K5 = [(i, j) for i in range(5) for j in range(5) if i < j]


def test_path_graph_zero(spark):
    g = Graph.from_edge_list(spark, [(i, i + 1) for i in range(9)], directed=False)
    assert set(as_dict(triangles(g), "id", "triangles").values()) == {0}
    assert transitivity(g) == 0.0
    assert average_clustering(g) == 0.0


def test_k5(spark):
    g = Graph.from_edge_list(spark, K5, directed=False)
    assert as_dict(triangles(g), "id", "triangles") == {str(i): 6 for i in range(5)}
    assert total_triangles(g) == 10
    assert transitivity(g) == 1.0
    assert set(as_dict(clustering(g), "id", "clustering").values()) == {1.0}


def test_k5_minus_edge(spark):
    g = Graph.from_edge_list(spark, [e for e in K5 if e != (1, 2)], directed=False)
    assert as_dict(triangles(g), "id", "triangles") == \
        {"0": 5, "1": 3, "2": 3, "3": 5, "4": 5}


def test_selfloop_ignored(spark):
    # test_cluster.py:43-45
    g = Graph.from_edge_list(spark, [e for e in K5 if e != (1, 2)] + [(3, 3)],
                             directed=False)
    assert as_dict(triangles(g), "id", "triangles") == \
        {"0": 5, "1": 3, "2": 3, "3": 5, "4": 5}


def test_empty_graph(spark):
    g = Graph.from_edge_list(spark, [], directed=False)
    assert triangles(g).count() == 0
    assert transitivity(g) == 0.0


def test_isolated_vertex_zero_count(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], directed=False, nodes=[9])
    assert as_dict(triangles(g), "id", "triangles") == \
        {"0": 1, "1": 1, "2": 1, "9": 0}
    # avg clustering: 3 vertices at 1.0, isolated at 0 (count_zeros=True)
    assert average_clustering(g) == pytest.approx(0.75)
    assert average_clustering(g, count_zeros=False) == pytest.approx(1.0)


def test_oracle_random_graph(spark):
    import networkx as nx
    import random
    rng = random.Random(11)
    G = nx.Graph()
    G.add_nodes_from(range(40))
    for _ in range(200):
        u, v = rng.randrange(40), rng.randrange(40)
        if u != v:
            G.add_edge(u, v)
    want_tri = {str(k): v for k, v in nx.triangles(G).items()}
    want_clu = {str(k): v for k, v in nx.clustering(G).items()}
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False,
                             nodes=list(G.nodes()))
    assert as_dict(triangles(g), "id", "triangles") == want_tri
    got_clu = as_dict(clustering(g), "id", "clustering")
    for k, v in want_clu.items():
        assert got_clu[k] == pytest.approx(v, abs=1e-12)
    assert transitivity(g) == pytest.approx(nx.transitivity(G), abs=1e-12)
    assert average_clustering(g) == pytest.approx(nx.average_clustering(G), abs=1e-12)


# -------------------------------------------- subset / weighted / directed
def test_triangles_and_clustering_nbunch(spark):
    import networkx as nx
    from networkx_spark.algorithms.triangles import clustering, triangles
    G = nx.karate_club_graph()
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    want_t = nx.triangles(G, [0, 1, 2])
    got_t = {int(r.id): r.triangles for r in triangles(g, ["0", "1", "2"]).collect()}
    assert got_t == want_t
    want_c = nx.clustering(G, [5, 6])
    got_c = {int(r.id): r.clustering for r in clustering(g, ["5", "6"]).collect()}
    for k, v in want_c.items():
        assert got_c[k] == pytest.approx(v, abs=1e-9)


def test_weighted_clustering_vs_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.triangles import clustering
    rng = __import__("random").Random(3)
    G = nx.gnp_random_graph(25, 0.25, seed=4)
    for u, v in G.edges():
        G[u][v]["weight"] = rng.randint(1, 9)
    g = Graph.from_edge_list(
        spark, [(u, v, G[u][v]["weight"]) for u, v in G.edges()], directed=False)
    want = nx.clustering(G, weight="weight")
    got = {int(r.id): r.clustering for r in clustering(g, weight=True).collect()}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_directed_clustering_vs_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.triangles import clustering
    G = nx.gnp_random_graph(25, 0.15, seed=9, directed=True)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=True,
                             nodes=list(G.nodes()))
    want = nx.clustering(G)
    got = {int(r.id): r.clustering for r in clustering(g).collect()}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_directed_weighted_clustering_vs_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.triangles import clustering
    rng = __import__("random").Random(11)
    G = nx.gnp_random_graph(20, 0.2, seed=12, directed=True)
    for u, v in G.edges():
        G[u][v]["weight"] = rng.randint(1, 5)
    g = Graph.from_edge_list(
        spark, [(u, v, G[u][v]["weight"]) for u, v in G.edges()], directed=True,
        nodes=list(G.nodes()))
    want = nx.clustering(G, weight="weight")
    got = {int(r.id): r.clustering for r in clustering(g, weight=True).collect()}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_generalized_degree_vs_reference(spark):
    """Flat (id, tri, edges) rows == the reference's per-node Counter
    (``cluster.py:543``), random graph + karate."""
    import networkx as nx
    import random
    from networkx_spark.algorithms.triangles import generalized_degree

    def flat(G):
        want = {}
        for n, c in nx.generalized_degree(G).items():
            for t, cnt in c.items():
                want[(str(n), t)] = cnt
        return want

    rng = random.Random(7)
    G = nx.Graph()
    G.add_nodes_from(range(30))
    for _ in range(120):
        u, v = rng.randrange(30), rng.randrange(30)
        if u != v:
            G.add_edge(u, v)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False,
                             nodes=list(G.nodes()))
    got = {(r.id, r.tri): r.edges for r in generalized_degree(g).collect()}
    assert got == flat(G)

    K = nx.karate_club_graph()
    gk = Graph.from_edge_list(spark, list(K.edges()), directed=False)
    gotk = {(r.id, r.tri): r.edges
            for r in generalized_degree(gk, ["0", "33"]).collect()}
    wantk = {(k, t): c for (k, t), c in flat(K).items() if k in ("0", "33")}
    assert gotk == wantk

    d = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        generalized_degree(d)

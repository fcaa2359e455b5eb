"""Round-4 operators vs the reference oracle: neighbor-degree statistics,
degree centrality, rich club, boundaries, core-family extensions
(k_shell/k_crust/k_corona/onion_layers), square clustering, and graph
distance measures."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.algorithms.neighbor_degree import (
    average_degree_connectivity, average_neighbor_degree)
from networkx_spark.algorithms.centrality import (
    degree_centrality, in_degree_centrality, out_degree_centrality)
from networkx_spark.algorithms.richclub import rich_club_coefficient
from networkx_spark.algorithms.boundary import edge_boundary, node_boundary
from networkx_spark.algorithms.kcore import (k_corona, k_crust, k_shell,
                                             onion_layers)
from networkx_spark.algorithms.triangles import square_clustering
from networkx_spark.algorithms.distance_measures import (
    center, diameter, eccentricity, periphery, radius)


@pytest.fixture(scope="module")
def und(spark):
    G = nx.gnm_random_graph(40, 120, seed=9)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    return G, g


@pytest.fixture(scope="module")
def dirg(spark):
    D = nx.gnm_random_graph(30, 100, seed=11, directed=True)
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    return D, g


def _vals(df, key, val):
    return {int(r[key]): r[val] for r in df.collect()}


# ----------------------------------------------------- neighbor degree
def test_average_neighbor_degree_undirected(und):
    G, g = und
    ref = nx.average_neighbor_degree(G)
    got = _vals(average_neighbor_degree(g), "id", "avg_nbr_degree")
    assert got == pytest.approx(ref)


@pytest.mark.parametrize("source", ["in", "out", "in+out"])
@pytest.mark.parametrize("target", ["in", "out", "in+out"])
def test_average_neighbor_degree_directed(dirg, source, target):
    D, g = dirg
    ref = nx.average_neighbor_degree(D, source=source, target=target)
    got = _vals(average_neighbor_degree(g, source=source, target=target),
                "id", "avg_nbr_degree")
    assert got == pytest.approx(ref)


def test_average_neighbor_degree_weighted(spark):
    W = nx.Graph()
    for i, (u, v) in enumerate(nx.gnm_random_graph(25, 60, seed=3).edges()):
        W.add_edge(u, v, weight=float(1 + i % 5))
    rows = [(u, v, d["weight"]) for u, v, d in W.edges(data=True)]
    g = Graph.from_edges(
        spark.createDataFrame(rows, "src long, dst long, w double"),
        directed=False, weight="w")
    ref = nx.average_neighbor_degree(W, weight="weight")
    got = _vals(average_neighbor_degree(g, weight=True), "id", "avg_nbr_degree")
    assert got == pytest.approx(ref)


def test_average_neighbor_degree_rejects_undirected_kinds(und):
    _, g = und
    with pytest.raises(ValueError):
        average_neighbor_degree(g, source="in")


@pytest.mark.parametrize("source", ["in", "out", "in+out"])
def test_average_degree_connectivity_directed(dirg, source):
    D, g = dirg
    ref = nx.average_degree_connectivity(D, source=source)
    got = _vals(average_degree_connectivity(g, source=source),
                "k", "connectivity")
    assert got == pytest.approx(ref)


def test_average_degree_connectivity_undirected(und):
    G, g = und
    ref = nx.average_degree_connectivity(G)
    got = _vals(average_degree_connectivity(g), "k", "connectivity")
    assert got == pytest.approx(ref)


# --------------------------------------------------- degree centrality
def test_degree_centrality(und):
    G, g = und
    assert _vals(degree_centrality(g), "id", "centrality") == \
        pytest.approx(nx.degree_centrality(G))


def test_in_out_degree_centrality(dirg):
    D, g = dirg
    assert _vals(in_degree_centrality(g), "id", "centrality") == \
        pytest.approx(nx.in_degree_centrality(D))
    assert _vals(out_degree_centrality(g), "id", "centrality") == \
        pytest.approx(nx.out_degree_centrality(D))
    with pytest.raises(ValueError):
        in_degree_centrality(Graph.from_edge_list(
            g.edges.sparkSession, [(0, 1)], directed=False))


# ------------------------------------------------------------ rich club
def test_rich_club(und):
    G, g = und
    ref = nx.rich_club_coefficient(G, normalized=False)
    got = _vals(rich_club_coefficient(g), "k", "phi")
    assert got == pytest.approx(ref)


def test_rich_club_doc_example(spark):
    G = nx.Graph([(0, 1), (0, 2), (1, 2), (1, 3), (1, 4), (4, 5)])
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    got = _vals(rich_club_coefficient(g), "k", "phi")
    assert got[0] == pytest.approx(0.4)
    assert got == pytest.approx(nx.rich_club_coefficient(G, normalized=False))


def test_rich_club_guards(spark, und):
    _, g = und
    with pytest.raises(NotImplementedError):
        rich_club_coefficient(g, normalized=True)
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        rich_club_coefficient(gd)


# ------------------------------------------------------------ boundary
def test_boundaries(spark, und, dirg):
    G, g = und
    D, gd = dirg
    S = list(range(12))
    T = list(range(12, 25))
    sdf = spark.createDataFrame([(x,) for x in S], "id long")
    tdf = spark.createDataFrame([(x,) for x in T], "id long")

    def edges_set(df):
        return {tuple(sorted((int(r["src"]), int(r["dst"]))))
                for r in df.collect()}

    assert edges_set(edge_boundary(g, sdf)) == \
        {tuple(sorted(e)) for e in nx.edge_boundary(G, S)}
    assert edges_set(edge_boundary(g, sdf, tdf)) == \
        {tuple(sorted(e)) for e in nx.edge_boundary(G, S, T)}
    assert {(int(r["src"]), int(r["dst"]))
            for r in edge_boundary(gd, sdf).collect()} == \
        set(nx.edge_boundary(D, S))
    assert {int(r["id"]) for r in node_boundary(g, sdf).collect()} == \
        nx.node_boundary(G, S)
    assert {int(r["id"]) for r in node_boundary(gd, sdf, tdf).collect()} == \
        nx.node_boundary(D, S, T)


# ---------------------------------------------------------- core family
@pytest.mark.parametrize("k", [None, 1, 2, 3])
def test_k_shell_k_crust(und, k):
    G, g = und

    def edges_set(gg):
        return {tuple(sorted((int(r["src"]), int(r["dst"]))))
                for r in gg.edges.select("src", "dst").collect()}

    assert edges_set(k_shell(g, k=k)) == \
        {tuple(sorted(e)) for e in nx.k_shell(G, k=k).edges()}
    assert edges_set(k_crust(g, k=k)) == \
        {tuple(sorted(e)) for e in nx.k_crust(G, k=k).edges()}


@pytest.mark.parametrize("k", [1, 2, 3])
def test_k_corona(und, k):
    G, g = und
    got = {int(r["id"]) for r in k_corona(g, k=k).vertices().collect()}
    assert got == set(nx.k_corona(G, k=k).nodes())


def test_onion_layers(und):
    G, g = und
    assert _vals(onion_layers(g), "id", "layer") == dict(nx.onion_layers(G))


def test_onion_layers_star_plus_isolate(spark):
    # isolates land in layer 1 and the star peels leaves-then-hub
    G = nx.star_graph(5)
    G.add_node(99)
    g = Graph.from_edges(
        spark.createDataFrame([(u, v) for u, v in G.edges()],
                              "src long, dst long"),
        directed=False,
        vertices=spark.createDataFrame([(n,) for n in G.nodes()], "id long"))
    assert _vals(onion_layers(g), "id", "layer") == dict(nx.onion_layers(G))


# ----------------------------------------------------- square clustering
def test_square_clustering(und):
    G, g = und
    ref = nx.square_clustering(G)
    got = _vals(square_clustering(g), "id", "square_clustering")
    assert got == pytest.approx(ref)


def test_square_clustering_c4_k5(spark):
    for E in ([(0, 1), (1, 2), (2, 3), (3, 0)],
              [(i, j) for i in range(5) for j in range(i + 1, 5)]):
        G = nx.Graph(E)
        g = Graph.from_edge_list(spark, E, directed=False)
        assert _vals(square_clustering(g), "id", "square_clustering") == \
            pytest.approx(nx.square_clustering(G))


# ----------------------------------------------------- distance measures
def test_distance_measures(spark, und):
    G, _ = und
    C = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    gc = Graph.from_edge_list(spark, list(C.edges()), directed=False)
    assert _vals(eccentricity(gc), "id", "eccentricity") == \
        dict(nx.eccentricity(C))
    assert diameter(gc) == nx.diameter(C)
    assert radius(gc) == nx.radius(C)
    assert {int(r["id"]) for r in center(gc).collect()} == set(nx.center(C))
    assert {int(r["id"]) for r in periphery(gc).collect()} == \
        set(nx.periphery(C))


def test_eccentricity_raises_disconnected(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError, match="not connected"):
        eccentricity(g)
    gd = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=True)
    with pytest.raises(ValueError, match="strongly"):
        eccentricity(gd)


def test_eccentricity_directed(spark):
    D = nx.DiGraph([(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)])
    gd = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    assert _vals(eccentricity(gd), "id", "eccentricity") == \
        dict(nx.eccentricity(D))

"""Round-4e operators vs the reference oracle: path-sum distance measures,
bipartite detection, Luby maximal independent set, transitive
closure/reduction, flow hierarchy, structural holes, voterank, and the
within-document repetition / boilerplate pipeline ops."""

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.algorithms.distance_measures import (
    average_shortest_path_length, global_efficiency, wiener_index)
from networkx_spark.algorithms.bipartite import (
    NotBipartite, bipartite_color, bipartite_sets, is_bipartite)
from networkx_spark.algorithms.mis import maximal_independent_set
from networkx_spark.algorithms.dag import (
    HasACycle, transitive_closure, transitive_reduction)
from networkx_spark.algorithms.scc import flow_hierarchy
from networkx_spark.algorithms.structuralholes import (
    constraint, effective_size)
from networkx_spark.algorithms.voterank import voterank
from networkx_spark.pipeline.text import duplicate_paragraphs, line_stats


@pytest.fixture(scope="module")
def karate(spark):
    G = nx.karate_club_graph()
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    return G, g


@pytest.fixture(scope="module")
def dirg(spark):
    D = nx.gnm_random_graph(25, 80, seed=7, directed=True)
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    return D, g


def _vals(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


# -------------------------------------------------- path-sum measures
def test_wiener_index_undirected(karate):
    G, g = karate
    assert wiener_index(g) == pytest.approx(nx.wiener_index(G))


def test_wiener_index_directed_and_disconnected(spark, dirg):
    D, g = dirg
    assert wiener_index(g) == pytest.approx(nx.wiener_index(D))
    # two disjoint edges -> inf
    g2 = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    assert wiener_index(g2) == float("inf")


def test_average_shortest_path_length(karate):
    G, g = karate
    assert average_shortest_path_length(g) == pytest.approx(
        nx.average_shortest_path_length(G))


def test_aspl_raises_disconnected(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError):
        average_shortest_path_length(g)


def test_global_efficiency(karate):
    G, g = karate
    assert global_efficiency(g) == pytest.approx(nx.global_efficiency(G))


def test_global_efficiency_disconnected(spark):
    G = nx.Graph([(0, 1), (2, 3), (2, 4)])
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    assert global_efficiency(g) == pytest.approx(nx.global_efficiency(G))


# ----------------------------------------------------------- bipartite
def test_bipartite_color_matches_partition(spark):
    G = nx.complete_bipartite_graph(4, 6)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    got = _vals(bipartite_color(g), "id", "color")
    ref = nx.bipartite.color(G)
    sides = frozenset(
        frozenset(n for n, c in got.items() if c == k) for k in (0, 1))
    ref_sides = frozenset(
        frozenset(str(n) for n, c in ref.items() if c == k) for k in (0, 1))
    assert sides == ref_sides
    assert is_bipartite(g) is True


def test_bipartite_disconnected_and_isolates(spark):
    # two even cycles + an isolate
    G = nx.Graph()
    G.add_edges_from(nx.cycle_graph(4).edges())
    G.add_edges_from((u + 10, v + 10) for u, v in nx.cycle_graph(6).edges())
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    g = g.add_vertices(spark.createDataFrame([(99,)], "id long"))
    colors = _vals(bipartite_color(g), "id", "color")
    assert colors[99] == 0          # isolate -> 0, reference basic.py:81
    for u, v in G.edges():
        assert colors[u] != colors[v]
    with pytest.raises(ValueError):  # AmbiguousSolution analogue
        bipartite_sets(g)


def test_not_bipartite_raises_and_is_bipartite_false(spark):
    g = Graph.from_edge_list(spark, list(nx.cycle_graph(5).edges()),
                             directed=False)
    with pytest.raises(NotBipartite):
        bipartite_color(g)
    assert is_bipartite(g) is False


def test_bipartite_directed_symmetrized(spark):
    # directed edges both ways across the bipartition; reference color()
    # traverses pred+succ (basic.py:56-60)
    g = Graph.from_edge_list(spark, [(0, 5), (5, 1), (1, 6), (6, 0)],
                             directed=True)
    colors = _vals(bipartite_color(g), "id", "color")
    assert colors["0"] == colors["1"] and colors["5"] == colors["6"]
    assert colors["0"] != colors["5"]


# ------------------------------------------------------------ Luby MIS
def _assert_valid_mis(G, ids):
    s = set(ids)
    for u, v in G.edges():
        assert not (u in s and v in s), f"edge {u}-{v} inside MIS"
    for n in G.nodes():   # maximality: every outside vertex has a nbr in s
        if n not in s:
            assert any(w in s for w in G.neighbors(n)), f"{n} addable"


def test_luby_mis_valid_and_deterministic(spark):
    G = nx.gnm_random_graph(60, 180, seed=3)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    a = sorted(r["id"] for r in maximal_independent_set(g, seed=1).collect())
    b = sorted(r["id"] for r in maximal_independent_set(g, seed=1).collect())
    c = sorted(r["id"] for r in maximal_independent_set(g, seed=2).collect())
    assert a == b
    _assert_valid_mis(G, a)
    _assert_valid_mis(G, c)


def test_luby_mis_seed_nodes(spark):
    G = nx.cycle_graph(8)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    nodes = spark.createDataFrame([(0,), (4,)], "id long")
    got = {r["id"] for r in maximal_independent_set(g, nodes=nodes).collect()}
    assert {0, 4} <= got
    _assert_valid_mis(G, got)
    bad = spark.createDataFrame([(0,), (1,)], "id long")
    with pytest.raises(ValueError):
        maximal_independent_set(g, nodes=bad)
    missing = spark.createDataFrame([(123,)], "id long")
    with pytest.raises(ValueError):
        maximal_independent_set(g, nodes=missing)


def test_luby_mis_isolates_and_directed_guard(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    g = g.add_vertices(spark.createDataFrame([(7,)], "id long"))
    got = {r["id"] for r in maximal_independent_set(g).collect()}
    assert 7 in got and len(got & {0, 1}) == 1
    d = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        maximal_independent_set(d)


# --------------------------------------------- closure / reduction / flow
def _edge_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


@pytest.mark.parametrize("reflexive", [False, True, None])
def test_transitive_closure_directed(spark, reflexive):
    D = nx.DiGraph([(1, 2), (2, 3), (3, 1), (3, 4), (5, 4)])
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    got = _edge_set(transitive_closure(g, reflexive=reflexive))
    ref = {(str(u), str(v))
           for u, v in nx.transitive_closure(D, reflexive=reflexive).edges()}
    assert got == ref


def test_transitive_closure_undirected(spark):
    G = nx.Graph([(0, 1), (1, 2), (3, 4)])
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    got = {frozenset(e) for e in _edge_set(transitive_closure(g))}
    ref = {frozenset((str(u), str(v)))
           for u, v in nx.transitive_closure(G).edges()}
    assert got == ref


def test_transitive_reduction(spark):
    D = nx.DiGraph([(1, 2), (2, 3), (1, 3), (3, 4), (1, 4), (2, 4)])
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    got = _edge_set(transitive_reduction(g))
    ref = {(str(u), str(v)) for u, v in nx.transitive_reduction(D).edges()}
    assert got == ref


def test_transitive_reduction_raises_on_cycle(spark):
    g = Graph.from_edge_list(spark, [(1, 2), (2, 1)], directed=True)
    with pytest.raises(HasACycle):
        transitive_reduction(g)


def test_flow_hierarchy(dirg):
    D, g = dirg
    assert flow_hierarchy(g) == pytest.approx(nx.flow_hierarchy(D))


def test_flow_hierarchy_weighted(spark):
    D = nx.DiGraph()
    D.add_weighted_edges_from([(1, 2, 3.0), (2, 1, 1.0), (2, 3, 5.0)])
    e = spark.createDataFrame(
        [(u, v, w) for u, v, w in D.edges(data="weight")],
        "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=True, weight="weight")
    assert flow_hierarchy(g, weighted=True) == pytest.approx(
        nx.flow_hierarchy(D, weight="weight"))


# -------------------------------------------------- structural holes
def test_effective_size_undirected(karate):
    G, g = karate
    ref = {str(k): v for k, v in nx.effective_size(G).items()}
    got = _vals(effective_size(g), "id", "effective_size")
    assert got == pytest.approx(ref)


def test_effective_size_directed_weighted(spark):
    D = nx.DiGraph()
    D.add_weighted_edges_from(
        [(0, 1, 2.0), (1, 0, 1.0), (0, 2, 3.0), (2, 1, 1.0), (1, 3, 4.0),
         (3, 0, 2.0)])
    e = spark.createDataFrame(
        [(u, v, w) for u, v, w in D.edges(data="weight")],
        "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=True, weight="weight")
    ref = nx.effective_size(D, weight="weight")
    got = _vals(effective_size(g, weight="weight"), "id", "effective_size")
    assert got == pytest.approx(ref)


def test_effective_size_isolate_nan(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    g = g.add_vertices(spark.createDataFrame([(5,)], "id long"))
    got = _vals(effective_size(g), "id", "effective_size")
    assert math.isnan(got[5]) and got[0] == pytest.approx(1.0)


def test_constraint_undirected_and_directed(spark, karate, dirg):
    G, g = karate
    assert _vals(constraint(g), "id", "constraint") == pytest.approx(
        {str(k): v for k, v in nx.constraint(G).items()})
    D, gd = dirg
    assert _vals(constraint(gd), "id", "constraint") == pytest.approx(
        {str(k): v for k, v in nx.constraint(D).items()}, nan_ok=True)


# ------------------------------------------------------------ voterank
def test_voterank_matches_reference(spark):
    # zero-padded string labels make the engine's min-id tie-break coincide
    # with the reference's first-in-insertion-order artifact (module
    # docstring): both orders are then ascending-id
    G = nx.relabel_nodes(nx.gnm_random_graph(30, 90, seed=5),
                         lambda n: f"{n:02d}")
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False)
    ref = nx.voterank(G, 8)
    rows = voterank(g, 8).orderBy("rank").collect()
    assert [r["id"] for r in rows] == ref


def test_voterank_directed(spark):
    D = nx.relabel_nodes(nx.gnm_random_graph(20, 70, seed=13, directed=True),
                         lambda n: f"{n:02d}")
    g = Graph.from_edge_list(spark, list(D.edges()), directed=True)
    ref = nx.voterank(D, 5)
    rows = voterank(g, 5).orderBy("rank").collect()
    assert [r["id"] for r in rows] == ref


# ------------------------------------------------------- pipeline text
def test_line_stats(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb\na\n\nb"), (2, ""), (3, "x")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_stats(docs).collect()}
    assert got[1]["n_lines"] == 4 and got[1]["n_distinct_lines"] == 2
    assert got[1]["repetition_ratio"] == pytest.approx(0.5)
    assert got[2]["n_lines"] == 0 and got[2]["repetition_ratio"] == 0.0
    assert got[3]["repetition_ratio"] == 0.0


def test_duplicate_paragraphs(spark):
    boiler = "accept all cookies to continue"
    docs = spark.createDataFrame(
        [(1, f"{boiler}\n\nunique one"), (2, f"intro\n\n{boiler}"),
         (3, f"{boiler}\n\n{boiler}"), (4, "nothing shared here at all")],
        "doc_id long, text string")
    rows = duplicate_paragraphs(docs, min_chars=10).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 3 and rows[0]["n_occurrences"] == 4

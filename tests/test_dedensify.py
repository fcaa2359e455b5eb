"""Dedensification vs the reference (summarization.py:69).

Compressor NAMES differ by design (the reference concatenates frozenset
iteration order — nondeterministic; ours is md5 of the sorted member
list), so parity is structural: same compressor count, same edge count,
and expanding compressors reproduces the original hub adjacency."""

import networkx as nx
import pytest

from networkx_spark.algorithms.summarization import dedensify
from networkx_spark.graph import Graph


def _fixture_directed():
    g = nx.DiGraph()
    for u in range(12):
        for h in (100, 101, 102):
            g.add_edge(u, h)
    for u in range(12, 16):          # second group shares hubs 100, 101
        g.add_edge(u, 100)
        g.add_edge(u, 101)
    g.add_edge(0, 1)                 # low-degree edges survive untouched
    g.add_edge(3, 7)
    return g


def _spark_graph(spark, nxg, directed):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                            directed=directed)


def _expand(edge_rows):
    """Expand compressor nodes back to direct hub edges."""
    comp_out = {}
    for u, v in edge_rows:
        if u.startswith("C_"):
            comp_out.setdefault(u, set()).add(v)
    direct = set()
    for u, v in edge_rows:
        if u.startswith("C_"):
            continue
        if v.startswith("C_"):
            for h in comp_out[v]:
                direct.add((u, h))
        else:
            direct.add((u, v))
    return direct


def test_directed_matches_reference_structure(spark):
    nxg = _fixture_directed()
    ref_g, ref_comp = nx.dedensify(nxg, threshold=3)
    edges, comps = dedensify(_spark_graph(spark, nxg, True), threshold=3)
    rows = [(r.src, r.dst) for r in edges.collect()]
    assert comps.count() == len(ref_comp)
    assert len(rows) == ref_g.number_of_edges()
    # expansion reproduces the original digraph exactly
    assert _expand(rows) == {(str(u), str(v)) for u, v in nxg.edges()}


def test_compressor_bookkeeping(spark):
    nxg = _fixture_directed()
    edges, comps = dedensify(_spark_graph(spark, nxg, True), threshold=3)
    sizes = {(r.n_sources, r.n_hubs) for r in comps.collect()}
    assert sizes == {(12, 3), (4, 2)}


def test_no_compression_below_payoff(spark):
    # 2 sources x 2 hubs: old(4) <= new(4) -> no compressor
    g = nx.DiGraph()
    for u in (0, 1):
        for h in (10, 11):
            g.add_edge(u, h)
    for x in range(5):               # pump hub in-degrees over threshold
        g.add_edge(20 + x, 10)
        g.add_edge(30 + x, 11)
    ref_g, ref_comp = nx.dedensify(g, threshold=3)
    edges, comps = dedensify(_spark_graph(spark, g, True), threshold=3)
    assert comps.count() == len(ref_comp)
    assert edges.count() == ref_g.number_of_edges()


def test_undirected_expansion(spark):
    nxg = nx.Graph()
    for u in range(10):
        for h in (100, 101, 102):
            nxg.add_edge(u, h)
    nxg.add_edge(0, 1)
    edges, comps = dedensify(_spark_graph(spark, nxg, False), threshold=4)
    rows = [(r.src, r.dst) for r in edges.collect()]
    assert comps.count() == 1
    want = {tuple(sorted((str(u), str(v)))) for u, v in nxg.edges()}
    got = {tuple(sorted(e)) for e in _expand(rows)}
    assert got == want
    # and it actually compressed: 31 original edges -> 10 + 3 + 1 kept
    assert len(rows) == 14


def test_threshold_guard(spark):
    g = _spark_graph(spark, _fixture_directed(), True)
    with pytest.raises(ValueError, match=">= 2"):
        dedensify(g, 1)


def test_moral_graph_matches_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.summarization import moral_graph
    dag = nx.gnr_graph(25, 0.3, seed=9)
    g = _spark_graph(spark, dag, True)
    got = {(r.src, r.dst)
           for r in moral_graph(g).edges.select("src", "dst").collect()}
    want = {tuple(sorted(e)) for e in nx.moral_graph(dag).edges()}
    assert got == want


def test_snap_aggregation_matches_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.summarization import snap_aggregation
    # the reference docstring's caveman-with-attributes example shape
    nxg = nx.Graph()
    colors = {}
    for i in range(12):
        c = "red" if i % 3 == 0 else ("blue" if i % 3 == 1 else "green")
        nxg.add_node(i, color=c)
        colors[i] = c
    edges = [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8), (9, 10),
             (10, 11), (0, 3), (6, 9), (2, 5), (8, 11)]
    nxg.add_edges_from(edges)
    g = _spark_graph(spark, nxg, False)
    attrs = spark.createDataFrame([(i, colors[i]) for i in range(12)],
                                  "id long, color string")
    membership, sedges = snap_aggregation(g, attrs)
    ours = {}
    for r in membership.collect():
        ours.setdefault(r.supernode, set()).add(r.id)
    ref = nx.snap_aggregation(nxg, node_attributes=("color",))
    theirs = [set(d["group"]) for _, d in ref.nodes(data=True)]
    assert (frozenset(map(frozenset, ours.values()))
            == frozenset(map(frozenset, theirs)))
    # superedges agree after relabeling groups by min member
    ref_edges = set()
    for a, b in ref.edges():
        ga = min(ref.nodes[a]["group"])
        gb = min(ref.nodes[b]["group"])
        ref_edges.add(tuple(sorted((ga, gb))))
    got_edges = {(r.u, r.v) for r in sedges.collect()}
    assert got_edges == ref_edges

"""Max-flow / min-cut vs the reference (flow value + unique minimal cut
partition exactly; per-arc flows checked for validity, since flow
decomposition is not unique — the reference's own test posture,
``flow/tests/test_maxflow.py``)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark import Graph
from networkx_spark.algorithms.flow import (Unbounded, cut_edges,
                                            maximum_flow, maximum_flow_value,
                                            minimum_cut, minimum_cut_value)

# (edges with capacities, s, t)
CLRS = ([(0, 1, 16), (0, 2, 13), (1, 2, 10), (2, 1, 4), (1, 3, 12),
         (3, 2, 9), (2, 4, 14), (4, 3, 7), (3, 5, 20), (4, 5, 4)], 0, 5)
DIAMOND = ([(0, 1, 3), (0, 2, 2), (1, 3, 2), (2, 3, 3), (1, 2, 5)], 0, 3)
PIPE = ([(0, 1, 5), (1, 2, 3), (2, 3, 7)], 0, 3)


def _G(edges):
    D = nx.DiGraph()
    for u, v, c in edges:
        D.add_edge(u, v, capacity=c)
    return D


def _g(spark, edges, directed=True):
    e = spark.createDataFrame(
        [(u, v, float(c)) for u, v, c in edges],
        "src long, dst long, capacity double")
    # capacities live in the edge-attribute side table, like the
    # reference's per-edge "capacity" attr
    return Graph.from_edges(e, directed=directed).with_edge_attrs(e)


@pytest.mark.parametrize("edges,s,t", [CLRS, DIAMOND, PIPE])
def test_max_flow_value_and_validity(spark, edges, s, t):
    g = _g(spark, edges)
    want, _ = nx.maximum_flow(_G(edges), s, t)
    value, flows = maximum_flow(g, s, t)
    assert value == pytest.approx(want)
    rows = flows.collect()
    caps = {(u, v): c for u, v, c in edges}
    # capacity constraints
    for r in rows:
        assert -1e-9 <= r.flow <= caps.get((r.src, r.dst), 0) + 1e-9
    # conservation + value
    net = {}
    for r in rows:
        net[r.src] = net.get(r.src, 0.0) + r.flow
        net[r.dst] = net.get(r.dst, 0.0) - r.flow
    for v, x in net.items():
        if v == s:
            assert x == pytest.approx(value)
        elif v == t:
            assert x == pytest.approx(-value)
        else:
            assert x == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("edges,s,t", [CLRS, DIAMOND])
def test_min_cut_partition_matches_reference(spark, edges, s, t):
    g = _g(spark, edges)
    want_val, (S, _T) = nx.minimum_cut(_G(edges), s, t)
    value, part = minimum_cut(g, s, t)
    assert value == pytest.approx(want_val)
    got_S = {r.id for r in part.filter("side = 's'").collect()}
    assert got_S == set(S)
    # the crossing arcs saturate exactly the cut value
    ce = cut_edges(g, part)
    assert (ce.agg(F.sum("capacity")).collect()[0][0] or 0.0) \
        == pytest.approx(value)
    assert minimum_cut_value(g, s, t) == pytest.approx(want_val)


def test_undirected_flow(spark):
    edges = [(0, 1, 3), (1, 2, 4), (0, 2, 1)]
    G = nx.Graph()
    for u, v, c in edges:
        G.add_edge(u, v, capacity=c)
    want, _ = nx.maximum_flow(G, 0, 2)
    assert maximum_flow_value(_g(spark, edges, directed=False), 0, 2) \
        == pytest.approx(want)


def test_validation_and_unbounded(spark):
    g = _g(spark, PIPE[0])
    with pytest.raises(ValueError, match="same node"):
        maximum_flow(g, 1, 1)
    with pytest.raises(KeyError):
        maximum_flow(g, 0, 99)
    # missing capacity attribute = infinite capacity -> unbounded s-t path
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(Unbounded):
        maximum_flow_value(Graph.from_edges(e, directed=True), 0, 2)
    # ...but an infinite arc off the s-t axis is fine (reference semantics)
    edges = [(0, 1, 2.0), (1, 2, 3.0)]
    e2 = (spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0), (0, 3, None)],
        "src long, dst long, capacity double"))
    g2 = Graph.from_edges(e2, directed=True).with_edge_attrs(e2)
    assert maximum_flow_value(g2, 0, 2) == pytest.approx(2.0)


def test_disconnected_sink_zero_flow(spark):
    e = spark.createDataFrame([(0, 1, 5.0), (2, 3, 5.0)],
                              "src long, dst long, capacity double")
    g = Graph.from_edges(e, directed=True).with_edge_attrs(e)
    value, part = minimum_cut(g, 0, 3)
    assert value == 0.0
    assert {r.id for r in part.filter("side = 's'").collect()} == {0, 1}


def test_gomory_hu_tree_all_pairs_cut_values(spark):
    """Gusfield tree parity: for every pair, the min edge on the tree path
    equals the reference's s-t min-cut value."""
    edges = [(0, 1, 3), (0, 2, 2), (1, 2, 2), (1, 3, 4), (2, 4, 5),
             (3, 4, 1), (3, 5, 6), (4, 5, 2)]
    G = nx.Graph()
    for u, v, c in edges:
        G.add_edge(u, v, capacity=c)
    g = _g(spark, edges, directed=False)
    from networkx_spark.algorithms.flow import gomory_hu_tree
    rows = gomory_hu_tree(g).collect()
    T = nx.Graph()
    for r in rows:
        T.add_edge(r.src, r.dst, weight=r.weight)
    assert nx.is_tree(T) and set(T) == set(G)
    for s in G:
        for t in G:
            if s < t:
                want = nx.minimum_cut_value(G, s, t)
                path = nx.shortest_path(T, s, t)
                got = min(T[a][b]["weight"]
                          for a, b in zip(path, path[1:]))
                assert got == pytest.approx(want), (s, t)

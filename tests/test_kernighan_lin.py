"""Kernighan-Lin bisection vs the reference (exact, seeded)."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.kernighan_lin import kernighan_lin_bisection
from networkx_spark.generators import KARATE_EDGES


def _G(edges):
    G = nx.Graph()
    G.add_nodes_from(sorted({v for e in edges for v in e}))
    for u, v in sorted(edges):
        G.add_edge(u, v)
    return G


def _got(spark, edges, **kw):
    g = Graph.from_edge_list(spark, edges, directed=False)
    sides = {r["id"]: r["side"]
             for r in kernighan_lin_bisection(g, **kw).collect()}
    A = frozenset(k for k, s in sides.items() if s == 0)
    B = frozenset(k for k, s in sides.items() if s == 1)
    return A, B


def _want(G, **kw):
    A, B = nx.community.kernighan_lin_bisection(G, **kw)
    return (frozenset(str(v) for v in A), frozenset(str(v) for v in B))


def test_karate_seeded_exact(spark):
    for seed in (0, 7):
        got = _got(spark, KARATE_EDGES, seed=seed)
        want = _want(_G(KARATE_EDGES), seed=seed)
        assert got == want, seed


def test_explicit_partition(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    part = ({0, 1, 4}, {2, 3, 5})
    got = _got(spark, edges, partition=part, seed=3)
    want = _want(_G(edges), partition=({0, 1, 4}, {2, 3, 5}), seed=3)
    assert got == want
    # the natural bisection should cut only the bridge
    assert got in (({"0", "1", "2"}, {"3", "4", "5"}),
                   ({"3", "4", "5"}, {"0", "1", "2"}))


def test_validation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    with pytest.raises(ValueError):
        kernighan_lin_bisection(g, partition=({0}, {1}))  # not a cover
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        kernighan_lin_bisection(gd)

"""double_edge_swap vs the reference (exact seeded parity)."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.swap import double_edge_swap
from networkx_spark.generators import KARATE_EDGES


def _G(edges):
    G = nx.Graph()
    G.add_nodes_from(sorted({v for e in edges for v in e}))
    for u, v in sorted(edges):
        G.add_edge(u, v)
    return G


def _edges(g):
    return {tuple(sorted((r["src"], r["dst"]))) for r in g.edges.collect()}


def test_karate_seeded_exact(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    for seed, nswap in ((1, 5), (42, 20)):
        got = _edges(double_edge_swap(g, nswap=nswap, max_tries=1000,
                                      seed=seed))
        H = nx.double_edge_swap(_G(KARATE_EDGES), nswap=nswap,
                                max_tries=1000, seed=seed)
        want = {tuple(sorted((str(u), str(v)))) for u, v in H.edges}
        assert got == want, (seed, nswap)
        # degree sequence preserved
        G0 = _G(KARATE_EDGES)
        assert sorted(d for _, d in H.degree) == \
            sorted(d for _, d in G0.degree)


def test_validation(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    with pytest.raises(ValueError):
        double_edge_swap(g, nswap=10, max_tries=5)
    small = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    with pytest.raises(ValueError):
        double_edge_swap(small)
    gd = Graph.from_edge_list(spark, KARATE_EDGES, directed=True)
    with pytest.raises(ValueError):
        double_edge_swap(gd)

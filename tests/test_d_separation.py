"""d-separation vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.d_separation import is_d_separator


def _check(spark, edges, cases):
    g = Graph.from_edge_list(spark, edges, directed=True)
    G = nx.DiGraph(edges)
    for x, y, z in cases:
        got = is_d_separator(g, {str(v) for v in x}, {str(v) for v in y},
                             {str(v) for v in z})
        want = nx.is_d_separator(G, set(x), set(y), set(z))
        assert got == want, (x, y, z)


def test_chain_fork_collider(spark):
    # chain 0->1->2, fork 1->3, collider 4: 2->4<-3
    edges = [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4)]
    _check(spark, edges, [
        ({0}, {2}, {1}),      # chain blocked by middle
        ({0}, {2}, set()),    # open
        ({2}, {3}, {1}),      # fork blocked by parent
        ({2}, {3}, set()),    # fork open via 1
        ({0}, {4}, {2, 3}),   # both paths blocked
    ])


def test_collider_opens_on_conditioning(spark):
    edges = [(0, 2), (1, 2)]
    _check(spark, edges, [
        ({0}, {1}, set()),    # collider blocks: separated
        ({0}, {1}, {2}),      # conditioning on collider opens
    ])


def test_descendant_of_collider(spark):
    edges = [(0, 2), (1, 2), (2, 3)]
    _check(spark, edges, [
        ({0}, {1}, {3}),      # conditioning on collider descendant opens
        ({0}, {1}, set()),
    ])


def test_validation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=True)
    with pytest.raises(ValueError):
        is_d_separator(g, {"0"}, {"0"}, {"1"})    # not disjoint
    with pytest.raises(KeyError):
        is_d_separator(g, {"0"}, {"9"}, {"1"})    # missing node
    gu = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        is_d_separator(gu, {"0"}, {"1"}, set())

"""LCA vs the reference's valid-LCA set."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.lca import (
    all_pairs_lowest_common_ancestor, lowest_common_ancestor)


def _valid_lcas(G, u, v):
    ca = (nx.ancestors(G, u) | {u}) & (nx.ancestors(G, v) | {v})
    return {x for x in ca if not any(s in ca for s in G.successors(x))}


def _check(spark, edges, pairs=None):
    g = Graph.from_edge_list(spark, edges, directed=True)
    G = nx.DiGraph(edges)
    got = {(r["u"], r["v"]): r["lca"]
           for r in all_pairs_lowest_common_ancestor(g, pairs=pairs).collect()}
    if pairs is None:
        from itertools import combinations_with_replacement
        pairs = list(combinations_with_replacement(sorted(G), 2))
    expect_keys = {(str(a), str(b)) for a, b in pairs
                   if _valid_lcas(G, a, b)}
    assert set(got) == expect_keys
    for (us, vs), lca in got.items():
        assert lca in {str(x) for x in _valid_lcas(G, int(us), int(vs))}, \
            (us, vs, lca)


def test_reference_example(spark):
    _check(spark, [(0, 1), (0, 3), (1, 2)])


def test_diamond_and_forest(spark):
    _check(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5)])
    _check(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5)],
           pairs=[(3, 3), (1, 2), (0, 5)])


def test_single_pair_and_default(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=True)
    assert lowest_common_ancestor(g, 0, 1) == "0"
    assert lowest_common_ancestor(g, 1, 3, default="none") == "none"


def test_validation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0)], directed=True)
    with pytest.raises(Exception):      # cycle
        all_pairs_lowest_common_ancestor(g)
    gu = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        all_pairs_lowest_common_ancestor(gu)
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    with pytest.raises(KeyError):
        all_pairs_lowest_common_ancestor(gd, pairs=[(0, 9)])

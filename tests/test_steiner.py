"""Mehlhorn Steiner tree vs the reference (equal realized weight on
distinct-weight fixtures; structural validity everywhere)."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.steiner import steiner_tree

# distinct weights -> unique SSSP distances / MST, so engine and reference
# agree on the realized tree weight
GRID = [(0, 1, 1.0), (1, 2, 2.2), (3, 4, 1.4), (4, 5, 2.7),
        (0, 3, 3.1), (1, 4, 0.9), (2, 5, 4.3), (2, 4, 1.7), (3, 1, 5.0)]
LINE = [(0, 1, 1.0), (1, 2, 1.5), (2, 3, 2.0), (3, 4, 2.5), (0, 4, 9.0)]


def _G(edges):
    G = nx.Graph()
    for u, v, w in edges:
        G.add_edge(u, v, weight=w)
    return G


def _g(spark, edges):
    e = spark.createDataFrame([(u, v, float(w)) for u, v, w in edges],
                              "src long, dst long, weight double")
    return Graph.from_edges(e, directed=False, weight="weight",
                            combine="min")


@pytest.mark.parametrize("edges,terms", [
    (GRID, [0, 2, 5]), (GRID, [0, 5]), (GRID, [0, 2, 3, 5]),
    (LINE, [0, 4]), (LINE, [0, 2, 4]),
])
def test_steiner_matches_reference_weight(spark, edges, terms):
    G = _G(edges)
    want = nx.approximation.steiner_tree(G, terms, method="mehlhorn")
    want_w = sum(d["weight"] for _, _, d in want.edges(data=True))
    rows = steiner_tree(_g(spark, edges), terms).collect()
    got_w = sum(r.weight for r in rows)
    assert got_w == pytest.approx(want_w), (terms, rows)
    # validity: the returned edges form a tree spanning all terminals
    T = nx.Graph((r.src, r.dst) for r in rows)
    assert nx.is_tree(T)
    assert all(t in T for t in terms)
    assert all(G.has_edge(r.src, r.dst) for r in rows)


def test_steiner_validation(spark):
    g = _g(spark, LINE)
    with pytest.raises(KeyError):
        steiner_tree(g, [0, 99])
    assert steiner_tree(g, [2]).count() == 0
    disc = _g(spark, [(0, 1, 1.0), (2, 3, 1.0)])
    with pytest.raises(ValueError, match="connected"):
        steiner_tree(disc, [0, 3])

"""Connected-components parity (``components/tests/test_connected.py``)."""

import pytest

from networkx_spark import Graph, connected_components, number_connected_components
from networkx_spark.algorithms.components import (
    component_sizes, is_connected, largest_component, weakly_connected_components)
from tests.conftest import as_partition

# grid_2d(2,2) + lollipop(3,3) + house (FIXTURES.md §2.2)
GRID = [(0, 1), (0, 2), (1, 3), (2, 3)]
LOLLI = [(4, 5), (4, 6), (5, 6), (6, 7), (7, 8), (8, 9)]
HOUSE = [(10, 11), (10, 12), (11, 13), (12, 13), (12, 14), (13, 14)]


def test_three_component_union(spark):
    g = Graph.from_edge_list(spark, GRID + LOLLI + HOUSE, directed=False)
    parts = as_partition(connected_components(g), "id", "component")
    want = frozenset([frozenset({"0", "1", "2", "3"}),
                      frozenset({"4", "5", "6", "7", "8", "9"}),
                      frozenset({"10", "11", "12", "13", "14"})])
    assert parts == want
    # canonical labels: min id of each component
    labels = {r.component for r in connected_components(g).collect()}
    assert labels == {"0", "10", "4"}


def test_single_component_grid(spark):
    # 4x4 grid → one component of 16 (test_connected.py:85-90)
    edges = []
    for i in range(4):
        for j in range(4):
            if i < 3:
                edges.append((f"{i},{j}", f"{i+1},{j}"))
            if j < 3:
                edges.append((f"{i},{j}", f"{i},{j+1}"))
    g = Graph.from_edge_list(spark, edges, directed=False)
    assert number_connected_components(g) == 1
    assert is_connected(g)
    assert largest_component(g).count() == 16


def test_isolated_nodes_not_connected(spark):
    g = Graph.from_edge_list(spark, [], directed=False, nodes=[1, 2])
    assert number_connected_components(g) == 2
    assert not is_connected(g)


def test_directed_rejected(spark):
    g = Graph.from_edge_list(spark, [(1, 2)], directed=True)
    with pytest.raises(ValueError):
        connected_components(g)
    # weakly connected handles it
    parts = as_partition(weakly_connected_components(g), "id", "component")
    assert parts == frozenset([frozenset({"1", "2"})])


def test_empty_graph_is_connected_raises(spark):
    g = Graph.from_edge_list(spark, [], directed=False)
    with pytest.raises(ValueError):
        is_connected(g)


def test_component_sizes_and_long_path(spark):
    # long path exercises multi-superstep propagation + lineage cutting
    path = [(i, i + 1) for i in range(25)]
    g = Graph.from_edge_list(spark, path + [(100, 101)], directed=False)
    sizes = sorted(r.size for r in component_sizes(g).collect())
    assert sizes == [2, 26]


def test_oracle_random_graph(spark):
    import networkx as nx
    import random
    rng = random.Random(7)
    G = nx.Graph()
    G.add_nodes_from(range(60))
    for _ in range(70):
        G.add_edge(rng.randrange(60), rng.randrange(60))
    want = frozenset(frozenset(str(n) for n in c) for c in nx.connected_components(G))
    g = Graph.from_edge_list(spark, list(G.edges()), directed=False,
                             nodes=list(G.nodes()))
    got = as_partition(connected_components(g), "id", "component")
    assert got == want

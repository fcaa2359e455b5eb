"""SCC parity vs the reference (``strongly_connected.py``)."""

import networkx as nx
import pytest

from networkx_spark.algorithms.scc import (condensation, is_strongly_connected,
                                           number_strongly_connected_components,
                                           strongly_connected_components)
from networkx_spark.graph import Graph
from tests.conftest import as_partition


def _ref_partition(G):
    return frozenset(frozenset(str(v) for v in c)
                     for c in nx.strongly_connected_components(G))


def test_two_cycles_and_tail(spark):
    # 1→2→3→1 (SCC), 4→5→4 (SCC), 3→4 (bridge), 6 (isolated)
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=True, nodes=[6])
    got = as_partition(strongly_connected_components(g), "id", "component")
    assert got == frozenset([frozenset("123"), frozenset("45"), frozenset("6")])


@pytest.mark.parametrize("seed", [1, 7])
def test_random_digraph_vs_reference(spark, seed):
    G = nx.gnp_random_graph(40, 0.06, seed=seed, directed=True)
    g = Graph.from_edge_list(spark, list(G.edges()), directed=True,
                             nodes=list(G.nodes()))
    got = as_partition(strongly_connected_components(g), "id", "component")
    assert got == _ref_partition(G)


def test_counts_and_connectivity(spark):
    edges = [(1, 2), (2, 1)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    assert number_strongly_connected_components(g) == 1
    assert is_strongly_connected(g)
    g2 = Graph.from_edge_list(spark, [(1, 2)], directed=True)
    assert number_strongly_connected_components(g2) == 2
    assert not is_strongly_connected(g2)


def test_undirected_rejected(spark):
    g = Graph.from_edge_list(spark, [(1, 2)], directed=False)
    with pytest.raises(ValueError):
        strongly_connected_components(g)


def test_condensation_dag(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    comp, dag = condensation(g)
    labels = {r.id: r.component for r in comp.collect()}
    assert labels["1"] == labels["2"] == labels["3"]
    assert labels["4"] == labels["5"]
    de = {(r.src, r.dst) for r in dag.edges.collect()}
    assert de == {(labels["3"], labels["4"])}

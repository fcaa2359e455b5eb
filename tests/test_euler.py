"""Eulerian checks + tournament recognition vs the reference."""

import networkx as nx
import pytest

from networkx_spark.algorithms.euler import (
    has_eulerian_path, is_eulerian, is_tournament)
from networkx_spark.graph import Graph


def _graph(spark, nxg, directed=None):
    directed = nxg.is_directed() if directed is None else directed
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                            directed=directed)


UND = [nx.cycle_graph(5), nx.path_graph(4), nx.complete_graph(5),
       nx.petersen_graph(),
       nx.Graph([(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])]


@pytest.mark.parametrize("nxg", UND,
                         ids=["cycle", "path", "k5", "petersen", "2tri"])
def test_eulerian_undirected(spark, nxg):
    g = _graph(spark, nxg)
    assert is_eulerian(g) == nx.is_eulerian(nxg)
    assert has_eulerian_path(g) == nx.has_eulerian_path(nxg)


DIR = [nx.DiGraph([(0, 1), (1, 2), (2, 0)]),            # directed cycle
       nx.DiGraph([(0, 1), (1, 2)]),                    # open path
       nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 2)])]    # one unbalanced pair


@pytest.mark.parametrize("nxg", DIR, ids=["dicycle", "dipath", "unbal"])
def test_eulerian_directed(spark, nxg):
    g = _graph(spark, nxg)
    assert is_eulerian(g) == nx.is_eulerian(nxg)
    assert has_eulerian_path(g) == nx.has_eulerian_path(nxg)


def test_tournament(spark):
    t = nx.tournament.random_tournament(6, seed=3)
    assert is_tournament(_graph(spark, t)) is True
    t.remove_edge(*next(iter(t.edges())))
    assert is_tournament(_graph(spark, t)) is False
    both = nx.DiGraph([(0, 1), (1, 0), (0, 2), (1, 2)])
    assert is_tournament(_graph(spark, both)) == \
        nx.tournament.is_tournament(both) is False

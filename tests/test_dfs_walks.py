"""DFS family + number_of_walks vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.dfs import (
    dfs_edges, dfs_postorder_nodes, dfs_preorder_nodes, dfs_tree)
from networkx_spark.algorithms.walk_counts import number_of_walks
from networkx_spark.generators import KARATE_EDGES


def _G(edges, directed=False):
    # build in sorted adjacency order so reference order == natural order
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_nodes_from(sorted({v for e in edges for v in e}))
    for u, v in sorted(edges):
        G.add_edge(u, v)
    return G


def test_dfs_edges_and_orders(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 6)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    G = _G(edges)
    assert dfs_edges(g, 0) == [(str(u), str(v))
                               for u, v in nx.dfs_edges(G, 0)]
    assert dfs_edges(g) == [(str(u), str(v)) for u, v in nx.dfs_edges(G)]
    assert dfs_preorder_nodes(g, 0) == [str(v)
                                        for v in nx.dfs_preorder_nodes(G, 0)]
    assert dfs_postorder_nodes(g, 0) == [
        str(v) for v in nx.dfs_postorder_nodes(G, 0)]
    # depth limit
    path = [(0, 1), (1, 2), (2, 3)]
    gp = Graph.from_edge_list(spark, path, directed=False)
    assert dfs_edges(gp, 0, depth_limit=2) == [
        (str(u), str(v)) for u, v in nx.dfs_edges(_G(path), 0, depth_limit=2)]


def test_dfs_tree_directed(spark):
    edges = [(0, 1), (1, 2), (2, 0), (1, 3)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    t = dfs_tree(g, 0)
    T = nx.dfs_tree(_G(edges, directed=True), 0)
    assert {(r["src"], r["dst"]) for r in t.edges.collect()} == \
        {(str(u), str(v)) for u, v in T.edges}


def _walks(spark, edges, k, directed=False):
    g = Graph.from_edge_list(spark, edges, directed=directed)
    return {(r["u"], r["v"]): r["walks"]
            for r in number_of_walks(g, k).collect()}


def _np_walks(G, k):
    # A**k in plain numpy (nx.number_of_walks needs scipy, absent here)
    import numpy as np
    nodes = sorted(G)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in G.edges:
        A[idx[u], idx[v]] = 1
        if not G.is_directed():
            A[idx[v], idx[u]] = 1
    M = np.linalg.matrix_power(A, k)
    return {(str(u), str(v)): int(M[idx[u], idx[v]])
            for u in nodes for v in nodes if M[idx[u], idx[v]] > 0}


def test_number_of_walks(spark):
    G = nx.karate_club_graph()
    for k in (0, 1, 3):
        got = _walks(spark, KARATE_EDGES, k)
        assert got == _np_walks(G, k), k


def test_number_of_walks_directed_and_validation(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _walks(spark, edges, 4, directed=True)
    assert got == _np_walks(nx.DiGraph(edges), 4)
    g = Graph.from_edge_list(spark, edges, directed=True)
    with pytest.raises(ValueError):
        number_of_walks(g, -1)

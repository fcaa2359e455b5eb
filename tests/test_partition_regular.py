"""edge_betweenness_partition + is_regular vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.girvan_newman import edge_betweenness_partition
from networkx_spark.algorithms.regular import is_k_regular, is_regular


def _parts(df):
    by = {}
    for r in df.collect():
        by.setdefault(r["community"], set()).add(r["id"])
    return set(map(frozenset, by.values()))


def _ref(G, k):
    parts = nx.community.edge_betweenness_partition(G, k)
    return set(frozenset(str(v) for v in p) for p in parts)


def test_partition_levels(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    G = nx.Graph(edges)
    g = Graph.from_edge_list(spark, edges, directed=False)
    assert _parts(edge_betweenness_partition(g, 1)) == _ref(G, 1)
    assert _parts(edge_betweenness_partition(g, 2)) == _ref(G, 2)
    assert _parts(edge_betweenness_partition(g, 6)) == _ref(G, 6)


def test_partition_validation(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        edge_betweenness_partition(g, 0)
    with pytest.raises(ValueError):
        edge_betweenness_partition(g, 3)


def test_is_regular(spark):
    ring = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)],
                                directed=False)
    assert is_regular(ring) is True
    assert is_k_regular(ring, 2) is True
    assert is_k_regular(ring, 3) is False
    star = Graph.from_edge_list(spark, [(0, i) for i in (1, 2, 3)],
                                directed=False)
    assert is_regular(star) is False
    dring = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)],
                                 directed=True)
    assert is_regular(dring) is True
    with pytest.raises(ValueError):
        is_k_regular(dring, 1)

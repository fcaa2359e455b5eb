"""Eigenvector + Katz centrality vs the reference oracle."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.eigenvector import eigenvector_centrality
from networkx_spark.algorithms.katz import katz_centrality
from networkx_spark.algorithms.pagerank import PowerIterationFailedConvergence
from networkx_spark.generators import KARATE_EDGES
from tests.conftest import as_dict


def _karate(spark):
    return Graph.from_edge_list(spark, KARATE_EDGES, directed=False)


def _ref():
    G = nx.Graph()
    G.add_edges_from(KARATE_EDGES)
    return G


def test_eigenvector_matches_reference(spark):
    got = as_dict(eigenvector_centrality(_karate(spark)), "id", "centrality")
    want = nx.eigenvector_centrality(_ref())
    assert set(got) == {str(k) for k in want}
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_eigenvector_directed_matches_reference(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    got = as_dict(eigenvector_centrality(g, max_iter=500), "id", "centrality")
    G = nx.DiGraph(edges)
    want = nx.eigenvector_centrality(G, max_iter=500)
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_eigenvector_nstart_and_errors(spark):
    g = _karate(spark)
    want = nx.eigenvector_centrality(_ref(), nstart={v: v + 1 for v in _ref()})
    got = as_dict(
        eigenvector_centrality(g, nstart={str(v): v + 1 for v in _ref()}),
        "id", "centrality")
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)
    with pytest.raises(ValueError, match="zero"):
        eigenvector_centrality(g, nstart={str(v): 0 for v in _ref()})
    with pytest.raises(PowerIterationFailedConvergence):
        eigenvector_centrality(g, max_iter=2)


def test_katz_matches_reference(spark):
    got = as_dict(katz_centrality(_karate(spark)), "id", "centrality")
    want = nx.katz_centrality(_ref())
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_katz_beta_dict_unnormalized(spark):
    beta = {v: 1.0 + (v % 3) for v in _ref()}
    want = nx.katz_centrality(_ref(), beta=beta, normalized=False)
    got = as_dict(
        katz_centrality(_karate(spark),
                        beta={str(k): v for k, v in beta.items()},
                        normalized=False),
        "id", "centrality")
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_katz_beta_dict_missing_node_raises(spark):
    with pytest.raises(ValueError, match="every node"):
        katz_centrality(_karate(spark), beta={"0": 1.0})

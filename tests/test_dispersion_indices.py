"""dispersion + Schultz/Gutman indices vs the reference."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.dispersion import dispersion
from networkx_spark.algorithms.distance_measures import (
    gutman_index, schultz_index)
from networkx_spark.generators import KARATE_EDGES


def test_dispersion_karate(spark):
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    got = {(r["u"], r["v"]): r["dispersion"]
           for r in dispersion(g).collect()}
    want = nx.dispersion(nx.karate_club_graph())
    flat = {(str(u), str(v)): x for u, d in want.items()
            for v, x in d.items()}
    assert set(got) == set(flat)
    for p, x in flat.items():
        assert got[p] == pytest.approx(x, abs=1e-12), p


def test_dispersion_unnormalized(spark):
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
             (2, 5), (4, 5)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = {(r["u"], r["v"]): r["dispersion"]
           for r in dispersion(g, normalized=False).collect()}
    want = nx.dispersion(nx.Graph(edges), normalized=False)
    flat = {(str(u), str(v)): float(x) for u, d in want.items()
            for v, x in d.items()}
    assert got == flat


def test_schultz_gutman(spark):
    # reference implementations need scipy (shortest_path_length is fine,
    # but is_connected path imports) — compute the published formulas
    # directly as the oracle
    G = nx.karate_club_graph()
    spl = dict(nx.shortest_path_length(G))
    d = dict(G.degree)
    want_s = sum(dist * (d[u] + d[v]) for u, i in spl.items()
                 for v, dist in i.items()) / 2
    want_g = sum(dist * d[u] * d[v] for u, i in spl.items()
                 for v, dist in i.items()) / 2
    g = Graph.from_edge_list(spark, KARATE_EDGES, directed=False)
    assert schultz_index(g) == pytest.approx(want_s)
    assert gutman_index(g) == pytest.approx(want_g)


def test_schultz_disconnected_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError):
        schultz_index(g)

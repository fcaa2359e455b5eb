"""max_weight_matching vs the reference blossom implementation (exact
kernel: total weight must match; the approx path: validity + ½ bound)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark import Graph
from networkx_spark.algorithms.matching import (max_weight_matching,
                                                max_weight_matching_approx)

FIXTURES = [
    # reference test_matching.py-style fixtures
    [(1, 2, 5), (2, 3, 11), (3, 4, 5)],                      # middle edge wins
    [(1, 2, 2), (1, 3, (-2)), (2, 3, 1), (2, 4, (-1)), (3, 4, (-6))],
    [(1, 2, 8), (1, 3, 9), (2, 3, 10), (3, 4, 7)],           # odd cycle
    [(0, 1, 3), (1, 2, 3), (2, 3, 3), (3, 0, 3), (0, 2, 4)],
    [(1, 2, 10), (2, 3, 11), (3, 4, 12), (4, 1, 10), (1, 3, 5)],
]


def _G(edges):
    G = nx.Graph()
    for u, v, w in edges:
        G.add_edge(u, v, weight=w)
    return G


def _g(spark, edges):
    e = spark.createDataFrame([(u, v, float(w)) for u, v, w in edges],
                              "src long, dst long, weight double")
    return Graph.from_edges(e, directed=False, weight="weight",
                            combine="max")


def _wsum(G, match):
    return sum(G[int(u)][int(v)]["weight"] for u, v in match)


@pytest.mark.parametrize("edges", FIXTURES)
@pytest.mark.parametrize("maxcard", [False, True])
def test_exact_matches_reference(spark, edges, maxcard):
    G = _G(edges)
    want = nx.max_weight_matching(G, maxcardinality=maxcard)
    got = max_weight_matching(_g(spark, edges), maxcardinality=maxcard)
    # the optimum VALUE must match (edge sets may tie); and got must be a
    # valid matching over real edges
    assert _wsum(G, got) == pytest.approx(_wsum(G, want))
    assert len(got) == len(want)
    seen = set()
    for u, v in got:
        assert G.has_edge(int(u), int(v))
        assert u not in seen and v not in seen
        seen.update((u, v))


def test_exact_cap_raises(spark):
    edges = [(i, i + 1, 1) for i in range(30)]
    with pytest.raises(ValueError, match="max_vertices"):
        max_weight_matching(_g(spark, edges))


def test_approx_half_bound_and_validity(spark):
    edges = [(i, (i * 7 + 3) % 40, float(1 + (i * 13) % 9))
             for i in range(60)]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    G = _G(edges)
    opt = _wsum(G, nx.max_weight_matching(G))
    out = max_weight_matching_approx(_g(spark, edges)).collect()
    seen = set()
    tot = 0.0
    for r in out:
        assert r.src not in seen and r.dst not in seen
        seen.update((r.src, r.dst))
        tot += r.weight
    assert tot >= 0.5 * opt - 1e-9
    # determinism across partitioning
    again = max_weight_matching_approx(
        Graph.from_edges(
            spark.createDataFrame([(u, v, float(w)) for u, v, w in edges],
                                  "src long, dst long, weight double")
            .repartition(7),
            directed=False, weight="weight", combine="max"))
    assert ({(r.src, r.dst) for r in out}
            == {(r.src, r.dst) for r in again.collect()})


def test_matching_predicates(spark):
    from networkx_spark.algorithms.matching import (is_matching,
                                                    is_maximal_matching,
                                                    is_perfect_matching)
    g = _g(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)])

    def m(pairs):
        return spark.createDataFrame(list(pairs) or [(0, 0)],
                                     "src long, dst long").limit(len(pairs))
    assert is_matching(g, m([(0, 1), (2, 3)]))
    assert not is_matching(g, m([(0, 1), (1, 2)]))      # shared endpoint
    assert not is_matching(g, m([(0, 2)]))              # non-edge
    assert is_maximal_matching(g, m([(0, 1), (2, 3)]))
    assert not is_maximal_matching(g, m([(0, 1)]))      # (2,3) addable
    assert is_perfect_matching(g, m([(0, 1), (2, 3)]))
    assert not is_perfect_matching(g, m([(0, 1)]))


def test_min_edge_cover_matches_reference_size(spark):
    from networkx_spark.algorithms.matching import min_edge_cover
    fixtures = [
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)],        # path P5
        [(0, 1, 1), (0, 2, 1), (0, 3, 1)],                    # star
        [(0, 1, 1), (1, 2, 1), (2, 0, 1), (3, 4, 1)],         # tri + edge
    ]
    for edges in fixtures:
        G = _G(edges)
        want = len(nx.min_edge_cover(G))
        rows = min_edge_cover(_g(spark, edges)).collect()
        got = {(r.src, r.dst) for r in rows}
        assert len(got) == want, (edges, got)
        covered = {v for e in got for v in e}
        assert covered == set(G.nodes)
        assert all(G.has_edge(int(u), int(v)) for u, v in got)
    # isolated vertex raises
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False, nodes=[0, 1, 2])
    with pytest.raises(ValueError, match="no edge incident"):
        min_edge_cover(g)

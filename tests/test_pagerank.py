"""PageRank parity with the reference test suite
(``networkx/algorithms/link_analysis/tests/test_pagerank.py``), goldens from
FIXTURES.md §2.1; randomized-graph parity against the reference's pure-Python
kernel."""

import pytest

from networkx_spark import Graph, pagerank, PowerIterationFailedConvergence
from tests.conftest import as_dict

# 6-node digraph with dangling node 2 (test_pagerank.py:25-53)
EDGES = [(1, 2), (1, 3), (3, 1), (3, 2), (3, 5), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4)]
GOLDEN_A09 = {"1": 0.03721197, "2": 0.05395735, "3": 0.04150565,
              "4": 0.37508082, "5": 0.20599833, "6": 0.28624589}


@pytest.fixture(scope="module")
def g6(spark):
    return Graph.from_edge_list(spark, EDGES, directed=True)


def _close(got, want, tol=1e-4):
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=tol), k


def test_golden_alpha09(g6):
    got = as_dict(pagerank(g6, alpha=0.9, tol=1e-8), "id", "rank")
    _close(got, GOLDEN_A09)


def test_custom_dangling_distribution(g6):
    # test_pagerank.py:55-61,165
    dangling = {1: 2, 2: 3, 3: 0, 4: 0, 5: 0, 6: 0}
    got = as_dict(pagerank(g6, dangling=dangling), "id", "rank")
    _close(got, {"1": 0.10844518, "2": 0.18618601, "3": 0.0710892,
                 "4": 0.2683668, "5": 0.15919783, "6": 0.20671497})


def test_personalization_complete(spark):
    # complete_graph(4), test_pagerank.py:98-109
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    g = Graph.from_edge_list(spark, k4, directed=False)
    got = as_dict(pagerank(g, alpha=0.85,
                           personalization={0: 1, 1: 1, 2: 4, 3: 4}), "id", "rank")
    _close(got, {"0": 0.23246732, "1": 0.23246732, "2": 0.26753267, "3": 0.26753267})


def test_personalization_incomplete_dict(spark):
    # test_pagerank.py:117-143
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    g = Graph.from_edge_list(spark, k4, directed=False)
    got = as_dict(pagerank(g, personalization={3: 1}), "id", "rank")
    _close(got, {"0": 0.22077931, "1": 0.22077931, "2": 0.22077931, "3": 0.33766205})


def test_zero_personalization_raises(spark):
    g = Graph.from_edge_list(spark, [(1, 2)], directed=True)
    with pytest.raises(ZeroDivisionError):
        pagerank(g, personalization={1: 0, 2: 0})


def test_max_iter_zero_raises(g6):
    with pytest.raises(PowerIterationFailedConvergence):
        pagerank(g6, max_iter=0)


def test_empty_graph(spark):
    g = Graph.from_edge_list(spark, [], directed=True)
    assert pagerank(g).count() == 0


def test_nstart_does_not_change_fixpoint(g6):
    # test_pagerank.py:70-73
    base = as_dict(pagerank(g6, alpha=0.85), "id", "rank")
    warm = as_dict(pagerank(g6, alpha=0.85, nstart={n: 1.0 / 2 for n in range(1, 7)}),
                   "id", "rank")
    _close(warm, base, tol=1e-6)


def test_multigraph_parallel_edges_sum(spark):
    # test_pagerank.py:178-189: (1,2)x3 (2,3)x2 (3,3prime)x2 — parallel edges
    # sum into weight; the reference mixes int 3 and str "3" node ids, our
    # engine keys everything by string so we rename the str node to "3p".
    edges = [(1, 2)] * 3 + [(2, 3)] * 2 + [("3p", 3)] * 2
    g = Graph.from_edge_list(spark, edges, directed=False)
    got = as_dict(pagerank(g), "id", "rank")
    _close(got, {"1": 0.21066049, "2": 0.33953088, "3": 0.28933951, "3p": 0.16046912})


def test_weighted_vs_reference_oracle(spark):
    import networkx as nx
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
    import random
    rng = random.Random(42)
    G = nx.DiGraph()
    for _ in range(300):
        u, v = rng.randrange(40), rng.randrange(40)
        w = rng.uniform(0.1, 3.0)
        if G.has_edge(u, v):
            G[u][v]["weight"] += w
        else:
            G.add_edge(u, v, weight=w)
    want = {str(k): v for k, v in _pagerank_python(G, alpha=0.85, tol=1e-10).items()}
    g = Graph.from_edge_list(
        spark, [(u, v, d["weight"]) for u, v, d in G.edges(data=True)], directed=True)
    got = as_dict(pagerank(g, alpha=0.85, tol=1e-10), "id", "rank")
    _close(got, want, tol=1e-6)


def test_checkpoint_resume(tmp_path, g6):
    ck = str(tmp_path / "ck")
    # run 3 supersteps, then resume to convergence — same answer
    with pytest.raises(PowerIterationFailedConvergence):
        pagerank(g6, alpha=0.9, tol=1e-8, max_iter=3, checkpoint_dir=ck)
    got = as_dict(
        pagerank(g6, alpha=0.9, tol=1e-8, checkpoint_dir=ck, resume=True),
        "id", "rank")
    _close(got, GOLDEN_A09)
    import json, os
    lines = [json.loads(l) for l in open(os.path.join(ck, "pagerank_state", "metrics.jsonl"))]
    assert all("residual" in m and "rows" in m for m in lines)
    assert lines[0]["rows"] == 6

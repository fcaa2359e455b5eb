"""Deterministic random-walk corpus (algorithms/walks.py)."""

import networkx as nx
import pytest

from networkx_spark.algorithms.walks import random_walks, _M, _A
from networkx_spark.graph import Graph


def _graph(spark, nxg, directed=False):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=directed)


def _lcg_py(x):
    x = (x % _M + _M) % _M
    return (x * _A % _M) * _A % _M


def _replay(nxg, walk_id, walk_no, length, seed, directed=False):
    """Pure-Python replay of the engine's draw rule."""
    cur, path = walk_id, [walk_id]
    for t in range(1, length + 1):
        nbrs = sorted(nxg.successors(cur) if directed else nxg.neighbors(cur))
        if not nbrs:
            break
        draw = _lcg_py(seed * 1_000_003 + walk_id * 69_621
                       + walk_no * 8_191 + t * 127)
        cur = nbrs[draw % len(nbrs)]
        path.append(cur)
    return path


def test_walks_replay_exactly(spark):
    nxg = nx.karate_club_graph()
    got = {}
    for r in random_walks(_graph(spark, nxg), walk_length=6, num_walks=2,
                          seed=5).collect():
        got.setdefault((r.walk_id, r.walk_no), {})[r.step] = r.node
    assert len(got) == 34 * 2
    for (wid, wno), steps in got.items():
        path = [steps[i] for i in sorted(steps)]
        assert path == _replay(nxg, wid, wno, 6, 5)


def test_walks_every_step_is_an_edge(spark):
    nxg = nx.lollipop_graph(5, 4)
    rows = random_walks(_graph(spark, nxg), walk_length=8, seed=2).collect()
    paths = {}
    for r in rows:
        paths.setdefault(r.walk_id, {})[r.step] = r.node
    for wid, steps in paths.items():
        seq = [steps[i] for i in sorted(steps)]
        assert seq[0] == wid
        for a, b in zip(seq, seq[1:]):
            assert nxg.has_edge(a, b)


def test_walks_directed_sink_stops_early(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2)])   # 2 is a sink
    g = _graph(spark, nxg, directed=True)
    rows = random_walks(g, walk_length=5, seed=1).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r.walk_id, []).append((r.step, r.node))
    assert sorted(by_walk[0]) == [(0, 0), (1, 1), (2, 2)]  # stops at sink
    assert sorted(by_walk[2]) == [(0, 2)]


def test_walks_partitioning_independent(spark):
    nxg = nx.cycle_graph(8)
    g = _graph(spark, nxg)
    a = sorted(map(tuple, random_walks(g, 4, seed=9).collect()))
    g2 = Graph.from_edges(g.edges.repartition(13), directed=False)
    b = sorted(map(tuple, random_walks(g2, 4, seed=9).collect()))
    assert a == b


def test_walks_string_ids_rejected(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="integral"):
        random_walks(Graph.from_edges(e, directed=False), 3)

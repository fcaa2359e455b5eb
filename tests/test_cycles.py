"""Cycle basis vs the reference's cycle space (algorithms/cycles.py).

The reference's basis uses its own spanning tree, so cycles differ
textually; parity is the CYCLE SPACE: same count (m - n + c), every
returned cycle is a real simple closed walk, and the GF(2) edge-vector
span equals the reference basis's span (mutual rank checks)."""

import networkx as nx
import numpy as np
import pytest

from networkx_spark.algorithms.cycles import cycle_basis, has_cycle
from networkx_spark.graph import Graph


def _graph(spark, nxg):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                            directed=False)


def _collect_cycles(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.cycle_id, {})[r.pos] = r.node
    return [[steps[i] for i in sorted(steps)] for steps in out.values()]


def _edge_vectors(cycles, eindex):
    vecs = []
    for cyc in cycles:
        v = np.zeros(len(eindex), dtype=np.int8)
        closed = cyc + [cyc[0]]
        for a, b in zip(closed, closed[1:]):
            v[eindex[tuple(sorted((a, b)))]] ^= 1
        vecs.append(v)
    return np.array(vecs)


def _gf2_rank(mat):
    m = mat.copy() % 2
    rank, cols = 0, m.shape[1]
    for c in range(cols):
        piv = None
        for r in range(rank, m.shape[0]):
            if m[r, c]:
                piv = r
                break
        if piv is None:
            continue
        m[[rank, piv]] = m[[piv, rank]]
        for r in range(m.shape[0]):
            if r != rank and m[r, c]:
                m[r] ^= m[rank]
        rank += 1
    return rank


CASES = [nx.cycle_graph(5), nx.karate_club_graph(),
         nx.barbell_graph(4, 2), nx.gnm_random_graph(25, 40, seed=11)]
IDS = ["cycle", "karate", "barbell", "random"]


@pytest.mark.parametrize("nxg", CASES, ids=IDS)
def test_cycle_basis_spans_reference_space(spark, nxg):
    cycles = _collect_cycles(cycle_basis(_graph(spark, nxg)))
    n_expected = (nxg.number_of_edges() - nxg.number_of_nodes()
                  + nx.number_connected_components(nxg))
    assert len(cycles) == n_expected
    eindex = {tuple(sorted(e)): i for i, e in enumerate(nxg.edges())}
    for cyc in cycles:
        assert len(cyc) == len(set(cyc)) >= 3      # simple, no repeats
        closed = cyc + [cyc[0]]
        for a, b in zip(closed, closed[1:]):       # every hop is an edge
            assert nxg.has_edge(a, b)
    ours = _edge_vectors(cycles, eindex)
    ref = _edge_vectors(nx.cycle_basis(nxg), eindex)
    assert _gf2_rank(ours) == len(cycles)          # independent
    # same span: stacking either basis on the other adds no rank
    assert _gf2_rank(np.vstack([ours, ref])) == len(cycles)


def test_has_cycle(spark):
    assert has_cycle(_graph(spark, nx.cycle_graph(4))) is True
    assert has_cycle(_graph(spark, nx.path_graph(4))) is False
    dag = Graph.from_edges(
        _graph(spark, nx.path_graph(3)).edges, directed=True)
    assert has_cycle(dag) is False


def test_all_simple_paths_matches_reference(spark):
    from networkx_spark.algorithms.cycles import all_simple_paths
    nxg = nx.karate_club_graph()
    g = _graph(spark, nxg)
    got = {tuple(r.path) for r in all_simple_paths(g, 0, 33, 3).collect()}
    want = {tuple(p) for p in nx.all_simple_paths(nxg, 0, 33, cutoff=3)}
    assert got == want and len(got) > 5


def test_all_simple_paths_directed(spark):
    from networkx_spark.algorithms.cycles import all_simple_paths
    dag = nx.DiGraph([(0, 1), (1, 2), (0, 2), (2, 3)])
    g = Graph.from_edges(
        spark.createDataFrame(list(dag.edges()), "src long, dst long"),
        directed=True)
    got = {tuple(r.path) for r in all_simple_paths(g, 0, 3, 4).collect()}
    assert got == {(0, 1, 2, 3), (0, 2, 3)}

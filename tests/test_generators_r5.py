"""Round-5 fixture generators: gnm / Barabási–Albert (exact reference
parity), caveman / ring_of_cliques (deterministic parity), LFR
(structural contract + ground-truth community recovery)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkx_spark.generators import (barabasi_albert_graph, caveman_graph,
                                       connected_caveman_graph,
                                       gnm_random_graph, lfr_benchmark_graph,
                                       ring_of_cliques)


def _edges(g):
    return {(r.src, r.dst) for r in g.edges.select("src", "dst").collect()}


def _ref_edges(G):
    return {tuple(sorted(e)) for e in G.edges}


def test_gnm_reference_parity(spark):
    for n, m, seed in [(12, 20, 1), (9, 10, 7)]:
        got = _edges(gnm_random_graph(spark, n, m, seed, method="reference"))
        want = _ref_edges(nx.gnm_random_graph(n, m, seed=seed))
        assert got == want, (n, m, seed)


def test_gnm_hash_variant(spark):
    g = gnm_random_graph(spark, 30, 50, seed=3)
    e = _edges(g)
    assert len(e) == 50
    assert all(0 <= u < v < 30 for u, v in e)
    # deterministic
    assert e == _edges(gnm_random_graph(spark, 30, 50, seed=3))
    assert e != _edges(gnm_random_graph(spark, 30, 50, seed=4))
    # m >= max edges -> complete graph
    assert len(_edges(gnm_random_graph(spark, 5, 99))) == 10


def test_barabasi_albert_reference_parity(spark):
    for n, m, seed in [(25, 2, 5), (15, 3, 11)]:
        got = _edges(barabasi_albert_graph(spark, n, m, seed))
        want = _ref_edges(nx.barabasi_albert_graph(n, m, seed=seed))
        assert got == want, (n, m, seed)
    with pytest.raises(ValueError):
        barabasi_albert_graph(spark, 5, 5)


def test_caveman_family_parity(spark):
    assert _edges(caveman_graph(spark, 3, 4)) == _ref_edges(
        nx.caveman_graph(3, 4))
    assert _edges(connected_caveman_graph(spark, 4, 3)) == _ref_edges(
        nx.connected_caveman_graph(4, 3))
    assert _edges(ring_of_cliques(spark, 4, 3)) == _ref_edges(
        nx.ring_of_cliques(4, 3))
    with pytest.raises(ValueError):
        ring_of_cliques(spark, 1, 3)


def test_lfr_structural_contract(spark):
    g, comm = lfr_benchmark_graph(spark, 300, mu=0.1, min_degree=4,
                                  min_community=30, seed=5)
    rows = comm.collect()
    assert len(rows) == 300
    sizes = {}
    for r in rows:
        sizes[r.community] = sizes.get(r.community, 0) + 1
    assert all(s >= 2 for s in sizes.values()) and len(sizes) >= 2
    # realized mixing: fraction of inter-community edges ~ mu (loose band)
    cm = {r.id: r.community for r in rows}
    e = [(r.src, r.dst) for r in g.edges.collect()]
    inter = sum(cm[u] != cm[v] for u, v in e) / len(e)
    assert inter < 0.25, inter
    # determinism
    g2, comm2 = lfr_benchmark_graph(spark, 300, mu=0.1, min_degree=4,
                                    min_community=30, seed=5)
    assert _edges(g) == _edges(g2)
    assert {(r.id, r.community) for r in comm2.collect()} \
        == {(r.id, r.community) for r in rows}


def test_lfr_ground_truth_recoverable_by_louvain(spark):
    """The planted partition is strong enough at mu=0.05 for Louvain to
    recover it almost exactly — the fixture does its job as community-
    detection ground truth."""
    from networkx_spark.algorithms.louvain import louvain_communities
    g, comm = lfr_benchmark_graph(spark, 200, mu=0.05, min_degree=5,
                                  min_community=40, seed=9)
    got = louvain_communities(g, seed=3)
    truth = {r.id: r.community for r in comm.collect()}
    labels = {r["id"]: r["label"] for r in got.collect()}
    # pairwise agreement (Rand-style) on a sample of pairs
    ids = sorted(truth)
    agree = tot = 0
    for i in range(0, len(ids), 3):
        for j in range(i + 3, len(ids), 7):
            a, b = ids[i], ids[j]
            same_t = truth[a] == truth[b]
            same_g = labels[str(a)] == labels[str(b)] \
                if isinstance(next(iter(labels)), str) \
                else labels[a] == labels[b]
            agree += (same_t == same_g)
            tot += 1
    assert agree / tot > 0.9, agree / tot

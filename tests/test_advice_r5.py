"""Round-5 regression tests for the ADVICE.md parity fixes:

1. trophic_levels fails fast (not max_iter jobs) when no basal-fed path
   exists — reference raises NetworkXError on the singular matrix.
2. schultz/gutman degree-distance indices return 0.0 on n <= 1 graphs
   (trivially connected, empty pair sum) instead of TypeError.
3. quotient_graph rejects mapping rows naming non-vertices (reference
   rejects invalid partitions of G's node set).
4. double_edge_swap raises on self-loop input (seeded RNG parity is only
   defined for loop-free graphs).
5. percolation_centrality raises ZeroDivisionError for n <= 2 like the
   reference's 1/(n-2) rescale.
"""

import time

import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.distance_measures import (
    degree_distance_indices, gutman_index, schultz_index)
from networkx_spark.algorithms.percolation import percolation_centrality
from networkx_spark.algorithms.swap import double_edge_swap
from networkx_spark.algorithms.trophic import trophic_levels
from networkx_spark.operators.minors import quotient_graph


def test_trophic_no_basal_fails_fast(spark):
    # pure 3-cycle: no basal node at all -> immediate raise (no supersteps)
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    t0 = time.time()
    with pytest.raises(ValueError, match="basal"):
        trophic_levels(g)
    assert time.time() - t0 < 60


def test_trophic_unreachable_cycle_stalls_out_fast(spark):
    # basal node 9 feeds 0->1, but the 2-cycle {5,6} has no basal path:
    # the Jacobi residual never contracts there -> stalled-residual raise
    g = Graph.from_edge_list(
        spark, [(9, 0), (0, 1), (5, 6), (6, 5)], directed=True)
    t0 = time.time()
    with pytest.raises(ValueError, match="basal"):
        trophic_levels(g, max_iter=10_000)
    # must fail from the stall detector (a handful of supersteps), not
    # from exhausting max_iter
    assert time.time() - t0 < 120


def test_degree_distance_trivial_graphs(spark):
    lone = Graph(spark.createDataFrame([], "src string, dst string"),
                 directed=False,
                 vertices=spark.createDataFrame([("a",)], "id string"))
    assert schultz_index(lone) == 0.0
    assert gutman_index(lone) == 0.0
    assert degree_distance_indices(lone) == (0.0, 0.0)
    empty = Graph(spark.createDataFrame([], "src string, dst string"),
                  directed=False,
                  vertices=spark.createDataFrame([], "id string"))
    assert schultz_index(empty) == 0.0
    assert degree_distance_indices(empty) == (0.0, 0.0)


def test_quotient_graph_rejects_stray_mapping_rows(spark):
    g = Graph.from_edge_list(spark, [(1, 2), (2, 3)], directed=False)
    # "0" is not a vertex; before the fix it silently became the block's
    # min-member label
    part = spark.createDataFrame(
        [("0", "A"), ("1", "A"), ("2", "A"), ("3", "B")], "id string, b string")
    with pytest.raises(ValueError, match="partition"):
        quotient_graph(g, part)
    ok = spark.createDataFrame(
        [("1", "A"), ("2", "A"), ("3", "B")], "id string, b string")
    q = quotient_graph(g, ok)
    assert {(r["src"], r["dst"]) for r in q.edges.collect()} == {("1", "3")}


def test_double_edge_swap_rejects_self_loops(spark):
    g = Graph.from_edge_list(
        spark, [(0, 0), (0, 1), (1, 2), (2, 3), (3, 0)], directed=False)
    with pytest.raises(ValueError, match="loop-free"):
        double_edge_swap(g, nswap=1, max_tries=10, seed=1)


def test_percolation_small_graph_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ZeroDivisionError):
        percolation_centrality(g, {0: 0.5, 1: 0.5})


def test_resistance_distance_closed_forms(spark):
    """Textbook electrical values: series resistors on a path, the 2/3
    triangle, the 3/4-vs-1 square — an oracle independent of the
    reference (whose pinv path needs scipy, absent here)."""
    from networkx_spark.algorithms.distance_measures import (
        effective_graph_resistance, resistance_distance)

    path = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    assert resistance_distance(path, "0", "2") == pytest.approx(2.0)
    tri = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)],
                               directed=False)
    assert resistance_distance(tri, "0", "1") == pytest.approx(2 / 3)
    sq = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)],
                              directed=False)
    assert resistance_distance(sq, "0", "1") == pytest.approx(3 / 4)
    assert resistance_distance(sq, "0", "2") == pytest.approx(1.0)
    # weighted: resistance attribute (invert_weight) — two parallel 2-ohm
    # wires = 1 ohm
    par = Graph.from_edge_list(
        spark, [(0, 1, 2.0), (0, 2, 1.0), (2, 1, 1.0)], directed=False)
    got = resistance_distance(par, "0", "1", weight="weight")
    assert got == pytest.approx(1.0)
    # Kirchhoff index of the triangle: 3 pairs x 2/3
    assert effective_graph_resistance(tri) == pytest.approx(2.0)
    # full-slice DataFrame form is symmetric with a zero diagonal
    allp = {(r.a, r.b): r.resistance
            for r in resistance_distance(sq).collect()}
    assert allp[("0", "0")] == pytest.approx(0.0)
    assert allp[("1", "3")] == pytest.approx(allp[("3", "1")])
    # disconnected input raises like the reference
    disc = Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError, match="connected"):
        resistance_distance(disc, "0", "3")

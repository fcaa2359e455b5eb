"""Kernighan–Lin graph bisection — a capped driver kernel.

Reference: ``networkx/algorithms/community/kernighan_lin.py:46``
(``kernighan_lin_bisection``): alternating single-node swaps between the
two sides picked from two min-heaps of swap costs, applying the prefix
of the sweep with the most negative cumulative cost, up to ``max_iter``
sweeps.

Engine posture: like CNM (``modularity_max.py``), each heap pop depends
on every previous move, so the sweep is inherently sequential — edges
are collected under ``max_edges`` and the loop runs driver-side.  The
distributed partitioning path is
:func:`~networkx_spark.algorithms.spectral.spectral_bisection` /
Louvain.  The kernel replicates the reference move-for-move: the same
seeded label shuffle (``random.Random(seed).shuffle`` over the
canonical node order) and a min-heap with the same lazy-update,
insertion-order tie semantics as ``networkx.utils.BinaryHeap``
(reimplemented from its documented behavior, not transcribed) — so
explicit-partition runs match the reference EXACTLY when the
reference's graph was built in sorted node order (the parity tests
pin this).
"""

from __future__ import annotations

import heapq
import random
from itertools import count as _count

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID


class _LazyMinHeap:
    """Min-heap keyed by node with lazy decrease/increase — mirrors the
    reference's BinaryHeap contract: ``insert`` updates only downward
    unless ``allow_increase``; ties pop in insertion order."""

    def __init__(self):
        self._heap: list[tuple[float, int, int]] = []
        self._val: dict[int, float] = {}
        self._n = _count()

    def insert(self, key: int, value: float, allow_increase: bool = False):
        cur = self._val.get(key)
        if cur is not None and not allow_increase and value > cur:
            return
        self._val[key] = value
        heapq.heappush(self._heap, (value, next(self._n), key))

    def get(self, key: int):
        return self._val.get(key)

    def pop(self):
        while self._heap:
            value, _, key = heapq.heappop(self._heap)
            if self._val.get(key) == value:
                del self._val[key]
                return key, value
        raise IndexError("heap is empty")

    def __bool__(self):
        return bool(self._val)


def _sweep(edges, side):
    """One KL sweep (``kernighan_lin.py:12``): alternating pops."""
    costs0, costs1 = costs = (_LazyMinHeap(), _LazyMinHeap())
    for u, (side_u, edges_u) in enumerate(zip(side, edges)):
        cost_u = sum(w if side[v] else -w for v, w in edges_u)
        costs[side_u].insert(u, cost_u if side_u else -cost_u)

    def update(costs_x, x):
        for y, w in edges[x]:
            costs_y = costs[side[y]]
            cost_y = costs_y.get(y)
            if cost_y is not None:
                cost_y += 2 * (-w if costs_x is costs_y else w)
                costs_y.insert(y, cost_y, True)

    i = 0
    totcost = 0.0
    while costs0 and costs1:
        u, cost_u = costs0.pop()
        update(costs0, u)
        v, cost_v = costs1.pop()
        update(costs1, v)
        totcost += cost_u + cost_v
        i += 1
        yield totcost, i, (u, v)


def _key(node: str):
    return (0, int(node), "") if node.isdigit() else (1, 0, node)


def kernighan_lin_bisection(g: Graph, partition=None, max_iter: int = 10,
                            weighted: bool = False, seed: int | None = None,
                            max_edges: int = 5_000_000) -> DataFrame:
    """(id, side) with side ∈ {0, 1}.  The reference returns
    ``(A, B) = (side 0, side 1)`` — note its input-partition mapping puts
    the FIRST input set on side 1, a reference quirk mirrored here."""
    if g.directed:
        raise ValueError("kernighan_lin_bisection is undirected-only "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    n_edges = g.edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"kernighan_lin_bisection is a sequential driver kernel; "
            f"{n_edges} edges > max_edges={max_edges} — use "
            "spectral_bisection / louvain_communities at scale")
    labels = sorted((str(r[ID]) for r in g.vertices().collect()), key=_key)
    rng = random.Random(seed)
    rng.shuffle(labels)
    index = {v: i for i, v in enumerate(labels)}
    n = len(labels)

    side = [0] * (n // 2) + [1] * ((n + 1) // 2)
    if partition is not None:
        try:
            A, B = partition
        except (TypeError, ValueError) as err:
            raise ValueError("partition must be two sets "
                             "(reference NetworkXError)") from err
        A = {str(a) for a in A}
        B = {str(b) for b in B}
        if A | B != set(labels) or A & B:
            raise ValueError("partition invalid (reference NetworkXError)")
        side = [0] * n
        for a in A:
            side[index[a]] = 1

    wcol = (F.col(WEIGHT).cast("double") if weighted and
            WEIGHT in g.edges.columns else F.lit(1.0))
    rows = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
            .select(F.col(SRC).cast("string"), F.col(DST).cast("string"),
                    wcol.alias("_w")).collect())
    edges: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    seen = [set() for _ in range(n)]
    for r in rows:
        iu, iv = index[r[SRC]], index[r[DST]]
        if iv not in seen[iu]:
            seen[iu].add(iv)
            edges[iu].append((iv, float(r["_w"])))
    # neighbor iteration order drives the lazy-heap update sequence, which
    # drives tie order: mirror the reference's adjacency order for
    # sorted-order-built graphs = neighbors in ascending natural label
    for lst in edges:
        lst.sort(key=lambda t: _key(labels[t[0]]))

    for _ in range(max_iter):
        costs = list(_sweep(edges, side))
        if not costs:
            break
        min_cost, min_i, _ = min(costs)
        if min_cost >= 0:
            break
        for _, _, (u, v) in costs[:min_i]:
            side[u] = 1
            side[v] = 0

    return spark.createDataFrame(
        [(labels[i], side[i]) for i in range(n)], "id string, side long")

"""Clauset–Newman–Moore greedy modularity maximization.

Reference: ``networkx/algorithms/community/modularity_max.py:156``
(``greedy_modularity_communities`` →
``_greedy_modularity_communities_generator`` ``:18``): start from
singleton communities, repeatedly merge the pair with the largest
modularity gain ΔQ (ties → smallest (u, v) pair), stop when ΔQ < 0 or
``cutoff``/``best_n`` bounds are hit, return communities sorted largest
first.

Engine posture: CNM is an inherently sequential agglomeration — every
merge re-prioritizes its neighborhood before the next pick, so there is
no superstep formulation that preserves the reference's merge order.
This is therefore a **capped driver kernel** (same posture as
``operators/setops.complement`` and the dict-of-dicts collectors):
edges are collected under ``max_edges`` and the greedy loop runs
driver-side on plain dicts + a lazy-deletion heap.  The distributed
community-detection paths are
:func:`~networkx_spark.algorithms.louvain.louvain_communities` and the
LPA family; CNM exists for reference parity on fixture/subgraph tiers.

Determinism note: the reference breaks ΔQ ties by node order (its heap
elements are (u, v) node tuples).  Engine vertex ids are strings, so
ids made of digits are ordered numerically (matching reference integer
fixtures) and everything else lexicographically; community/dict
iteration order is canonicalized to sorted-node order, which equals the
reference's insertion order for its own generators (0..n−1).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT


def _key(node: str):
    """Sort key: numeric strings numerically, others lexically."""
    return (0, int(node), "") if node.isdigit() else (1, 0, node)


def greedy_modularity_communities(g: Graph, weighted: bool = False,
                                  resolution: float = 1.0, cutoff: int = 1,
                                  best_n: int | None = None,
                                  max_edges: int = 5_000_000) -> DataFrame:
    """(id, community) — community = 0-based index in the reference's
    largest-first ordering of the final partition."""
    spark = g.edges.sparkSession
    n_edges = g.edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"greedy_modularity_communities is a sequential driver kernel; "
            f"{n_edges} edges > max_edges={max_edges} — use "
            "louvain_communities / label propagation at scale")
    cols = [SRC, DST] + ([WEIGHT] if weighted and WEIGHT in g.edges.columns
                         else [])
    rows = g.edges.select(*cols).collect()
    edges = [(str(r[SRC]), str(r[DST]),
              float(r[WEIGHT]) if weighted and WEIGHT in r else 1.0)
             for r in rows]
    nodes = sorted({str(r["id"]) for r in g.vertices().collect()}, key=_key)
    n = len(nodes)

    if (cutoff < 1) or (cutoff > n):
        raise ValueError(f"cutoff must be between 1 and {n}. Got {cutoff}.")
    if best_n is not None:
        if (best_n < 1) or (best_n > n):
            raise ValueError(
                f"best_n must be between 1 and {n}. Got {best_n}.")
        if best_n < cutoff:
            raise ValueError(
                f"Must have best_n >= cutoff. Got {best_n} < {cutoff}")
        if best_n == 1:
            return _as_df(spark, [frozenset(nodes)])
    else:
        best_n = n

    parts = _cnm(nodes, edges, g.directed, resolution, cutoff, best_n)
    return _as_df(spark, parts)


def _cnm(nodes, edges, directed, resolution, cutoff, best_n):
    m = sum(w for _, _, w in edges)
    q0 = 1.0 / m                      # ZeroDivision on edgeless, like ref
    a = defaultdict(float)
    b = defaultdict(float)
    for u, v, w in edges:
        if directed:
            a[u] += w * q0
            b[v] += w * q0
        else:
            a[u] += w * q0 * 0.5
            a[v] += w * q0 * 0.5
    if not directed:
        b = a

    # ΔQ for adjacent community pairs (self-loops excluded, parallel rows
    # summed), then the expected-edge term — the generator's init (:81-93)
    wt = defaultdict(float)
    for u, v, w in edges:
        if u == v:
            continue
        wt[(u, v)] += w
        wt[(v, u)] += w
    dq = {u: {} for u in nodes}
    for (u, v), w in wt.items():
        dq[u][v] = q0 * w - resolution * (a[u] * b[v] + b[u] * a[v])

    # lazy-deletion max-heap over ALL pair entries; the valid top is always
    # some row's max, so pop order of live entries equals the reference's
    # heap-of-row-maxes (priority ties → smallest (u, v) element)
    heap = [(-d, _key(u), _key(v), u, v) for u in nodes
            for v, d in dq[u].items()]
    heapq.heapify(heap)
    alive = set(nodes)
    communities = {u: frozenset([u]) for u in nodes}

    def pop_best():
        while heap:
            negd, _, _, u, v = heapq.heappop(heap)
            if u in alive and v in alive and dq[u].get(v) == -negd:
                return -negd, u, v
        return None

    while len(communities) > cutoff:
        best = pop_best()
        if best is None:
            # exhausted merges: force down to best_n by pairwise union of
            # the two largest (the reference's comm1 ^ comm2 on disjoint
            # sets) — ``modularity_max.py:283-289``
            parts = sorted(communities.values(), key=len, reverse=True)
            while len(parts) > best_n:
                c1, c2, *rest = parts
                parts = [c1 | c2, *rest]
            return parts
        d, u, v = best
        if d < 0 and len(communities) <= best_n:
            break

        # merge u into v (generator ``:128-197``)
        communities[v] = communities[u] | communities[v]
        del communities[u]
        u_nbrs = set(dq[u])
        v_nbrs = set(dq[v])
        for w in (u_nbrs | v_nbrs) - {u, v}:
            if w in u_nbrs and w in v_nbrs:
                d_vw = dq[v][w] + dq[u][w]
            elif w in v_nbrs:
                d_vw = dq[v][w] - resolution * (a[u] * b[w] + a[w] * b[u])
            else:
                d_vw = dq[u][w] - resolution * (a[v] * b[w] + a[w] * b[v])
            dq[v][w] = d_vw
            dq[w][v] = d_vw
            heapq.heappush(heap, (-d_vw, _key(v), _key(w), v, w))
            heapq.heappush(heap, (-d_vw, _key(w), _key(v), w, v))
        for w in list(dq[u]):
            del dq[w][u]
        dq[u] = {}
        alive.discard(u)
        a[v] += a[u]
        a[u] = 0.0
        if directed:
            b[v] += b[u]
            b[u] = 0.0

    return sorted(communities.values(), key=len, reverse=True)


def _as_df(spark, parts) -> DataFrame:
    rows = [(node, i) for i, part in enumerate(parts)
            for node in sorted(part, key=_key)]
    return spark.createDataFrame(rows, "id string, community long")

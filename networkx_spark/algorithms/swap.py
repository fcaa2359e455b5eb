"""Degree-preserving edge rewiring (null models).

Reference: ``networkx/algorithms/swap.py:118`` (``double_edge_swap``):
pick u, x ∝ degree, pick random neighbors v of u and y of x, and if no
parallel edge would result replace (u,v),(x,y) with (u,x),(v,y) —
repeating until ``nswap`` swaps or ``max_tries`` attempts.

Engine posture: every attempt mutates the adjacency the next attempt
samples from, so the chain is inherently sequential — a capped driver
kernel like CNM/KL, with the SAME ``random.Random(seed)`` call sequence
(two ``random()`` draws through the degree CDF via ``bisect``, then two
``choice`` calls over insertion-ordered neighbor lists) so a seeded run
reproduces the reference EXACTLY for sorted-order-built graphs.  At web
scale, degree-preserving null models come from the seeded generators in
``generators.py`` instead of rewiring a 10¹²-edge table in place.
"""

from __future__ import annotations

import bisect
import random

from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _key(node: str):
    return (0, int(node), "") if node.isdigit() else (1, 0, node)


def double_edge_swap(g: Graph, nswap: int = 1, max_tries: int = 100,
                     seed: int | None = None,
                     max_edges: int = 5_000_000) -> Graph:
    """A new :class:`Graph` with ``nswap`` degree-preserving swaps
    applied (``swap.py:118``).

    Loop-free graphs only: a self-loop enters the reference's degree CDF
    and neighbor lists, so its RNG call sequence diverges from this
    kernel's — rather than silently break the seeded exact-parity
    contract, self-loop input raises."""
    if g.directed:
        raise ValueError("double_edge_swap is undirected-only "
                         "(reference raises NetworkXError; use the "
                         "directed_edge_swap variant there)")
    if nswap > max_tries:
        raise ValueError("Number of swaps > number of tries allowed "
                         "(reference NetworkXError)")
    spark = g.edges.sparkSession
    n_edges = g.edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"double_edge_swap is a sequential driver kernel; {n_edges} "
            f"edges > max_edges={max_edges} — use the seeded generators "
            "for null models at scale")

    if g.edges.filter(F.col(SRC).cast("string")
                      == F.col(DST).cast("string")).limit(1).count():
        raise ValueError(
            "double_edge_swap requires a loop-free graph: self-loops enter "
            "the reference's degree CDF and adjacency, so seeded RNG parity "
            "cannot hold here — remove self-loops first "
            "(graph.remove_self_loops)")
    nodes = sorted((str(r[ID]) for r in g.vertices().collect()), key=_key)
    if len(nodes) < 4:
        raise ValueError("Graph has fewer than four nodes "
                         "(reference NetworkXError)")
    # adjacency as insertion-ordered dict-of-dicts, built in sorted edge
    # order — the reference's G.adj for a sorted-constructed graph
    adj: dict[str, dict[str, None]] = {v: {} for v in nodes}
    pairs = sorted(
        ((str(r[SRC]), str(r[DST])) for r in
         g.edges.select(SRC, DST).distinct().collect()
         if str(r[SRC]) != str(r[DST])),
        key=lambda p: (_key(min(p, key=_key)), _key(max(p, key=_key))))
    for u, v in pairs:
        a, b = sorted((u, v), key=_key)
        adj[a].setdefault(b)
        adj[b].setdefault(a)
    if sum(len(d) for d in adj.values()) // 2 < 2:
        raise ValueError("Graph has fewer than 2 edges "
                         "(reference NetworkXError)")

    rng = random.Random(seed)
    degrees = [len(adj[v]) for v in nodes]
    psum = sum(degrees)
    cdf = [0.0]
    for i, d in enumerate(degrees):
        cdf.append(cdf[i] + d / psum)

    n = 0
    swapcount = 0
    while swapcount < nswap:
        r1, r2 = rng.random(), rng.random()
        ui = bisect.bisect_left(cdf, r1) - 1
        xi = bisect.bisect_left(cdf, r2) - 1
        if ui == xi:
            continue
        u, x = nodes[ui], nodes[xi]
        v = rng.choice(list(adj[u]))
        y = rng.choice(list(adj[x]))
        if v == y:
            continue
        if (x not in adj[u]) and (y not in adj[v]):
            adj[u][x] = None
            adj[x][u] = None
            adj[v][y] = None
            adj[y][v] = None
            del adj[u][v], adj[v][u], adj[x][y], adj[y][x]
            swapcount += 1
        if n >= max_tries:
            raise RuntimeError(
                f"Maximum number of swap attempts ({n}) exceeded before "
                f"desired swaps achieved ({nswap}). "
                "(reference NetworkXAlgorithmError)")
        n += 1

    out = sorted({tuple(sorted((u, w), key=_key))
                  for u, d in adj.items() for w in d})
    e = spark.createDataFrame(out or [("", "")], "src string, dst string")
    if not out:
        e = e.limit(0)
    verts = spark.createDataFrame([(v,) for v in nodes], "id string")
    return Graph(e, directed=False, vertices=verts)

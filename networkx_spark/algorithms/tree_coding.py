"""Prüfer tree coding — a capped driver kernel.

Reference: ``networkx/algorithms/tree/coding.py``
(``to_prufer_sequence`` ``:218``, ``from_prufer_sequence`` ``:316``):
the classic bijection between labeled trees on nodes {0..n−1} and
sequences of length n−2 (repeatedly strip the smallest leaf, recording
its neighbor).

Engine posture: each strip depends on the previous one — sequential by
definition, and Prüfer codes are a small-tree interchange format (like
graph6), so this is a collected driver kernel under ``max_edges``.
Byte-exact parity with the reference on both directions.
"""

from __future__ import annotations

import heapq

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def to_prufer_sequence(g: Graph, max_edges: int = 1_000_000) -> list[int]:
    """Prüfer sequence of a tree on nodes {0..n−1} (``coding.py:218``);
    raises on non-trees, n < 2, and non-canonical labels like the
    reference."""
    from networkx_spark.algorithms.trees import is_tree
    if g.directed:
        raise ValueError("to_prufer_sequence is undirected-only "
                         "(reference raises NetworkXNotImplemented)")
    if g.edges.count() > max_edges:
        raise ValueError("Prüfer coding is a sequential driver kernel; "
                         f"tree exceeds max_edges={max_edges}")
    if not is_tree(g):
        raise ValueError("cannot encode a non-tree "
                         "(reference NotATree)")
    nodes = [str(r[ID]) for r in g.vertices().collect()]
    n = len(nodes)
    if n < 2:
        raise ValueError("Prüfer sequence undefined for trees with "
                         "fewer than two nodes (reference NetworkXPointlessConcept)")
    if {int(v) for v in nodes if v.isdigit()} != set(range(n)) or \
            any(not v.isdigit() for v in nodes):
        raise KeyError("tree must have node labels {0, ..., n-1} "
                       "(reference KeyError)")
    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    for r in g.edges.select(SRC, DST).collect():
        a, b = int(r[SRC]), int(r[DST])
        adj[a].add(b)
        adj[b].add(a)
    leaves = [v for v in range(n) if len(adj[v]) == 1]
    heapq.heapify(leaves)
    seq = []
    for _ in range(n - 2):
        leaf = heapq.heappop(leaves)
        (nbr,) = adj[leaf]
        seq.append(nbr)
        adj[nbr].discard(leaf)
        adj[leaf] = set()
        if len(adj[nbr]) == 1:
            heapq.heappush(leaves, nbr)
    return seq


def from_prufer_sequence(spark: SparkSession, sequence: list[int]) -> Graph:
    """Tree on {0..n−2+2} from its Prüfer sequence (``coding.py:316``)."""
    n = len(sequence) + 2
    if any(s < 0 or s >= n for s in sequence):
        raise ValueError("the Prüfer sequence has entries outside "
                         "{0, ..., n-1} (reference raises)")
    degree = [1] * n
    for s in sequence:
        degree[s] += 1
    leaves = [v for v in range(n) if degree[v] == 1]
    heapq.heapify(leaves)
    edges = []
    for s in sequence:
        leaf = heapq.heappop(leaves)
        edges.append((leaf, s))
        degree[s] -= 1
        if degree[s] == 1:
            heapq.heappush(leaves, s)
    u = heapq.heappop(leaves)
    v = heapq.heappop(leaves)
    edges.append((u, v))
    e = spark.createDataFrame([(str(a), str(b)) for a, b in edges],
                              "src string, dst string")
    return Graph(e, directed=False)

"""Depth-first traversal family — a capped driver kernel.

Reference: ``networkx/algorithms/traversal/depth_first_search.py``
(``dfs_edges`` ``:8``, ``dfs_tree`` ``:86``, ``dfs_preorder_nodes``
``:215``, ``dfs_postorder_nodes`` ``:150``).

Engine posture: DFS order is inherently sequential — each step depends
on the entire stack history, so there is no superstep formulation (the
parallel-reachability part of DFS IS :mod:`~networkx_spark.algorithms
.bfs`).  Like the CNM kernel (``modularity_max.py``), DFS collects the
adjacency under a ``max_edges`` cap and runs driver-side; the scale
paths for what DFS is usually used for are ``bfs_tree`` (traversal
trees), ``connected_components`` (reachability), and
``topological_sort`` (ordering).

Order contract: the reference follows adjacency insertion order; here
neighbors are visited in natural order (numeric ids numerically, then
lexically) — identical to the reference whenever its graph was built in
sorted order, which the parity tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _key(node: str):
    return (0, int(node), "") if node.isdigit() else (1, 0, node)


def _adj(g: Graph, max_edges: int) -> dict[str, list[str]]:
    n_edges = g.edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"DFS is a sequential driver kernel; {n_edges} edges > "
            f"max_edges={max_edges} — use bfs_tree / connected_components "
            "/ topological_sort at scale")
    rows = (g.symmetrized().select(F.col(SRC).cast("string"),
                                   F.col(DST).cast("string")).distinct()
            .collect())
    adj: dict[str, list[str]] = {}
    for r in rows:
        adj.setdefault(r[SRC], []).append(r[DST])
        adj.setdefault(r[DST], [])
    for v in adj:
        adj[v] = sorted(set(adj[v]), key=_key)
    for r in g.vertices().collect():
        adj.setdefault(str(r[ID]), [])
    return adj


def dfs_edges(g: Graph, source=None, depth_limit: int | None = None,
              max_edges: int = 5_000_000) -> list[tuple[str, str]]:
    """Tree edges in DFS order (``depth_first_search.py:8``): from
    ``source`` only, or from every component root in node order."""
    adj = _adj(g, max_edges)
    if source is None:
        roots = sorted(adj, key=_key)
    else:
        if str(source) not in adj:
            raise KeyError(f"Source {source!r} is not in G")
        roots = [str(source)]
    if depth_limit is None:
        depth_limit = len(adj)
    visited: set[str] = set()
    out: list[tuple[str, str]] = []
    for root in roots:
        if root in visited:
            continue
        visited.add(root)
        # iterative DFS with per-node child cursors (the reference's
        # stack-of-iterators shape, re-expressed from scratch)
        stack: list[tuple[str, int, int]] = [(root, 0, 0)]
        while stack:
            v, i, depth = stack.pop()
            if i < len(adj[v]):
                stack.append((v, i + 1, depth))
                w = adj[v][i]
                if w not in visited and depth < depth_limit:
                    visited.add(w)
                    out.append((v, w))
                    stack.append((w, 0, depth + 1))
    return out


def dfs_tree(g: Graph, source=None, depth_limit: int | None = None,
             max_edges: int = 5_000_000) -> Graph:
    """Directed traversal-tree graph (``depth_first_search.py:86``)."""
    spark = g.edges.sparkSession
    edges = dfs_edges(g, source, depth_limit, max_edges)
    visited = ({str(source)} if source is not None else set())
    for u, v in edges:
        visited.add(u)
        visited.add(v)
    if source is None:
        visited |= set(_adj(g, max_edges))
    e = spark.createDataFrame(edges or [("", "")], "src string, dst string")
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame([(x,) for x in sorted(visited, key=_key)]
                              or [("",)], "id string")
    if not visited:
        v = v.limit(0)
    return Graph(e, directed=True, vertices=v)


def dfs_preorder_nodes(g: Graph, source=None,
                       depth_limit: int | None = None,
                       max_edges: int = 5_000_000) -> list[str]:
    """Nodes in DFS preorder (``depth_first_search.py:215``)."""
    adj = _adj(g, max_edges)
    edges = dfs_edges(g, source, depth_limit, max_edges)
    roots = ([str(source)] if source is not None
             else sorted(adj, key=_key))
    seen: set[str] = set()
    order: list[str] = []
    tree_children: dict[str, list[str]] = {}
    for u, v in edges:
        tree_children.setdefault(u, []).append(v)
    for root in roots:
        if root in seen:
            continue
        stack = [root]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            order.append(v)
            stack.extend(reversed(tree_children.get(v, [])))
    return order


def dfs_postorder_nodes(g: Graph, source=None,
                        depth_limit: int | None = None,
                        max_edges: int = 5_000_000) -> list[str]:
    """Nodes in DFS postorder (``depth_first_search.py:150``)."""
    adj = _adj(g, max_edges)
    edges = dfs_edges(g, source, depth_limit, max_edges)
    roots = ([str(source)] if source is not None
             else sorted(adj, key=_key))
    tree_children: dict[str, list[str]] = {}
    for u, v in edges:
        tree_children.setdefault(u, []).append(v)
    seen: set[str] = set()
    order: list[str] = []
    for root in roots:
        if root in seen:
            continue
        stack: list[tuple[str, bool]] = [(root, False)]
        while stack:
            v, expanded = stack.pop()
            if expanded:
                order.append(v)
                continue
            if v in seen:
                continue
            seen.add(v)
            stack.append((v, True))
            stack.extend((c, False)
                         for c in reversed(tree_children.get(v, [])))
    return order

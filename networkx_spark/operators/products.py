"""Graph products (reference ``networkx/algorithms/operators/product.py``)
as DataFrame cross/compose joins over canonical edge tables.

The reference names product vertices with Python tuples ``(u, x)``
(``product.py:27`` ``_node_product``); a distributed id column needs a
flat encoding, so product vertices here are ``f"{u}{sep}{x}"`` strings
(``sep='|'`` by default — pick another separator if your ids contain it).

Semantics (all verified against the reference in ``tests/test_products.py``):

* ``tensor_product``  (``product.py:128``) — edge ``(u|x, v|y)`` iff
  ``(u,v) ∈ G`` and ``(x,y) ∈ H``; weight = ``w_G · w_H``.
* ``cartesian_product`` (``product.py:184``) — ``(u|x, u|y)`` for every
  ``u ∈ G`` and ``(x,y) ∈ H``, plus ``(u|x, v|x)`` for every ``(u,v) ∈ G``
  and ``x ∈ H``; weight = the parent edge's weight.
* ``lexicographic_product`` (``product.py:236``) — ``(u|x, v|y)`` for
  every ``(u,v) ∈ G`` and all ``x, y ∈ H``, plus ``(u|x, u|y)`` for
  ``(x,y) ∈ H``; weight = the G edge's weight (1.0 on the H-only rows).
* ``strong_product`` (``product.py:289``) — cartesian ∪ tensor edges.

Mixed directedness raises like the reference (``product.py:114-117``).

Scale posture: output size is inherent to the operator — ``|E_G|·|E_H|``
for tensor, ``|V_G|·|E_H| + |V_H|·|E_G|`` for cartesian,
``|E_G|·|V_H|² + |V_G|·|E_H|`` for lexicographic.  Every build is a pure
cross/hash join Catalyst plans itself (the smaller side broadcasts); no
driver-side iteration, no collect.  The quadratic lexicographic form is
guarded like :func:`networkx_spark.operators.setops.complement`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.operators.setops import _check

SEP = "|"


def _directional_edges(g: Graph):
    """Both orientations of every edge — the reference iterates
    ``G.edges`` per direction for directed graphs and both ways for
    undirected (``product.py:32,51``); the canonical table stores one
    row per undirected edge, so expand it."""
    e = g.edges.select(SRC, DST, WEIGHT)
    if not g.directed:
        e = e.unionByName(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT))
    return e


def _pair(u, x, sep: str):
    return F.concat_ws(sep, u.cast("string"), x.cast("string"))


def _product_vertices(a: Graph, b: Graph, sep: str):
    va = a.vertices().select(F.col(ID).alias("_u"))
    vb = b.vertices().select(F.col(ID).alias("_x"))
    return (va.crossJoin(vb)
            .select(_pair(F.col("_u"), F.col("_x"), sep).alias(ID)))


def _finish(a: Graph, edges, verts) -> Graph:
    # from_edges re-canonicalizes (undirected src<=dst) and dedups the
    # double-counted rows the undirected directional expansion produces;
    # 'max' keeps the weight instead of summing the duplicates
    return Graph.from_edges(edges, directed=a.directed, weight=WEIGHT,
                            vertices=verts, combine="max")


def _tensor_edges(a: Graph, b: Graph, sep: str):
    eg = _directional_edges(a).select(F.col(SRC).alias("_gu"),
                                      F.col(DST).alias("_gv"),
                                      F.col(WEIGHT).alias("_gw"))
    eh = _directional_edges(b).select(F.col(SRC).alias("_hx"),
                                      F.col(DST).alias("_hy"),
                                      F.col(WEIGHT).alias("_hw"))
    return eg.crossJoin(eh).select(
        _pair(F.col("_gu"), F.col("_hx"), sep).alias(SRC),
        _pair(F.col("_gv"), F.col("_hy"), sep).alias(DST),
        (F.col("_gw") * F.col("_hw")).alias(WEIGHT))


def tensor_product(a: Graph, b: Graph, sep: str = SEP) -> Graph:
    """Tensor (categorical) product (``product.py:128``)."""
    _check(a, b)
    return _finish(a, _tensor_edges(a, b, sep), _product_vertices(a, b, sep))


def _nodes_cross_edges(nodes, edges, sep: str, node_first: bool):
    """``(n|x, n|y)`` rows (``product.py:84``) or the mirrored
    ``(x|n, y|n)`` form (``product.py:70``)."""
    n = nodes.select(F.col(ID).alias("_n"))
    e = edges.select(F.col(SRC).alias("_x"), F.col(DST).alias("_y"), WEIGHT)
    left = (lambda p, q: _pair(p, q, sep)) if node_first \
        else (lambda p, q: _pair(q, p, sep))
    return n.crossJoin(e).select(left(F.col("_n"), F.col("_x")).alias(SRC),
                                 left(F.col("_n"), F.col("_y")).alias(DST),
                                 WEIGHT)


def _cartesian_edges(a: Graph, b: Graph, sep: str):
    e1 = _nodes_cross_edges(a.vertices(), _directional_edges(b), sep,
                            node_first=True)
    e2 = _nodes_cross_edges(b.vertices(), _directional_edges(a), sep,
                            node_first=False)
    return e1.unionByName(e2)


def cartesian_product(a: Graph, b: Graph, sep: str = SEP) -> Graph:
    """Cartesian (box) product (``product.py:184``)."""
    _check(a, b)
    return _finish(a, _cartesian_edges(a, b, sep),
                   _product_vertices(a, b, sep))


def strong_product(a: Graph, b: Graph, sep: str = SEP) -> Graph:
    """Strong product = cartesian ∪ tensor edges (``product.py:289``).
    An edge in both keeps the larger weight (arbitrary but deterministic;
    the reference keeps whichever dict the last generator yielded)."""
    _check(a, b)
    e = _cartesian_edges(a, b, sep).unionByName(_tensor_edges(a, b, sep))
    return _finish(a, e, _product_vertices(a, b, sep))


def lexicographic_product(a: Graph, b: Graph, sep: str = SEP,
                          max_h_vertices: int = 100_000) -> Graph:
    """Lexicographic product (``product.py:236``).  Output is
    ``|E_G|·|V_H|²`` edges — quadratic in H, so H is size-guarded like
    ``complement``."""
    _check(a, b)
    nh = b.vertices().count()
    if nh > max_h_vertices:
        raise ValueError(
            f"lexicographic_product is quadratic in H ({nh:,} vertices > "
            f"max_h_vertices={max_h_vertices:,}); raise the cap explicitly "
            "if you mean it")
    vx = b.vertices().select(F.col(ID).alias("_x"))
    vy = b.vertices().select(F.col(ID).alias("_y"))
    eg = _directional_edges(a).select(F.col(SRC).alias("_gu"),
                                      F.col(DST).alias("_gv"), WEIGHT)
    e1 = eg.crossJoin(vx).crossJoin(vy).select(
        _pair(F.col("_gu"), F.col("_x"), sep).alias(SRC),
        _pair(F.col("_gv"), F.col("_y"), sep).alias(DST),
        WEIGHT)
    e2 = _nodes_cross_edges(a.vertices(), _directional_edges(b), sep,
                            node_first=True)
    return _finish(a, e1.unionByName(e2), _product_vertices(a, b, sep))


def power(g: Graph, k: int, max_edges: int = 50_000_000) -> Graph:
    """k-th graph power (``product.py:347``): distinct u ≠ v adjacent in
    ``G^k`` iff their shortest-path distance in G is at most k.
    Undirected simple graphs only, like the reference.

    Built as k−1 rounds of frontier ⋈ adjacency with a distinct cut —
    boolean sparse-matrix powering, the same join the BFS kernel uses;
    small-world graphs densify fast, so growth is guarded per round.
    """
    if g.directed:
        raise ValueError("power() is defined for undirected graphs "
                         "(reference @not_implemented_for('directed'))")
    if k <= 0:
        raise ValueError(f"k must be a positive integer, got {k}")
    # self-loops never appear in G^k (the reference's BFS marks the seed
    # at distance 0, so n is never re-added for itself)
    adj = (_directional_edges(g).select(SRC, DST)
           .filter(F.col(SRC) != F.col(DST)).cache())
    reach = adj
    for _ in range(k - 1):
        hop = (reach.alias("r")
               .join(adj.alias("a"), F.col(f"r.{DST}") == F.col(f"a.{SRC}"))
               .select(F.col(f"r.{SRC}").alias(SRC),
                       F.col(f"a.{DST}").alias(DST))
               .filter(F.col(SRC) != F.col(DST)))
        reach = reach.unionByName(hop).distinct()
        # materialized by the distinct: cheap to count, and the count
        # guards the small-world densification blowup
        n_e = reach.count()
        if n_e > max_edges:
            raise ValueError(
                f"G^{k} exceeded max_edges={max_edges:,} ({n_e:,} directed "
                "reach pairs) — small-world powers densify to ~n²; raise "
                "the cap explicitly if you mean it")
    e = reach.withColumn(WEIGHT, F.lit(1.0))
    return Graph.from_edges(e, directed=False, weight=WEIGHT,
                            vertices=g.vertices(), combine="max")


def rooted_product(a: Graph, b: Graph, root, sep: str = SEP) -> Graph:
    """Rooted product (``product.py:436``): one copy of H per G vertex,
    G's edges wired between the copies' roots.  Undirected, like the
    reference's construction."""
    if a.directed or b.directed:
        raise ValueError("rooted_product is defined on undirected graphs")
    has_root = b.vertices().filter(F.col(ID) == F.lit(root)).count()
    if not has_root:
        raise ValueError(f"root {root!r} must be a vertex in H")
    e1 = a.edges.select(
        _pair(F.col(SRC), F.lit(root), sep).alias(SRC),
        _pair(F.col(DST), F.lit(root), sep).alias(DST),
        WEIGHT)
    e2 = _nodes_cross_edges(a.vertices(), b.edges, sep, node_first=True)
    return _finish(a, e1.unionByName(e2), _product_vertices(a, b, sep))

"""Graph algebra (reference ``networkx/algorithms/operators/binary.py``)
as DataFrame set operations on canonical edge tables.

All operators take and return :class:`Graph` with matching directedness.
Unlike the reference's ``union`` (which *requires* disjoint node sets,
``binary.py:19``), edge-table union is naturally multiset-free; we keep the
reference behaviours:

* ``union(G, H, rename=(pa, pb))`` — disjoint union via id prefixing,
* ``compose`` — merge, H's edge attributes win (``binary.py:292``),
* ``intersection`` — edges present in both, on the shared vertex set
  (``binary.py:129``),
* ``difference`` / ``symmetric_difference`` (``binary.py:174,229``),
* ``complement`` (``unary.py:8``) — n² blowup; guarded, small graphs only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _check(a: Graph, b: Graph):
    if a.directed != b.directed:
        raise ValueError("graphs must share directedness")


def union(a: Graph, b: Graph, rename: tuple[str, str] = ("G-", "H-")) -> Graph:
    """Disjoint union; ids prefixed like the reference's ``rename=``
    (``binary.py:19``)."""
    _check(a, b)
    pa, pb = rename

    def pre(g, p):
        e = g.edges.select(F.concat(F.lit(p), SRC).alias(SRC),
                           F.concat(F.lit(p), DST).alias(DST), WEIGHT)
        v = g.vertices().select(F.concat(F.lit(p), ID).alias(ID))
        return e, v

    ea, va = pre(a, pa)
    eb, vb = pre(b, pb)
    return Graph(ea.unionByName(eb), directed=a.directed, vertices=va.unionByName(vb))


def compose(a: Graph, b: Graph) -> Graph:
    """Merge keeping H's (b's) attributes on common edges (``binary.py:292``)."""
    _check(a, b)
    keys = b.edges.select(SRC, DST)
    only_a = a.edges.join(keys, [SRC, DST], "anti")
    e = only_a.unionByName(b.edges)
    v = a.vertices().unionByName(b.vertices()).distinct()
    return Graph(e, directed=a.directed, vertices=v)


def intersection(a: Graph, b: Graph) -> Graph:
    """Edges in both (weights from a); vertex set = intersection of the two
    vertex sets (``binary.py:129`` requires *equal* node sets and keeps
    them; with unequal inputs we keep the shared vertices, the behaviour
    the tests pin down)."""
    _check(a, b)
    e = a.edges.join(b.edges.select(SRC, DST), [SRC, DST], "semi")
    v = a.vertices().join(b.vertices(), ID, "inner").select(ID)
    return Graph(e, directed=a.directed, vertices=v)


def difference(a: Graph, b: Graph) -> Graph:
    """Edges of a not in b (``binary.py:174``); vertex set of a kept."""
    _check(a, b)
    e = a.edges.join(b.edges.select(SRC, DST), [SRC, DST], "anti")
    return Graph(e, directed=a.directed, vertices=a.vertices())


def symmetric_difference(a: Graph, b: Graph) -> Graph:
    """Edges in exactly one of a, b (``binary.py:229``)."""
    _check(a, b)
    ea = a.edges.join(b.edges.select(SRC, DST), [SRC, DST], "anti")
    eb = b.edges.join(a.edges.select(SRC, DST), [SRC, DST], "anti")
    v = a.vertices().unionByName(b.vertices()).distinct()
    return Graph(ea.unionByName(eb), directed=a.directed, vertices=v)


def complement(g: Graph, max_vertices: int = 100_000) -> Graph:
    """All non-edges (``unary.py:8``); self-loops excluded like the
    reference.  Guarded: the result is Θ(n²) — refuse beyond
    ``max_vertices`` (a cross join at web scale is a non-goal)."""
    n = g.number_of_vertices()
    if n > max_vertices:
        raise ValueError(f"complement of {n} vertices would materialize ~n^2 edges")
    v = g.vertices()
    pairs = (v.select(F.col(ID).alias(SRC))
             .crossJoin(v.select(F.col(ID).alias(DST))))
    pairs = (pairs.filter(F.col(SRC) < F.col(DST)) if not g.directed
             else pairs.filter(F.col(SRC) != F.col(DST)))
    e = (pairs.join(g.edges.select(SRC, DST), [SRC, DST], "anti")
         .withColumn(WEIGHT, F.lit(1.0)))
    return Graph(e, directed=g.directed, vertices=v)


def common_neighbors(g: Graph, u, v):
    """Reference ``common_neighbors(G, u, v)`` (``classes/function.py:955``):
    a self-join on the shared endpoint."""
    adj = g.symmetrized()
    nu = adj.filter(F.col(SRC) == F.lit(str(u))).select(F.col(DST).alias(ID))
    nv = adj.filter(F.col(SRC) == F.lit(str(v))).select(F.col(DST).alias(ID))
    return (nu.join(nv, ID, "semi")
            .filter(~F.col(ID).isin([str(u), str(v)])).distinct())

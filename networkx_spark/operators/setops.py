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
    """Merge keeping H's (b's) attributes on common edges (``binary.py:292``);
    vertex/edge attribute tables merge cell-level with b winning, the
    reference's dict-update order."""
    from networkx_spark.attributes import merge_attrs
    _check(a, b)
    keys = b.edges.select(SRC, DST)
    only_a = a.edges.join(keys, [SRC, DST], "anti")
    e = only_a.unionByName(b.edges)
    v = a.vertices().unionByName(b.vertices()).distinct()
    return Graph(e, directed=a.directed, vertices=v,
                 vertex_attrs=merge_attrs(a._vertex_attrs, b._vertex_attrs, [ID]),
                 edge_attrs=merge_attrs(a._edge_attrs, b._edge_attrs, [SRC, DST]))


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


def full_join(a: Graph, b: Graph, rename: tuple[str, str] = ("G-", "H-")) -> Graph:
    """Union of renamed graphs plus all edges BETWEEN them
    (``binary.py:373-441`` with ``interface='all'``): every a-vertex is
    connected to every b-vertex — a cross join, sized |V(a)|·|V(b)|."""
    _check(a, b)
    u = union(a, b, rename=rename)
    pa, pb = rename
    va = a.vertices().select(F.concat(F.lit(pa), ID).alias(SRC))
    vb = b.vertices().select(F.concat(F.lit(pb), ID).alias(DST))
    cross = va.crossJoin(vb).withColumn(WEIGHT, F.lit(1.0))
    if not a.directed:
        cross = cross.select(F.least(SRC, DST).alias(SRC),
                             F.greatest(SRC, DST).alias(DST), WEIGHT)
    return Graph(u.edges.unionByName(cross), directed=a.directed,
                 vertices=u.vertices())


def union_all(graphs: list[Graph], rename: list[str] | None = None) -> Graph:
    """n-ary disjoint union (``operators/all.py:12-78``); default prefixes
    ``G0-, G1-, …`` mirror the reference's rename tuples."""
    if not graphs:
        raise ValueError("cannot take union of the empty list of graphs "
                         "(reference raises ValueError, all.py:64)")
    rename = rename or [f"G{i}-" for i in range(len(graphs))]
    out = None
    for g, p in zip(graphs, rename):
        e = g.edges.select(F.concat(F.lit(p), SRC).alias(SRC),
                           F.concat(F.lit(p), DST).alias(DST), WEIGHT)
        v = g.vertices().select(F.concat(F.lit(p), ID).alias(ID))
        out = (e, v) if out is None else (out[0].unionByName(e), out[1].unionByName(v))
    return Graph(out[0], directed=graphs[0].directed, vertices=out[1])


def disjoint_union_all(graphs: list[Graph]) -> Graph:
    """``operators/all.py:81-137`` — union_all with the integer-offset
    flavor of renaming collapsed into the same prefix scheme."""
    return union_all(graphs)


def compose_all(graphs: list[Graph]) -> Graph:
    """Left-fold of :func:`compose` (``operators/all.py:140-190``): later
    graphs' attributes win."""
    if not graphs:
        raise ValueError("cannot compose the empty list of graphs")
    out = graphs[0]
    for g in graphs[1:]:
        out = compose(out, g)
    return out


def intersection_all(graphs: list[Graph]) -> Graph:
    """Left-fold of :func:`intersection` (``operators/all.py:193-244``)."""
    if not graphs:
        raise ValueError("cannot intersect the empty list of graphs")
    out = graphs[0]
    for g in graphs[1:]:
        out = intersection(out, g)
    return out


def common_neighbors(g: Graph, u, v):
    """Reference ``common_neighbors(G, u, v)`` (``classes/function.py:955``):
    a self-join on the shared endpoint."""
    adj = g.symmetrized()
    nu = adj.filter(F.col(SRC) == F.lit(str(u))).select(F.col(DST).alias(ID))
    nv = adj.filter(F.col(SRC) == F.lit(str(v))).select(F.col(DST).alias(ID))
    return (nu.join(nv, ID, "semi")
            .filter(~F.col(ID).isin([str(u), str(v)])).distinct())

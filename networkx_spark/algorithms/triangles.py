"""Triangle counting by degree-ordered edge orientation, plus the derived
clustering coefficients.

Reference: ``networkx/algorithms/cluster.py``.  Its all-nodes kernel
(``cluster.py:66-87``) orients each undirected edge by first-seen iteration
order (``later_nbrs``) and closes wedges with a set intersection, crediting
each triangle to all three corners once.  Self-loops are excluded
(``cluster.py:74``); multigraphs are rejected (``cluster.py:90``) — our
:class:`Graph` already collapses parallel edges.

The Spark formulation replaces insertion order with **(degree, id) order** —
any acyclic orientation yields identical per-vertex counts — because degree
ordering bounds the self-join fan-out: every vertex's out-degree in the
oriented graph is ≤ O(√m), so the wedge join costs Σ d_out² ≤ O(m^1.5)
instead of Σ d² (dominated by hot vertices on web graphs).  Plan:

1. ``E`` = canonical self-loop-free edges, ``deg`` = simple degrees,
2. orient ``u→v`` iff ``(deg(u), u) < (deg(v), v)``,
3. wedges: oriented ⋈ oriented on the low corner ``a`` with
   ``(b.deg, b) < (c.deg, c)`` so each candidate pair appears once,
4. close: semi-join wedges against oriented edges on ``(b, c)``,
5. scatter +1 to each corner, groupBy vertex.

Counts are exact integers ⇒ byte-comparable with the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def _oriented(g: Graph) -> DataFrame:
    """Degree-ordered orientation: one row (lo, hi, lo_deg..) per edge of the
    simple self-loop-free graph."""
    e = g.edges.filter(F.col(SRC) != F.col(DST)).select(SRC, DST)
    if g.directed:
        # triangles are defined on the undirected simple graph
        e = (e.select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
             .distinct())
    # simple degree = number of distinct neighbors (self excluded), matching
    # d = len(set(v_nbrs) - {v}) in _triangles_and_degree_iter (cluster.py:104)
    deg = (e.select(F.col(SRC).alias(ID)).union(e.select(F.col(DST).alias(ID)))
           .groupBy(ID).agg(F.count("*").alias("deg")))
    ed = (e.join(deg.select(F.col(ID).alias(SRC), F.col("deg").alias("sdeg")), SRC)
           .join(deg.select(F.col(ID).alias(DST), F.col("deg").alias("ddeg")), DST))
    lo_first = (F.col("sdeg") < F.col("ddeg")) | \
               ((F.col("sdeg") == F.col("ddeg")) & (F.col(SRC) < F.col(DST)))
    return ed.select(
        F.when(lo_first, F.col(SRC)).otherwise(F.col(DST)).alias("a"),
        F.when(lo_first, F.col(DST)).otherwise(F.col(SRC)).alias("b"),
        F.when(lo_first, F.col("ddeg")).otherwise(F.col("sdeg")).alias("b_deg"),
    )


def triangle_corners(g: Graph,
                     broadcast_threshold: int = 5_000_000) -> DataFrame:
    """One row (a, b, c) per triangle in the graph (a = lowest-ranked
    corner).

    The wedge set is Σd_out² ≈ m^1.5 rows — orders of magnitude larger
    than the edge table — so the closing-edge check must not shuffle it:
    below ``broadcast_threshold`` edges the closing side is broadcast
    (hash semi-join streams the wedges in place, no exchange); above it
    the plan falls back to a shuffled semi-join, the correct shape when
    the edge table itself no longer fits an executor."""
    o = _oriented(g).cache()
    left = o.select("a", F.col("b").alias("b"), F.col("b_deg").alias("bd"))
    right = o.select(F.col("a").alias("a2"), F.col("b").alias("c"), F.col("b_deg").alias("cd"))
    wedges = (left.join(right, (F.col("a") == F.col("a2")) &
                        ((F.col("bd") < F.col("cd")) |
                         ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))))
              .select("a", "b", "c"))
    closing = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
    if o.count() <= broadcast_threshold:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, ["b", "c"], "semi")
    return tri


def _nbunch(df: DataFrame, nodes) -> DataFrame:
    """Restrict an (id, …) result to ``nodes`` (DataFrame or iterable) —
    the reference's ``nbunch_iter`` subset form (``cluster.py:30-33``)."""
    if nodes is None:
        return df
    if isinstance(nodes, DataFrame):
        n = nodes.select(F.col(nodes.columns[0]).alias(ID))
    else:
        spark = df.sparkSession
        n = spark.createDataFrame([(v,) for v in nodes],
                                  df.select(ID).schema)
    return df.join(n, ID, "semi")


def triangles(g: Graph, nodes=None) -> DataFrame:
    """(id, triangles) per vertex — every vertex present, isolated/zero
    included (``cluster.py:77`` initializes all counts to 0); ``nodes``
    restricts the output like ``triangles(G, nbunch)`` (``cluster.py:30``).
    The count itself is always computed on the full graph — a triangle's
    corners need not lie in the nbunch.  Raises on directed input like the
    reference (``@not_implemented_for("directed")``, ``cluster.py:19``);
    internal callers that legitimately symmetrize (transitivity, the
    Fagiolo directed clustering) use :func:`_triangle_counts`."""
    if g.directed:
        raise ValueError("triangles() is not implemented for directed graphs "
                         "(reference raises NetworkXNotImplemented); call "
                         "g.to_undirected() first")
    return _triangle_counts(g, nodes)


def _triangle_counts(g: Graph, nodes=None) -> DataFrame:
    tri = triangle_corners(g)
    corners = (tri.select(F.col("a").alias(ID))
               .union(tri.select(F.col("b").alias(ID)))
               .union(tri.select(F.col("c").alias(ID))))
    counts = corners.groupBy(ID).agg(F.count("*").alias("triangles"))
    out = (g.vertices().join(counts, ID, "left")
           .select(ID, F.coalesce("triangles", F.lit(0)).alias("triangles")))
    return _nbunch(out, nodes)


def total_triangles(g: Graph) -> int:
    """Global triangle count (= sum(per-vertex)/3, reference test idiom
    ``test_cluster.py:35-38``)."""
    return triangle_corners(g).count()


def _tri_and_deg(g: Graph) -> DataFrame:
    """(id, triangles, deg) with deg = simple neighbor count excluding self
    (``cluster.py:104``: ``len(set(v_nbrs) - {v})``)."""
    e = g.edges.filter(F.col(SRC) != F.col(DST)).select(SRC, DST)
    if g.directed:
        e = (e.select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
             .distinct())
    deg = (e.select(F.col(SRC).alias(ID)).union(e.select(F.col(DST).alias(ID)))
           .groupBy(ID).agg(F.count("*").alias("deg")))
    t = _triangle_counts(g)
    return (t.join(deg, ID, "left")
            .select(ID, "triangles", F.coalesce("deg", F.lit(0)).alias("deg")))


def _pair_strengths(g: Graph, weight: bool) -> DataFrame:
    """(u, v, s) per unordered vertex pair (u < v, self-loops excluded).

    ``s`` is the factorized per-pair term of the reference's triangle
    sums: undirected → ``cbrt(ŵ)`` (1 when unweighted); directed →
    ``cbrt(ŵ_uv) + cbrt(ŵ_vu)`` (edge-direction multiplicity 1/2 when
    unweighted), which makes every directed-combination sum in
    ``_directed[_weighted]_triangles_and_degree_iter`` (``cluster.py:152,
    187``) a product of three pair terms."""
    e = g.edges.filter(F.col(SRC) != F.col(DST))
    if weight:
        mx = e.agg(F.max(F.col("weight"))).collect()[0][0] or 1.0
        term = F.cbrt(F.col("weight") / F.lit(float(mx)))
    else:
        term = F.lit(1.0)
    per_dir = e.select(F.least(SRC, DST).alias("u"),
                       F.greatest(SRC, DST).alias("v"), term.alias("s"))
    if not g.directed:
        return per_dir
    return per_dir.groupBy("u", "v").agg(F.sum("s").alias("s"))


def _triangle_strength_sums(g: Graph, weight: bool) -> DataFrame:
    """(id, t): Σ over triangles at the vertex of the product of the three
    pair strengths (the per-corner weighted-triangle sum)."""
    simple = g if not g.directed else Graph(
        g.edges.filter(F.col(SRC) != F.col(DST))
        .select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
        .distinct().withColumn("weight", F.lit(1.0)), directed=False)
    tri = triangle_corners(simple)
    ps = _pair_strengths(g, weight)
    t = (tri
         .join(ps.withColumnsRenamed({"s": "s1"}),
               (F.least("a", "b") == F.col("u")) & (F.greatest("a", "b") == F.col("v")))
         .drop("u", "v")
         .join(ps.withColumnsRenamed({"s": "s2"}),
               (F.least("a", "c") == F.col("u")) & (F.greatest("a", "c") == F.col("v")))
         .drop("u", "v")
         .join(ps.withColumnsRenamed({"s": "s3"}),
               (F.least("b", "c") == F.col("u")) & (F.greatest("b", "c") == F.col("v")))
         .select("a", "b", "c", (F.col("s1") * F.col("s2") * F.col("s3")).alias("p")))
    corners = (t.select(F.col("a").alias(ID), "p")
               .union(t.select(F.col("b").alias(ID), "p"))
               .union(t.select(F.col("c").alias(ID), "p")))
    sums = corners.groupBy(ID).agg(F.sum("p").alias("t"))
    return (g.vertices().join(sums, ID, "left")
            .select(ID, F.coalesce("t", F.lit(0.0)).alias("t")))


def clustering(g: Graph, nodes=None, weight: bool = False) -> DataFrame:
    """(id, clustering) — the reference's full ``clustering(G, nodes,
    weight)`` dispatch (``cluster.py:395-427``):

    * undirected unweighted: ``2T/(d(d-1))``,
    * undirected weighted: geometric-mean triangle weights
      (``_weighted_triangles_and_degree_iter``, ``cluster.py:112``),
    * directed (±weight): Fagiolo — ``T/(dt(dt-1) - 2·d_bidir)`` where the
      triangle sum factorizes over per-pair direction multiplicities
      (``_directed_triangles_and_degree_iter``, ``cluster.py:152``).
    """
    if not g.directed and not weight:
        td = _tri_and_deg(g)
        out = td.select(
            ID,
            F.when(F.col("deg") < 2, F.lit(0.0))
             .otherwise(2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)))
             .alias("clustering"))
        return _nbunch(out, nodes)
    t = _triangle_strength_sums(g, weight)
    if not g.directed:
        deg = (g.edges.filter(F.col(SRC) != F.col(DST))
               .select(F.col(SRC).alias(ID)).union(
                   g.edges.filter(F.col(SRC) != F.col(DST)).select(F.col(DST).alias(ID)))
               .groupBy(ID).agg(F.count("*").alias("deg")))
        out = (t.join(deg, ID, "left")
               .select(ID, F.when(F.coalesce("deg", F.lit(0)) < 2, F.lit(0.0))
                       .otherwise(2.0 * F.col("t") /
                                  (F.col("deg") * (F.col("deg") - 1)))
                       .alias("clustering")))
        return _nbunch(out, nodes)
    e = g.edges.filter(F.col(SRC) != F.col(DST))
    dt = (e.select(F.col(SRC).alias(ID)).union(e.select(F.col(DST).alias(ID)))
          .groupBy(ID).agg(F.count("*").alias("dt")))
    bi = (e.select(SRC, DST)
          .join(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)),
                [SRC, DST], "semi")
          .groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("db")))
    out = (t.join(dt, ID, "left").join(bi, ID, "left")
           .select(ID,
                   F.when(F.col("t") == 0.0, F.lit(0.0))
                   .otherwise(F.col("t") /
                              (F.coalesce("dt", F.lit(0)) * (F.coalesce("dt", F.lit(0)) - 1)
                               - 2 * F.coalesce("db", F.lit(0))))
                   .alias("clustering")))
    return _nbunch(out, nodes)


def transitivity(g: Graph) -> float:
    """3·triangles/triads (``cluster.py:426-465``); 0 for the empty/
    triangle-free graph."""
    td = _tri_and_deg(g)
    row = td.agg(F.sum(F.col("triangles") * 2).alias("t"),
                 F.sum(F.col("deg") * (F.col("deg") - 1)).alias("c")).collect()[0]
    t, c = row["t"] or 0, row["c"] or 0
    return 0.0 if t == 0 else t / c


def average_clustering(g: Graph, nodes=None, weight: bool = False,
                       count_zeros: bool = True) -> float:
    """Mean of the per-vertex coefficients (``cluster.py:251-307``)."""
    c = clustering(g, nodes=nodes, weight=weight)
    if not count_zeros:
        c = c.filter(F.abs(F.col("clustering")) > 0)
    row = c.agg(F.avg("clustering").alias("m")).collect()[0]
    return float(row["m"] or 0.0)


def square_clustering(g: Graph, nodes=None) -> DataFrame:
    """(id, square_clustering) — C4 coefficient (``cluster.py:469-540``):

        C4(v) = Σ_{u<w ∈ N(v)} q_v(u,w) / Σ_{u<w ∈ N(v)} [a_v(u,w) + q_v(u,w)]

    with ``q_v(u,w) = |N(u) ∩ N(w)| − 1`` (v itself always lies in the
    intersection because u, w ∈ N(v)) and ``a_v(u,w) = (k_u − degm) +
    (k_w − degm)`` where ``degm = q + 1 + θ_uw`` (``cluster.py:527-539``).
    Nodes with < 2 neighbors score 0 (the reference's untouched 0 init).

    Shape: the wedge table (Σ d_v² rows) joined with the pair-level
    common-neighbor counts — which are the SAME wedge table aggregated by
    (u, w) — plus degrees and a canonical-edge existence flag.  Unlike
    triangle counting no acyclic orientation can prune the enumeration
    (every pair at every corner genuinely contributes), so hub vertices
    cost their d² wedges; at web scale restrict via ``nodes`` after a
    degree cap, like the reference's per-nbunch form.
    """
    if g.directed:
        raise ValueError("square_clustering is not implemented for directed "
                         "graphs here; symmetrize explicitly first")
    sym = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias("v"), F.col(DST).alias("n")).distinct()
           .cache())
    deg = sym.groupBy(F.col("v").alias(ID)).agg(F.count("*").alias("k"))
    wedges = (sym.select("v", F.col("n").alias("u"))
              .join(sym.select(F.col("v").alias("_v2"), F.col("n").alias("w")),
                    F.col("v") == F.col("_v2"))
              .filter(F.col("u") < F.col("w"))
              .select("v", "u", "w"))
    cuw = wedges.groupBy("u", "w").agg(F.count("*").alias("_c"))
    euw = (g.edges.filter(F.col(SRC) != F.col(DST))
           .select(F.least(SRC, DST).alias("u"), F.greatest(SRC, DST).alias("w"))
           .distinct().withColumn("_th", F.lit(1)))
    per = (wedges
           .join(cuw, ["u", "w"])
           .join(euw, ["u", "w"], "left")
           .join(deg.select(F.col(ID).alias("u"), F.col("k").alias("_ku")), "u")
           .join(deg.select(F.col(ID).alias("w"), F.col("k").alias("_kw")), "w")
           .select("v", (F.col("_c") - 1).alias("q"),
                   ((F.col("_c") - 1) + 1
                    + F.coalesce("_th", F.lit(0))).alias("degm"),
                   "_ku", "_kw"))
    agg = (per.groupBy(F.col("v").alias(ID))
           .agg(F.sum("q").alias("_q"),
                F.sum(F.col("_ku") - F.col("degm")
                      + F.col("_kw") - F.col("degm")
                      + F.col("q")).alias("_pot")))
    out = (g.vertices().join(agg, ID, "left")
           .select(ID, F.when(F.coalesce("_pot", F.lit(0)) > 0,
                              F.col("_q") / F.col("_pot"))
                   .otherwise(F.lit(0.0)).alias("square_clustering")))
    return _nbunch(out, nodes)


def generalized_degree(g: Graph, nodes=None) -> DataFrame:
    """(id, tri, edges) — per vertex, how many incident edges lie in
    exactly ``tri`` triangles: the flat-table form of the reference's
    per-node ``Counter{triangle_count: edge_count}``
    (``cluster.py:543-609``, ``_triangles_and_generalized_degree_iter``).

    Reuses the oriented triangle enumeration: each triangle credits one
    membership to each of its three canonical edges, incident edges with
    no triangle keep 0 via the left join, and the per-vertex histogram is
    one groupBy.  Isolated vertices have no incident edges → no rows
    (the reference returns an empty Counter).  Cost: the triangle join
    (Σ d_out², d_out ≤ √2m) plus two edge-table shuffles — same scale
    posture as :func:`triangles`.
    """
    if g.directed:
        raise ValueError("generalized_degree is not implemented for "
                         "directed graphs (reference raises "
                         "NetworkXNotImplemented); call g.to_undirected() "
                         "first")
    e = (g.edges.filter(F.col(SRC) != F.col(DST))
         .select(F.least(SRC, DST).alias("u"), F.greatest(SRC, DST).alias("w"))
         .distinct())
    tri = triangle_corners(g)
    tri_edges = (
        tri.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("w"))
        .union(tri.select(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("w")))
        .union(tri.select(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("w"))))
    t = tri_edges.groupBy("u", "w").agg(F.count("*").alias("_t"))
    et = (e.join(t, ["u", "w"], "left")
          .select("u", "w", F.coalesce("_t", F.lit(0)).alias("_t")))
    both = (et.select(F.col("u").alias(ID), "_t")
            .union(et.select(F.col("w").alias(ID), "_t")))
    out = (both.groupBy(ID, F.col("_t").alias("tri"))
           .agg(F.count("*").alias("edges")))
    return _nbunch(out, nodes)

"""Graph distance measures: eccentricity, diameter, radius, center,
periphery.

Reference ``networkx/algorithms/distance_measures.py:241-540``:
``eccentricity(G, v)`` = max shortest-path distance from v to every other
node (per-node BFS loop in the reference); raises when the graph is not
(strongly) connected — "Found infinite path length …" (``:313-319``).
``diameter`` = max eccentricity, ``radius`` = min, ``center`` = nodes at
radius, ``periphery`` = nodes at diameter (``:330,445,498,386``).

Spark shape: ONE batched multi-source BFS over all vertices (state keyed
``(s, id)``, one job per BFS level — reusing the closeness-centrality
frontier machinery) followed by a groupBy max.  Exact all-vertex mode is
O(V²) state rows — all-pairs shortest paths, fixture-scale by nature; at
web scale pass ``sources`` to bound the state (the reference's
``usebounds`` pruning is likewise a heuristic over per-node BFS).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, ID, SRC, DST
from networkx_spark.algorithms.centrality import _incoming_levels
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def eccentricity(g: Graph, sources: Optional[DataFrame] = None,
                 max_depth: int = 10_000) -> DataFrame:
    """(id, eccentricity) — max finite distance from each vertex
    (``distance_measures.py:241``).  Raises when any vertex cannot reach
    every other vertex, matching the reference's connectivity error
    (``:313-319``)."""
    n = g.number_of_vertices()
    # _incoming_levels rows are (s, id, dist) with dist = d(id → s), so
    # grouping by id gives OUTGOING distances from id — the reference's
    # nx.shortest_path_length(G, n) orientation
    levels = _incoming_levels(g, None, max_depth)
    ecc = (levels.groupBy(ID)
           .agg(F.max("dist").alias("eccentricity"),
                F.count("*").alias("_reached")))
    bad = ecc.filter(F.col("_reached") < n).limit(1).count()
    if bad or ecc.count() < n:
        kind = ("digraph is not strongly connected" if g.directed
                else "graph is not connected")
        raise ValueError(f"Found infinite path length because the {kind} "
                         "(reference NetworkXError)")
    out = ecc.select(ID, F.col("eccentricity").cast("long").alias("eccentricity"))
    if sources is not None:
        out = out.join(sources.select(ID), ID, "semi")
    return out


def _ecc_scalar(g: Graph, agg) -> int:
    row = eccentricity(g).agg(agg("eccentricity").alias("v")).collect()[0]
    return int(row["v"])


def diameter(g: Graph) -> int:
    """Max eccentricity (``distance_measures.py:330``)."""
    return _ecc_scalar(g, F.max)


def radius(g: Graph) -> int:
    """Min eccentricity (``distance_measures.py:445``)."""
    return _ecc_scalar(g, F.min)


def center(g: Graph) -> DataFrame:
    """(id) vertices with eccentricity == radius (``:498``)."""
    ecc = eccentricity(g)
    r = ecc.agg(F.min("eccentricity")).collect()[0][0]
    return ecc.filter(F.col("eccentricity") == r).select(ID)


def periphery(g: Graph) -> DataFrame:
    """(id) vertices with eccentricity == diameter (``:386``)."""
    ecc = eccentricity(g)
    d = ecc.agg(F.max("eccentricity")).collect()[0][0]
    return ecc.filter(F.col("eccentricity") == d).select(ID)


# ------------------------------------------- path-sum aggregate measures
def _pair_distances(g: Graph, max_depth: int) -> DataFrame:
    """Ordered-pair distance table (s, id, dist) with dist ≥ 1 — one
    batched all-source BFS, shared by every Σ-over-pairs measure below."""
    return _incoming_levels(g, None, max_depth).filter(F.col("dist") > 0)


def wiener_index(g: Graph, max_depth: int = 10_000) -> float:
    """Σ over unordered pairs of d(u, v)
    (reference ``networkx/algorithms/wiener.py:26`` ``wiener_index``).
    Disconnected / non-strongly-connected graphs return ``inf`` like the
    reference (``wiener.py:80-84``).  Directed graphs sum over ordered
    pairs (the reference sums ``shortest_path_length`` over all sources,
    which double-counts undirected pairs and then halves — identical)."""
    n = g.number_of_vertices()
    dists = _pair_distances(g, max_depth)
    row = dists.agg(F.sum("dist").alias("tot"),
                    F.count("*").alias("pairs")).collect()[0]
    expected = n * (n - 1)
    if (row["pairs"] or 0) < expected:
        return float("inf")
    tot = float(row["tot"] or 0)
    return tot if g.directed else tot / 2.0


def average_shortest_path_length(g: Graph, max_depth: int = 10_000) -> float:
    """Σ d(u,v) / (n(n−1)) over ordered pairs (reference
    ``shortest_paths/generic.py:356`` ``average_shortest_path_length``).
    Raises on <2 vertices and on disconnected input like the reference
    (``generic.py:427-435``)."""
    n = g.number_of_vertices()
    if n < 2:
        raise ValueError("Graph has fewer than two nodes "
                         "(reference NetworkXPointlessConcept)")
    dists = _pair_distances(g, max_depth)
    row = dists.agg(F.sum("dist").alias("tot"),
                    F.count("*").alias("pairs")).collect()[0]
    if (row["pairs"] or 0) < n * (n - 1):
        kind = "strongly connected" if g.directed else "connected"
        raise ValueError(f"Graph is not {kind} (reference NetworkXError)")
    return float(row["tot"]) / float(n * (n - 1))


def global_efficiency(g: Graph, max_depth: int = 10_000) -> float:
    """Mean over ordered vertex pairs of 1/d(u,v), unreachable pairs
    contributing 0 (reference ``algorithms/efficiency_measures.py:60``
    ``global_efficiency``; undirected only there — same guard here)."""
    if g.directed:
        raise ValueError("global_efficiency not defined for directed "
                         "graphs (reference raises NetworkXNotImplemented)")
    n = g.number_of_vertices()
    denom = n * (n - 1)
    if denom == 0:
        return 0.0
    row = (_pair_distances(g, max_depth)
           .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("inv")).collect()[0])
    return float(row["inv"] or 0.0) / float(denom)


def efficiency(g: Graph, u, v, max_depth: int = 10_000) -> float:
    """1/d(u, v), 0 when unreachable (reference
    ``efficiency_measures.py:11`` ``efficiency``; undirected only)."""
    if g.directed:
        raise ValueError("efficiency not defined for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    from networkx_spark.algorithms.bfs import bfs_distances
    d = (bfs_distances(g, str(u), max_depth=max_depth)
         .filter(F.col(ID) == str(v)).collect())
    return 1.0 / float(d[0]["distance"]) if d and d[0]["distance"] > 0 else 0.0


def local_efficiency(g: Graph, max_depth: int = 10_000) -> float:
    """Mean over vertices v of the global efficiency of the subgraph
    induced on N(v) (reference ``efficiency_measures.py:130``
    ``local_efficiency``; undirected only).

    Spark shape: ONE batched BFS over every ego subgraph at once — the
    state is keyed ``(c, s, id)`` (ego center, BFS source, vertex) and the
    center-scoped adjacency ``cadj(c, u, w)`` is the triangle wedge join
    (u, w ∈ N(c) and u—w an edge), so all ego subgraphs advance one level
    per Spark job.  State is Σ_c |N(c)|² rows — the same d̄² envelope as
    triangle counting; hub-heavy graphs pay the same wedge cost there.
    """
    if g.directed:
        raise ValueError("local_efficiency not defined for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    n = g.number_of_vertices()
    if n == 0:
        raise ZeroDivisionError("local_efficiency of an empty graph "
                                "(reference raises the same)")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(SRC, DST).distinct().cache())
    m = sym.select(F.col(SRC).alias("c"), F.col(DST).alias("u"))
    # wedge join: edges of the ego subgraph of c
    cadj = (m.select("c", F.col("u").alias(ID))
            .join(sym.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")),
                  ID)
            .join(m.select("c", F.col("u").alias("nbr")), ["c", "nbr"],
                  "semi")
            .repartition(n_part, "c", ID).cache())
    sizes = m.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))

    from pyspark.sql import Observation
    runner = SuperstepRunner(None, name="local_eff", keep_scratch=2)
    try:
      with fixed_plan(spark):
        state = runner.cut(m.select("c", F.col("u").alias("s"),
                                    F.col("u").alias(ID),
                                    F.lit(0).alias("dist")))
        frontier = state
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(cadj, ["c", ID])
                   .select("c", "s", F.col("nbr").alias(ID)).distinct()
                   .join(state.select("c", "s", ID), ["c", "s", ID], "anti")
                   .select("c", "s", ID, F.lit(d).alias("dist")))
            obs = Observation()
            state = runner.cut(
                state.unionByName(nxt)
                .observe(obs, F.sum(F.when(F.col("dist") == d, 1)
                                    .otherwise(0)).alias("n")))
            if int(obs.get["n"] or 0) == 0:
                break
            frontier = state.filter(F.col("dist") == d)
        inv = (state.filter(F.col("dist") > 0).groupBy("c")
               .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("inv")))
        per = (sizes.join(inv, "c", "left")
               .select(F.when(F.col("n_c") > 1,
                              F.coalesce("inv", F.lit(0.0))
                              / (F.col("n_c") * (F.col("n_c") - 1)))
                       .otherwise(0.0).alias("eff")))
        tot = per.agg(F.sum("eff")).collect()[0][0]
        return float(tot or 0.0) / float(n)
    finally:
        sym.unpersist()
        cadj.unpersist()
        runner.close()


def closeness_vitality(g: Graph, max_depth: int = 10_000,
                       max_vertices: int = 2_000) -> DataFrame:
    """(id, closeness_vitality) — W(G) − W(G − v) per vertex (reference
    ``networkx/algorithms/vitality.py:9`` ``closeness_vitality``;
    disconnected removals give −inf, both-infinite gives NaN, exactly the
    reference's float arithmetic).

    Spark shape: ONE batched BFS keyed ``(rm, s, id)`` — every
    remove-one-vertex graph advances one level per Spark job; the wiener
    sums come off a single groupBy.  State is O(n²·levels) rows by
    definition (all-pairs distances in n graphs), hence ``max_vertices``:
    this is a fixture/subgraph-tier vitality measure.
    """
    spark = g.edges.sparkSession
    n = g.number_of_vertices()
    if n > max_vertices:
        raise ValueError(
            f"closeness_vitality is O(n^2) state by definition; {n} "
            f"vertices > max_vertices={max_vertices}")
    w_full = wiener_index(g, max_depth)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")).distinct()
           .repartition(n_part, ID).cache())
    verts = g.vertices().cache()

    from pyspark.sql import Observation
    runner = SuperstepRunner(None, name="vitality", keep_scratch=2)
    try:
      with fixed_plan(spark):
        pairs = (verts.select(F.col(ID).alias("rm"))
                 .crossJoin(verts.select(F.col(ID).alias("s")))
                 .filter(F.col("rm") != F.col("s")))
        state = runner.cut(pairs.select("rm", "s", F.col("s").alias(ID),
                                        F.lit(0).alias("dist")))
        frontier = state
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(adj, ID)
                   .filter(F.col("nbr") != F.col("rm"))
                   .select("rm", "s", F.col("nbr").alias(ID)).distinct()
                   .join(state.select("rm", "s", ID), ["rm", "s", ID],
                         "anti")
                   .select("rm", "s", ID, F.lit(d).alias("dist")))
            obs = Observation()
            state = runner.cut(
                state.unionByName(nxt)
                .observe(obs, F.sum(F.when(F.col("dist") == d, 1)
                                    .otherwise(0)).alias("n")))
            if int(obs.get["n"] or 0) == 0:
                break
            frontier = state.filter(F.col("dist") == d)
        agg = (state.filter(F.col("dist") > 0).groupBy("rm")
               .agg(F.sum("dist").alias("tot"),
                    F.count(F.lit(1)).alias("pairs")))
        rows = (verts.select(F.col(ID).alias("rm"))
                .join(agg, "rm", "left").collect())
        expected = (n - 1) * (n - 2)
        out = []
        for r in rows:
            if (r["pairs"] or 0) < expected:
                w_rm = float("inf")
            else:
                w_rm = float(r["tot"]) if g.directed else float(r["tot"]) / 2.0
            out.append((r["rm"], w_full - w_rm))
        return spark.createDataFrame(
            out, "id string, closeness_vitality double")
    finally:
        adj.unpersist()
        verts.unpersist()
        runner.close()


def _degree_distance_sum(g: Graph, combine, max_depth: int) -> float:
    """Σ over ordered pairs of dist·combine(deg_u, deg_v), halved —
    shared by Schultz/Gutman.  Raises on disconnected input like the
    reference (``wiener.py:142-151``)."""
    if g.directed:
        raise ValueError("Schultz/Gutman indices are undirected-only "
                         "(reference raises NetworkXNotImplemented)")
    n = g.number_of_vertices()
    if n <= 1:
        return 0.0  # trivially connected, empty pair sum (reference: 0.0)
    deg = g.degrees()
    dists = _pair_distances(g, max_depth)
    row = (dists
           .join(deg.select(F.col(ID).alias("s"),
                            F.col("degree").alias("_ds")), "s")
           .join(deg.select(ID, F.col("degree").alias("_dt")), ID)
           .agg(F.sum(F.col("dist") * combine(F.col("_ds"), F.col("_dt")))
                .alias("tot"),
                F.count(F.lit(1)).alias("pairs"))).collect()[0]
    if (row["pairs"] or 0) < n * (n - 1):
        raise ValueError("Graph is not connected (reference NetworkXError)")
    return float(row["tot"]) / 2.0


def degree_distance_indices(g: Graph,
                            max_depth: int = 10_000) -> tuple[float, float]:
    """(schultz, gutman) from ONE all-pairs BFS — the two indices share
    the distance table, so computing them together halves the cost."""
    if g.directed:
        raise ValueError("Schultz/Gutman indices are undirected-only "
                         "(reference raises NetworkXNotImplemented)")
    n = g.number_of_vertices()
    if n <= 1:
        return 0.0, 0.0  # trivially connected, empty pair sum
    deg = g.degrees()
    dists = _pair_distances(g, max_depth)
    row = (dists
           .join(deg.select(F.col(ID).alias("s"),
                            F.col("degree").alias("_ds")), "s")
           .join(deg.select(ID, F.col("degree").alias("_dt")), ID)
           .agg(F.sum(F.col("dist") * (F.col("_ds") + F.col("_dt")))
                .alias("s_tot"),
                F.sum(F.col("dist") * F.col("_ds") * F.col("_dt"))
                .alias("g_tot"),
                F.count(F.lit(1)).alias("pairs"))).collect()[0]
    if (row["pairs"] or 0) < n * (n - 1):
        raise ValueError("Graph is not connected (reference NetworkXError)")
    return float(row["s_tot"]) / 2.0, float(row["g_tot"]) / 2.0


def schultz_index(g: Graph, max_depth: int = 10_000) -> float:
    """Σ over unordered pairs of d(u,v)·(deg u + deg v)
    (reference ``wiener.py:98`` ``schultz_index``; degrees are always the
    unweighted counts there — its ``dict(G.degree, weight=...)`` puts the
    weight into the dict as a KEY, a reference quirk mirrored by simply
    using unweighted degrees)."""
    return _degree_distance_sum(g, lambda a, b: a + b, max_depth)


def gutman_index(g: Graph, max_depth: int = 10_000) -> float:
    """Σ over unordered pairs of d(u,v)·deg(u)·deg(v)
    (reference ``wiener.py:166`` ``gutman_index``; same degree quirk as
    :func:`schultz_index`)."""
    return _degree_distance_sum(g, lambda a, b: a * b, max_depth)


def resistance_distance(g: Graph, nodeA=None, nodeB=None,
                        weight: str | None = None,
                        invert_weight: bool = True,
                        max_vertices: int = 2_000):
    """Resistance distance via the Laplacian pseudo-inverse (reference
    ``distance_measures.py:639``): r(a, b) = L⁺[a,a] + L⁺[b,b] − 2·L⁺[a,b].

    ``weight`` names the conductance attribute; ``invert_weight`` treats it
    as a resistance (1/w conductance), like the reference.  Both nodes
    given → float; else a DataFrame (a, b, resistance) of the requested
    slice (one node → its row; none → all pairs).  Dense pinv is O(n³)
    driver numpy — capped, the spectral-kernel posture of
    ``spectral.py``; self-loops are ignored like the reference."""
    import numpy as np

    if g.directed:
        raise ValueError("resistance_distance is undirected-only "
                         "(reference @not_implemented_for('directed'))")
    verts = sorted((r[ID] for r in g.vertices().collect()),
                   key=lambda x: (isinstance(x, str), x))
    n = len(verts)
    if n == 0:
        raise ValueError("Graph G must contain at least one node. "
                         "(reference NetworkXError)")
    if n > max_vertices:
        raise ValueError(f"resistance_distance pinv kernel capped at "
                         f"{max_vertices} vertices (got {n})")
    from networkx_spark.algorithms.components import connected_components
    ncomp = (connected_components(g).select("component").distinct().count())
    if ncomp != 1:
        raise ValueError("Graph G must be strongly connected. "
                         "(reference NetworkXError)")
    for node, nm in ((nodeA, "A"), (nodeB, "B")):
        if node is not None and node not in verts:
            raise ValueError(f"Node {nm} is not in graph G. "
                             "(reference NetworkXError)")
    idx = {v: i for i, v in enumerate(verts)}
    wcol = (F.col(weight).cast("double") if weight and
            weight in g.edges.columns else None)
    rows = (g.edges.filter(F.col(SRC) != F.col(DST))
            .select(SRC, DST, (wcol if wcol is not None else F.lit(1.0))
                    .alias("_w")).collect())
    L = np.zeros((n, n))
    for r in rows:
        c = float(r["_w"])
        if weight is not None and invert_weight:
            c = 1.0 / c
        i, j = idx[r[SRC]], idx[r[DST]]
        L[i, j] -= c
        L[j, i] -= c
        L[i, i] += c
        L[j, j] += c
    Li = np.linalg.pinv(L, hermitian=True)
    diag = np.diag(Li)
    R = diag[:, None] + diag[None, :] - Li - Li.T
    if nodeA is not None and nodeB is not None:
        return float(R[idx[nodeA], idx[nodeB]])
    spark = g.edges.sparkSession
    if nodeA is not None or nodeB is not None:
        a = nodeA if nodeA is not None else nodeB
        data = [(a, v, round(float(R[idx[a], idx[v]]), 12)) for v in verts]
    else:
        data = [(u, v, round(float(R[idx[u], idx[v]]), 12))
                for u in verts for v in verts]
    id_t = g.edges.schema[SRC].dataType.simpleString()
    return spark.createDataFrame(data,
                                 f"a {id_t}, b {id_t}, resistance double")


def effective_graph_resistance(g: Graph, weight: str | None = None,
                               invert_weight: bool = True,
                               max_vertices: int = 2_000) -> float:
    """Kirchhoff index: Σ over unordered pairs of r(u, v) = n · tr(L⁺)
    (reference ``distance_measures.py:780``; infinite for disconnected
    graphs there — this kernel raises instead, naming the reference
    semantics)."""
    import numpy as np

    df = resistance_distance(g, weight=weight,
                             invert_weight=invert_weight,
                             max_vertices=max_vertices)
    tot = df.agg(F.sum("resistance")).collect()[0][0] or 0.0
    return float(tot) / 2.0

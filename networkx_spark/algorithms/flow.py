"""Maximum flow / minimum cut over a residual edge table.

Reference surface (``networkx/algorithms/flow/maxflow.py``):

* ``maximum_flow(G, s, t, capacity="capacity")`` → ``(value, flow_dict)``
  (``maxflow.py:20``)
* ``maximum_flow_value`` (``maxflow.py:164``)
* ``minimum_cut(G, s, t)`` → ``(value, (S, T))`` (``maxflow.py:303``)
* ``minimum_cut_value`` (``maxflow.py:453``)

The reference's solvers (``shortest_augmenting_path.py``, ``dinitz_alg.py``,
``preflow_push.py``) are pointer-machine kernels over an in-memory residual
network (``flow/utils.py:build_residual_network``).  The engine keeps the
residual network as a DataFrame of arcs ``(src, dst, r)`` (both directions
per input edge, reverse arcs start at 0) and runs **shortest-augmenting-path
phases as frontier supersteps** — the Dinitz/Edmonds–Karp structure:

1. BFS over positive-residual arcs from ``s`` (one frontier join per level,
   min-predecessor tracked; early-exit the moment ``t`` is levelled).
2. Walk the predecessor chain back from ``t`` (≤ diameter one-row lookups);
   the bottleneck is the min arc residual collected during the walk.
3. One join updates the residuals along the path (forward −b, reverse +b);
   the loop re-enters BFS on the cut residual table.

Each augmentation costs O(diameter) supersteps with O(V + E) distributed
state — the same envelope as SSSP; total augmentations are bounded by
O(V·E) (Edmonds–Karp) but in practice by the number of bottleneck edges.
Exact max-flow is inherently sequential in the augmentation dimension —
this is the honest distributed shape, not a collect()-the-graph kernel:
the graph never leaves the cluster, only O(path length) scalar lookups do.

The **min cut** falls out for free: after the loop, the vertices that can
still reach ``t`` through positive-residual arcs form the sink side; the
complement is the unique MAXIMAL source side — the reference's own
partition (``maxflow.py:430-434``), identical for every maximum flow, so
it is deterministic and oracle-checkable.

Parity: flow VALUE and cut partition are unique and compared exactly
against the reference; per-arc flow assignments are NOT unique (flow
decomposition), so tests assert validity (capacity + conservation +
value) rather than arc-level equality, like the reference's own
``flow/tests/test_maxflow.py`` validation helpers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan

INF = float("inf")
# residual capacities are exact in int64 after scaling? No — capacities are
# doubles like the reference; "infinite" (missing capacity attr) arcs are
# modelled with this sentinel, far above any finite sum this engine meets.
_BIG = 1e308


class Unbounded(ValueError):
    """Infinite-capacity s→t path (reference ``NetworkXUnbounded``,
    ``maxflow.py:108``)."""


def _residual_arcs(g: Graph, capacity: str) -> DataFrame:
    """Arc table (src, dst, r): forward arcs at their capacity (missing
    attribute → +inf like the reference, ``flow/utils.py:129-138``),
    reverse arcs materialized at 0; parallel arcs merge by sum, self-loops
    dropped (``flow/utils.py:123``).

    Capacity resolution order: a column of ``g.edges`` named ``capacity``
    (e.g. pass ``capacity='weight'`` to use the weight column), else the
    edge-attribute side table of that name, else every arc is infinite."""
    e = g.edges
    if capacity in e.columns:
        e = e.select(SRC, DST, F.col(capacity).cast("double").alias("_cap"))
    else:
        attrs = g.edge_attr(capacity)
        if capacity in attrs.columns and attrs.limit(1).count() > 0:
            e = (e.select(SRC, DST)
                 .join(attrs.withColumnRenamed(capacity, "_cap"),
                       [SRC, DST], "left"))
        else:
            e = e.select(SRC, DST, F.lit(None).cast("double").alias("_cap"))
    fwd = (e.filter(F.col(SRC) != F.col(DST))
           .select(SRC, DST, F.coalesce(F.col("_cap").cast("double"),
                                        F.lit(_BIG)).alias("r")))
    if not g.directed:
        fwd = fwd.unionByName(
            fwd.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "r"))
    fwd = (fwd.withColumn("r", F.when(F.col("r") >= _BIG, F.lit(_BIG))
                          .otherwise(F.col("r")))
           .groupBy(SRC, DST)
           .agg(F.least(F.sum("r"), F.lit(_BIG)).alias("r")))
    rev = (fwd.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                      F.lit(0.0).alias("r"))
           .join(fwd.select(SRC, DST), [SRC, DST], "anti"))
    return fwd.unionByName(rev)


def _bfs_pred(res: DataFrame, s, t, runner: SuperstepRunner,
              max_depth: int) -> tuple[dict | None, float]:
    """Level BFS over positive-residual arcs from ``s``.

    Returns ``(path, bottleneck)`` where ``path`` is the list of (u, v)
    arcs of a shortest s→t path (None when t is unreachable) and
    ``bottleneck`` the min residual along it.  Predecessor choice is the
    minimum (pred id) — deterministic at any parallelism."""
    spark = res.sparkSession
    pos = res.filter(F.col("r") > 0)
    id_type = res.schema[SRC].dataType.simpleString()
    visited = runner.cut(spark.createDataFrame(
        [(s, None, None)], f"id {id_type}, pred {id_type}, pr double"))
    frontier = visited.select(ID)
    for _ in range(max_depth):
        step = (frontier.join(pos, frontier[ID] == pos[SRC])
                .groupBy(F.col(DST).alias(ID))
                .agg(F.min_by(F.struct(F.col(SRC).alias("pred"),
                                       F.col("r").alias("pr")),
                              F.col(SRC)).alias("_p"))
                .select(ID, F.col("_p.pred").alias("pred"),
                        F.col("_p.pr").alias("pr")))
        obs = Observation()
        nxt = (step.join(visited.select(ID), ID, "anti")
               .observe(obs, F.count(F.lit(1)).alias("n")))
        nxt = runner.cut(nxt)
        if int(obs.get["n"] or 0) == 0:
            return None, 0.0
        visited = runner.cut(visited.unionByName(nxt))
        hit = nxt.filter(F.col(ID) == F.lit(t)).collect()
        if hit:
            # walk the predecessor chain back on the driver: O(path) one-row
            # lookups, never the vertex table
            path = []
            bottleneck = INF
            cur, pred, pr = hit[0][ID], hit[0]["pred"], hit[0]["pr"]
            while pred is not None:
                path.append((pred, cur))
                bottleneck = min(bottleneck, pr)
                row = visited.filter(F.col(ID) == F.lit(pred)).collect()[0]
                cur, pred, pr = row[ID], row["pred"], row["pr"]
            path.reverse()
            return path, bottleneck
        frontier = nxt.select(ID)
    return None, 0.0


def _solve(g: Graph, s, t, capacity: str, max_depth: int,
           max_augmentations: int) -> tuple[float, DataFrame, DataFrame]:
    """Shared solver: returns (flow_value, final residual arcs, original
    forward capacities)."""
    if not g.has_vertex(s):
        raise KeyError(f"node {s!r} not in graph (reference NodeNotFound)")
    if not g.has_vertex(t):
        raise KeyError(f"node {t!r} not in graph (reference NodeNotFound)")
    if str(s) == str(t):
        raise ValueError("source and sink are the same node "
                         "(reference NetworkXError)")
    spark = g.edges.sparkSession
    runner = SuperstepRunner(None, name="maxflow", keep_scratch=0)
    try:
      with fixed_plan(spark):
        res = runner.cut(_residual_arcs(g, capacity))
        caps = res.filter(F.col("r") > 0)          # original capacities
        caps = runner.cut(caps)
        value = 0.0
        for _ in range(max_augmentations):
            path, b = _bfs_pred(res, s, t, runner, max_depth)
            if path is None:
                return value, res, caps
            if b >= _BIG:
                raise Unbounded(
                    "Infinite capacity path, flow unbounded above "
                    "(reference NetworkXUnbounded)")
            arcs = spark.createDataFrame(
                [(u, v, -float(b)) for u, v in path]
                + [(v, u, float(b)) for u, v in path],
                res.select(SRC, DST, "r").schema)
            delta = arcs.groupBy(SRC, DST).agg(F.sum("r").alias("_d"))
            res = runner.cut(
                res.join(delta, [SRC, DST], "left")
                .select(SRC, DST,
                        (F.col("r") + F.coalesce("_d", F.lit(0.0)))
                        .alias("r")))
            value += float(b)
        raise RuntimeError("max-flow did not terminate within "
                           f"{max_augmentations} augmentations")
    finally:
        runner.close()


def maximum_flow(g: Graph, s, t, capacity: str = "capacity",
                 max_depth: int = 10_000,
                 max_augmentations: int = 1_000_000
                 ) -> tuple[float, DataFrame]:
    """(flow_value, flows) with ``flows`` = (src, dst, flow) per original
    arc — the reference's ``(flow_value, flow_dict)`` (``maxflow.py:20``)
    in edge-table form.  Net flow per arc: f(u,v) = max(c − r, 0)."""
    value, res, caps = _solve(g, s, t, capacity, max_depth,
                              max_augmentations)
    flows = (caps.select(SRC, DST, F.col("r").alias("_c"))
             .join(res.withColumnRenamed("r", "_r"), [SRC, DST])
             .select(SRC, DST,
                     F.greatest(F.col("_c") - F.col("_r"), F.lit(0.0))
                     .alias("flow")))
    return value, flows


def maximum_flow_value(g: Graph, s, t, capacity: str = "capacity",
                       **kw) -> float:
    """``maxflow.py:164``."""
    value, _, _ = _solve(g, s, t, capacity,
                         kw.get("max_depth", 10_000),
                         kw.get("max_augmentations", 1_000_000))
    return value


def minimum_cut(g: Graph, s, t, capacity: str = "capacity",
                max_depth: int = 10_000,
                max_augmentations: int = 1_000_000
                ) -> tuple[float, DataFrame]:
    """(cut_value, partition) — partition is (id, side): side ``'t'`` for
    the vertices that can still REACH ``t`` in the final residual graph,
    ``'s'`` for the complement — exactly the reference's partition
    (``maxflow.py:430-434``: ``non_reachable = shortest_path_length(R,
    target=t)``; source side = everything else), which is the unique
    MAXIMAL source side of a minimum cut."""
    value, res, _ = _solve(g, s, t, capacity, max_depth, max_augmentations)
    spark = g.edges.sparkSession
    # reversed positive-residual arcs: frontier walks predecessors of t
    pos = (res.filter(F.col("r") > 0)
           .select(F.col(DST).alias(ID), F.col(SRC).alias("nbr")).cache())
    id_type = res.schema[SRC].dataType.simpleString()
    runner = SuperstepRunner(None, name="mincut", keep_scratch=0)
    try:
      with fixed_plan(spark):
        visited = runner.cut(
            spark.createDataFrame([(t,)], f"id {id_type}"))
        frontier = visited
        for _ in range(max_depth):
            nxt = (frontier.join(pos, ID)
                   .select(F.col("nbr").alias(ID)).distinct()
                   .join(visited, ID, "anti"))
            nxt = runner.cut(nxt)
            if nxt.limit(1).count() == 0:
                break
            visited = runner.cut(visited.unionByName(nxt))
            frontier = nxt
        part = (g.vertices()
                .join(visited.withColumn("_t", F.lit(1)), ID, "left")
                .select(ID, F.when(F.col("_t").isNotNull(), F.lit("t"))
                        .otherwise(F.lit("s")).alias("side")))
        return value, part
    finally:
        pos.unpersist()
        runner.close()


def minimum_cut_value(g: Graph, s, t, capacity: str = "capacity",
                      **kw) -> float:
    """``maxflow.py:453``."""
    value, _, _ = _solve(g, s, t, capacity,
                         kw.get("max_depth", 10_000),
                         kw.get("max_augmentations", 1_000_000))
    return value


def cut_edges(g: Graph, partition: DataFrame,
              capacity: str = "capacity") -> DataFrame:
    """(src, dst, capacity) of the arcs crossing s→t in ``partition``
    (id, side) — the saturated cut set itself."""
    e = g.edges
    if capacity in e.columns:
        e = e.select(SRC, DST, F.col(capacity).cast("double").alias("_cap"))
    else:
        attrs = g.edge_attr(capacity)
        if capacity in attrs.columns and attrs.limit(1).count() > 0:
            e = (e.select(SRC, DST)
                 .join(attrs.withColumnRenamed(capacity, "_cap"),
                       [SRC, DST], "left"))
        else:
            e = e.select(SRC, DST, F.lit(None).cast("double").alias("_cap"))
    sides = partition.select(ID, "side")
    arcs = e.select(SRC, DST, F.coalesce(F.col("_cap").cast("double"),
                                         F.lit(_BIG)).alias("capacity"))
    if not g.directed:
        arcs = arcs.unionByName(
            arcs.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                        "capacity"))
    return (arcs
            .join(sides.select(F.col(ID).alias(SRC),
                               F.col("side").alias("_su")), SRC)
            .join(sides.select(F.col(ID).alias(DST),
                               F.col("side").alias("_sv")), DST)
            .filter((F.col("_su") == "s") & (F.col("_sv") == "t"))
            .select(SRC, DST, "capacity"))


def gomory_hu_tree(g: Graph, capacity: str = "capacity",
                   max_vertices: int = 64) -> DataFrame:
    """(src, dst, weight) edges of a Gomory–Hu tree — every s-t min-cut
    value in the graph equals the min edge weight on the tree's s-t path
    (reference ``flow/gomory_hu.py:12``, Gusfield's algorithm).

    n−1 sequential :func:`minimum_cut` phases, each a full augmenting-path
    run — inherently phase-sequential, so the composition is capped at
    ``max_vertices`` (the CNM/KL posture); each phase itself runs
    distributed.  Undirected only, like the reference."""
    if g.directed:
        raise ValueError("gomory_hu_tree is undirected-only "
                         "(reference @not_implemented_for('directed'))")
    verts = sorted(r[ID] for r in g.vertices().collect())
    n = len(verts)
    if n > max_vertices:
        raise ValueError(
            f"gomory_hu_tree runs n-1 sequential max-flow phases; {n} "
            f"vertices > max_vertices={max_vertices} — raise the cap "
            "explicitly if the graph is genuinely this small")
    if n == 0:
        raise ValueError("Empty Graph (reference NetworkXError)")
    spark = g.edges.sparkSession
    parent = {v: verts[0] for v in verts[1:]}
    weight = {}
    for v in verts[1:]:
        value, part = minimum_cut(g, v, parent[v], capacity=capacity)
        reach = {r[ID] for r in part.filter("side = 's'").collect()}
        weight[v] = value
        for w in verts[1:]:
            if w != v and w in reach and parent[w] == parent[v]:
                parent[w] = v
        # Gusfield update for the grandparent hop
        p = parent[v]
        if p != verts[0] and parent[p] in reach:
            parent[v] = parent[p]
            parent[p] = v
            weight[v] = weight.get(p, value)
            weight[p] = value
    rows = [(v, parent[v], float(weight[v])) for v in verts[1:]]
    id_type = g.edges.schema[SRC].dataType.simpleString()
    return spark.createDataFrame(
        rows, f"src {id_type}, dst {id_type}, weight double")

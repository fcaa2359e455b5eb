"""k-core decomposition by distributed peeling.

Reference ``core_number`` (``networkx/algorithms/core.py:46-115``) is the
sequential Batagelj–Zaveršnik bin sort; the distributed equivalent peels:
repeatedly delete vertices of degree < k until stable — the k-core.  Core
numbers come from ascending peels: vertices present in the k-core but not
the (k+1)-core have core number k.  Two scale tricks keep the job count
down:

* the edge-count fixpoint test rides the lineage-cut write as an observed
  metric (no separate count job per round),
* after each level stabilizes, ``k`` jumps straight to ``min_degree + 1``
  of the surviving graph — all survivors have core ≥ min_degree, so the
  in-between levels are no-op peels that would each still cost a full
  round of jobs (a dense graph's first jump alone skips dozens).

Self-loops are rejected like the reference (``core.py:91-96``); directed
degree = in+out (``core.py:71-72``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner


def _peel(e: DataFrame, k: int, runner: SuperstepRunner,
          n_edges: int, max_rounds: int = 10_000
          ) -> tuple[DataFrame, int, DataFrame | None]:
    """Edges of the k-core: drop vertices with (total) degree < k to a
    fixpoint.  Each round is one job (degree agg + two semi-joins + cut
    with an observed edge count).  Returns (edges, n_edges, fixpoint
    degree table or None when the core is empty)."""
    for _ in range(max_rounds):
        deg = (e.select(F.col(SRC).alias(ID)).union(e.select(F.col(DST).alias(ID)))
               .groupBy(ID).agg(F.count("*").alias("deg")))
        keep = deg.filter(F.col("deg") >= k).select(ID)
        obs = Observation()
        e2 = (e.join(keep.withColumnRenamed(ID, SRC), SRC, "semi")
              .join(keep.withColumnRenamed(ID, DST), DST, "semi")
              .observe(obs, F.count(F.lit(1)).alias("m")))
        e2 = runner.cut(e2)
        n2 = int(obs.get["m"])
        if n2 == n_edges:
            # fixpoint: `deg` computed from e == e2 is the final degrees
            return e2, n2, deg
        e, n_edges = e2, n2
        if n2 == 0:
            return e2, 0, None
    raise RuntimeError("k-core peeling did not converge")


def k_core(g: Graph, k: int) -> Graph:
    """The maximal subgraph with all degrees ≥ k (``core.py:120+``)."""
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("k-core is not defined for graphs with self-loops "
                         "(reference raises NetworkXNotImplemented)")
    runner = SuperstepRunner(None, name="kcore", keep_scratch=0)
    try:
        e, _, _ = _peel(g.edges, k, runner, g.edges.count())
        return Graph(e, directed=g.directed)
    finally:
        runner.close()


def core_number(g: Graph, max_k: int = 10_000) -> DataFrame:
    """(id, core) for every vertex (isolated vertices → 0)."""
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("core_number is not defined for graphs with self-loops")
    runner = SuperstepRunner(None, name="core_number", keep_scratch=0)
    try:
        result = runner.cut(g.vertices().select(ID, F.lit(0).alias("core")))
        e, n = g.edges, g.edges.count()
        k = 1
        while k <= max_k and n > 0:
            e, n, deg = _peel(e, k, runner, n)
            if n == 0:
                break
            # every survivor has degree ≥ min_deg, hence core ≥ min_deg:
            # record that level and jump the in-between no-op peels
            min_deg = int(deg.agg(F.min("deg")).collect()[0][0])
            members = (e.select(F.col(SRC).alias(ID))
                       .union(e.select(F.col(DST).alias(ID))).distinct()
                       .withColumn("_k", F.lit(min_deg)))
            result = runner.cut(
                result.join(members, ID, "left")
                .select(ID, F.coalesce("_k", "core").alias("core")))
            k = min_deg + 1
        return result
    finally:
        runner.close()


def k_truss(g: Graph, k: int, max_rounds: int = 10_000) -> Graph:
    """The k-truss: maximal subgraph where every edge is incident to at
    least ``k − 2`` triangles (reference ``core.py:472``, the Cohen-2005
    definition); isolated vertices are dropped from the result like the
    reference's final ``remove_nodes_from(isolates)``.

    Distributed peeling: each round recomputes per-edge triangle support
    from the degree-ordered wedge closure (:func:`~networkx_spark
    .algorithms.triangles.triangle_corners` — Σd_out² bounded) and drops
    under-supported edges; rounds repeat to fixpoint with the surviving
    edge count observed on the lineage-cut write.  Raises on directed
    input and self-loops like the reference (``core.py:493,523-528``).
    """
    from networkx_spark.algorithms.triangles import triangle_corners

    if g.directed:
        raise ValueError("k_truss is not implemented for directed graphs "
                         "(reference raises NetworkXNotImplemented)")
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("Input graph has self loops which is not permitted "
                         "(reference raises NetworkXNotImplemented)")
    runner = SuperstepRunner(None, name="ktruss")
    e = g.edges.select(SRC, DST)
    m = e.count()
    try:
        for _ in range(max_rounds):
            if m == 0:
                break
            tri = triangle_corners(Graph(e, directed=False))
            sides = tri.select(F.col("a").alias("u"), F.col("b").alias("v")) \
                .unionByName(tri.select(F.col("a").alias("u"), F.col("c").alias("v"))) \
                .unionByName(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            support = (sides.select(F.least("u", "v").alias(SRC),
                                    F.greatest("u", "v").alias(DST))
                       .groupBy(SRC, DST).agg(F.count("*").alias("_sup")))
            obs = Observation()
            e2 = (e.join(support, [SRC, DST], "left")
                  .filter(F.coalesce("_sup", F.lit(0)) >= k - 2)
                  .select(SRC, DST)
                  .observe(obs, F.count(F.lit(1)).alias("m")))
            e2 = runner.cut(e2)
            m2 = int(obs.get["m"])
            if m2 == m:
                return Graph(e2, directed=False)
            e, m = e2, m2
        if m == 0:
            spark = g.edges.sparkSession
            empty = spark.createDataFrame([], g.edges.select(SRC, DST).schema)
            return Graph(empty, directed=False)
        raise RuntimeError("k-truss peeling did not converge")
    finally:
        runner.close()


def _core_members(g: Graph, k: int | None, cn: DataFrame | None
                  ) -> tuple[DataFrame, int]:
    """(core-number table, resolved k) — k defaults to the max core
    (``core.py:124-149``)."""
    if cn is None:
        cn = core_number(g)
    if k is None:
        k = int(cn.agg(F.max("core")).collect()[0][0])
    return cn, k


def k_shell(g: Graph, k: int | None = None,
            cn: DataFrame | None = None) -> Graph:
    """Subgraph induced by nodes with core number exactly ``k``
    (``core.py:228``; default k = max core)."""
    cn, k = _core_members(g, k, cn)
    return g.subgraph(cn.filter(F.col("core") == k).select(ID))


def k_crust(g: Graph, k: int | None = None,
            cn: DataFrame | None = None) -> Graph:
    """Subgraph induced by nodes with core number ≤ ``k``
    (``core.py:310-389``; default k = max core − 1)."""
    if cn is None:
        cn = core_number(g)
    if k is None:
        k = int(cn.agg(F.max("core")).collect()[0][0]) - 1
    return g.subgraph(cn.filter(F.col("core") <= k).select(ID))


def k_corona(g: Graph, k: int, cn: DataFrame | None = None) -> Graph:
    """Subgraph of the k-core's members having EXACTLY ``k`` neighbors in
    the k-core (``core.py:393-466``: ``c[v] == k and k == #{w ∈ G[v] :
    c[w] ≥ k}``)."""
    cn, k = _core_members(g, k, cn)
    members = cn.filter(F.col("core") == k).select(ID)
    in_core = cn.filter(F.col("core") >= k).select(ID)
    adj = (g.symmetrized()
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")))
    cnt = (adj.join(members, ID, "semi")
           .join(in_core.withColumnRenamed(ID, "nbr"), "nbr", "semi")
           .groupBy(ID).agg(F.count("*").alias("_c")))
    keep = (members.join(cnt, ID, "left")
            .filter(F.coalesce("_c", F.lit(0)) == k).select(ID))
    return g.subgraph(keep)


def onion_layers(g: Graph, max_rounds: int = 100_000) -> DataFrame:
    """(id, layer) — the onion decomposition (``core.py:554-640``):
    repeated simultaneous removal of all minimum-degree vertices; each
    removal round is one layer.  Isolated vertices form layer 1
    (``:618-624``).  Undirected simple graphs without self-loops only.

    Distributed peeling identical to :func:`core_number`'s inner loop but
    with a per-round layer stamp: each round finds the current threshold
    ``current_core = max(current_core, min alive degree)``, removes every
    vertex at or below it, and stamps the removed set with the round's
    layer index.  One job per round (degree agg + stamp + cut with an
    observed survivor count)."""
    if g.directed:
        raise ValueError("onion_layers is not implemented for directed "
                         "graphs (reference raises NetworkXNotImplemented)")
    if g.selfloops().limit(1).count() > 0:
        raise ValueError("onion_layers is not defined for graphs with "
                         "self-loops (reference raises)")
    runner = SuperstepRunner(None, name="onion", keep_scratch=0)
    try:
        spark = g.edges.sparkSession
        result = spark.createDataFrame([], "id long, layer int")
        layer = 1
        iso = g.isolates()
        if iso.limit(1).count() > 0:
            result = iso.select(ID, F.lit(1).alias("layer"))
            layer = 2
        e = g.edges.select(SRC, DST)
        # alive set tracked explicitly: a vertex whose neighbors all got
        # removed keeps an entry at degree 0 (the reference's `degrees`
        # dict, ``core.py:615``) and is stamped in a later layer — the
        # edge table alone would lose it silently
        alive = runner.cut(g.vertices().join(iso, ID, "anti"))
        n_alive = alive.count()
        current_core = 1
        while n_alive > 0 and layer < max_rounds:
            edeg = (e.select(F.col(SRC).alias(ID))
                    .union(e.select(F.col(DST).alias(ID)))
                    .groupBy(ID).agg(F.count("*").alias("deg")))
            deg = (alive.join(edeg, ID, "left")
                   .select(ID, F.coalesce("deg", F.lit(0)).alias("deg"))).cache()
            min_deg = int(deg.agg(F.min("deg")).collect()[0][0])
            current_core = max(current_core, min_deg)
            gone = deg.filter(F.col("deg") <= current_core).select(ID)
            result = runner.cut(result.unionByName(
                gone.select(ID, F.lit(layer).alias("layer"))))
            keep = deg.filter(F.col("deg") > current_core).select(ID)
            obs = Observation()
            alive = (keep.observe(obs, F.count(F.lit(1)).alias("n")))
            alive = runner.cut(alive)
            n_alive = int(obs.get["n"])
            e = runner.cut(
                e.join(keep.withColumnRenamed(ID, SRC), SRC, "semi")
                 .join(keep.withColumnRenamed(ID, DST), DST, "semi"))
            deg.unpersist()
            layer += 1
        return result
    finally:
        runner.close()

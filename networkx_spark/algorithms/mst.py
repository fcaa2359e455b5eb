"""Minimum spanning forest via distributed Borůvka.

The reference computes MSTs with sequential Kruskal/Prim/Borůvka over a
union-find (``networkx/algorithms/tree/mst.py:372`` ``minimum_spanning_edges``,
``:46`` ``boruvka_mst_edges``, ``:560`` ``minimum_spanning_tree``).  The
distributed equivalent here is classic Borůvka:

* every vertex starts as its own component,
* each round every component picks its minimum-weight outgoing edge
  (one ``groupBy(component).min(struct)`` — map-side combinable, the
  only data-sized shuffle per round),
* the picked edges join the forest and the components they connect are
  contracted by pointer jumping (the pointer graph "component → component
  at the far end of its min edge" has only 2-cycles under a strict total
  edge order, so breaking mutual pairs leaves rooted trees that collapse
  in O(log) halving steps over a components-sized — not edges-sized —
  table).

Rounds needed: ≤ log2(n) (each live component merges with at least one
other every round).  Ties are broken by the lexicographic order
``(weight, src, dst)`` — a strict total order over canonical undirected
edges, so the result is deterministic and, when all weights are distinct,
exactly the reference's unique MSF.

Directed input is rejected like the reference
(``@not_implemented_for("directed")``, ``tree/mst.py:370``); self-loops can
never join a spanning forest and are dropped up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan

_COMP, _CAND = "comp", "cand"


def _contract(parent: DataFrame, runner: SuperstepRunner,
              max_jumps: int = 64) -> DataFrame:
    """Collapse the min-edge pointer graph to roots.

    ``parent(comp, parent)`` has one row per live component.  Mutual pairs
    (the only cycles — see module docstring) are broken by rooting the
    smaller id, then pointer jumping ``parent ← parent[parent]`` until no
    row changes (observed on the lineage-cut write: one job per jump)."""
    p2 = parent.select(F.col(_COMP).alias("_p"), F.col("parent").alias("_gp"))
    parent = (parent.join(p2, parent["parent"] == p2["_p"])
              .select(_COMP,
                      F.when((F.col("_gp") == F.col(_COMP))
                             & (F.col(_COMP) < F.col("parent")), F.col(_COMP))
                      .otherwise(F.col("parent")).alias("parent")))
    parent = runner.cut(parent)
    for _ in range(max_jumps):
        p2 = parent.select(F.col(_COMP).alias("_p"), F.col("parent").alias("_gp"))
        obs = Observation()
        nxt = (parent.join(p2, parent["parent"] == p2["_p"])
               .select(_COMP, F.col("_gp").alias("parent"),
                       (F.col("_gp") != F.col("parent")).cast("long").alias("_chg"))
               .observe(obs, F.sum("_chg").alias("chg")).drop("_chg"))
        nxt = runner.cut(nxt)
        if int(obs.get["chg"] or 0) == 0:
            return nxt
        parent = nxt
    raise RuntimeError("Borůvka pointer jumping did not converge")


def minimum_spanning_edges(g: Graph, maximum: bool = False,
                           max_rounds: int = 64) -> DataFrame:
    """``(src, dst, weight)`` rows of the minimum (or maximum) spanning
    forest of an undirected weighted graph (``tree/mst.py:372,467``)."""
    if g.directed:
        raise ValueError("minimum_spanning_edges is not implemented for "
                         "directed graphs (reference raises "
                         "NetworkXNotImplemented, tree/mst.py:370)")
    spark = g.edges.sparkSession
    e = g.edges.filter(F.col(SRC) != F.col(DST)).select(SRC, DST, WEIGHT)
    # strict total order per candidate: (±weight, src, dst); `other` rides
    # along so the winning edge also names the component to merge into
    sort_w = (-F.col(WEIGHT)) if maximum else F.col(WEIGHT)
    # keep_scratch=0: the forest/comp snapshots from round k are re-read in
    # round k+1 after several intermediate cuts (minedge, pointer jumps),
    # so rotation would delete live files; snapshots are O(V) each over
    # <= max_rounds rounds, freed at close()
    runner = SuperstepRunner(None, name="boruvka", keep_scratch=0)
    forest = spark.createDataFrame([], e.schema)
    comp = g.vertices().select(ID, F.col(ID).alias(_COMP))
    try:
      with fixed_plan(spark):
        comp = runner.cut(comp)
        for _ in range(max_rounds):
            csrc = comp.select(F.col(ID).alias(SRC), F.col(_COMP).alias("_cs"))
            cdst = comp.select(F.col(ID).alias(DST), F.col(_COMP).alias("_cd"))
            lab = (e.join(csrc, SRC).join(cdst, DST)
                   .filter(F.col("_cs") != F.col("_cd")))
            both = lab.select(
                F.col("_cs").alias(_COMP),
                F.struct(sort_w.alias("w"), F.col(SRC), F.col(DST),
                         F.col(WEIGHT), F.col("_cd").alias("other")).alias(_CAND)
            ).unionByName(lab.select(
                F.col("_cd").alias(_COMP),
                F.struct(sort_w.alias("w"), F.col(SRC), F.col(DST),
                         F.col(WEIGHT), F.col("_cs").alias("other")).alias(_CAND)))
            obs = Observation()
            minedge = (both.groupBy(_COMP).agg(F.min(_CAND).alias("m"))
                       .observe(obs, F.count(F.lit(1)).alias("n")))
            minedge = runner.cut(minedge)
            if int(obs.get["n"] or 0) == 0:
                return forest          # no cross-component edges left
            chosen = (minedge.select(F.col("m.src").alias(SRC),
                                     F.col("m.dst").alias(DST),
                                     F.col(f"m.{WEIGHT}").alias(WEIGHT))
                      .distinct())      # both endpoints may pick one edge
            forest = runner.cut(forest.unionByName(chosen))
            root = _contract(
                minedge.select(_COMP, F.col("m.other").alias("parent")), runner)
            comp = runner.cut(
                comp.join(root, _COMP, "left")
                .select(ID, F.coalesce("parent", _COMP).alias(_COMP)))
        raise RuntimeError(f"Borůvka did not finish in {max_rounds} rounds")
    finally:
        runner.close()


def minimum_spanning_tree(g: Graph) -> Graph:
    """The minimum spanning forest as a Graph; isolated vertices survive
    like the reference's ``minimum_spanning_tree`` (``tree/mst.py:560``,
    which copies all nodes into the result)."""
    return Graph(minimum_spanning_edges(g), directed=False,
                 vertices=g.vertices())


def maximum_spanning_edges(g: Graph) -> DataFrame:
    """``tree/mst.py:467`` — same forest problem under reversed order."""
    return minimum_spanning_edges(g, maximum=True)


def maximum_spanning_tree(g: Graph) -> Graph:
    """``tree/mst.py:684``."""
    return Graph(maximum_spanning_edges(g), directed=False,
                 vertices=g.vertices())


def maximal_matching(g: Graph, max_rounds: int = 200) -> DataFrame:
    """A maximal matching as ``(src, dst)`` rows.

    The reference greedily scans edges in iteration order
    (``networkx/algorithms/matching.py:21``); *any* maximal matching is a
    valid answer (checked by ``is_maximal_matching``, ``matching.py:147``).
    The distributed equivalent is deterministic local dominance: each
    round an edge joins the matching iff its hash priority is the strict
    minimum among all edges sharing either endpoint (computed with one
    per-vertex min aggregation), then all edges touching newly matched
    vertices are dropped; repeat to an empty edge set.  Priorities are
    distinct with overwhelming probability (xxhash64 of the canonical
    pair), making each round's winner set well-defined and non-empty, so
    the loop terminates in O(log m) expected rounds."""
    if g.directed:
        raise ValueError("maximal_matching is not implemented for directed "
                         "graphs (reference matchings are undirected)")
    runner = SuperstepRunner(None, name="matching", keep_scratch=0)
    spark = g.edges.sparkSession
    e = (g.edges.filter(F.col(SRC) != F.col(DST))
         .select(SRC, DST, F.xxhash64(SRC, DST).alias("_pri")))
    matched = spark.createDataFrame([], e.select(SRC, DST).schema)
    try:
      with fixed_plan(spark):
        e = runner.cut(e)
        for _ in range(max_rounds):
            vmin = (e.select(F.col(SRC).alias(ID), "_pri")
                    .union(e.select(F.col(DST).alias(ID), "_pri"))
                    .groupBy(ID).agg(F.min("_pri").alias("_vm")))
            win = (e.join(vmin.withColumnRenamed(ID, SRC)
                          .withColumnRenamed("_vm", "_vs"), SRC)
                   .join(vmin.withColumnRenamed(ID, DST)
                         .withColumnRenamed("_vm", "_vd"), DST)
                   .filter((F.col("_pri") == F.col("_vs"))
                           & (F.col("_pri") == F.col("_vd")))
                   .select(SRC, DST))
            matched = runner.cut(matched.unionByName(win))
            used = (matched.select(F.col(SRC).alias(ID))
                    .union(matched.select(F.col(DST).alias(ID))))
            obs = Observation()
            e = runner.cut(
                e.join(used.withColumnRenamed(ID, SRC), SRC, "anti")
                 .join(used.withColumnRenamed(ID, DST), DST, "anti")
                 .observe(obs, F.count(F.lit(1)).alias("m")))
            if int(obs.get["m"] or 0) == 0:
                return matched
        raise RuntimeError("maximal_matching did not converge")
    finally:
        runner.close()


def min_vertex_cover_approx(g: Graph, max_rounds: int = 200) -> DataFrame:
    """(id): a ≤2-approximate minimum vertex cover — both endpoints of a
    maximal matching (the textbook Gavril/Yannakakis bound the reference
    ships as ``approximation/vertex_cover.py:34``,
    ``min_weighted_vertex_cover`` with unit weights).  Rides the
    distributed local-dominance matching; one extra projection."""
    m = maximal_matching(g, max_rounds=max_rounds)
    return (m.select(F.col(SRC).alias(ID))
            .unionByName(m.select(F.col(DST).alias(ID)))
            .distinct())

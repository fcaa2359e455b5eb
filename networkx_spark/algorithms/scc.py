"""Strongly connected components, distributed.

Reference: ``networkx/algorithms/components/strongly_connected.py:17``
(Tarjan with nonrecursive bookkeeping) — inherently sequential DFS, so the
distributed plan is the classic **trim + forward-backward coloring**
(Orzan; also the FW-BW-Trim family):

1. **trim** — peel vertices with zero in- or out-degree within the
   remaining subgraph; each is its own (trivial) SCC.  Web graphs are
   mostly trivial SCCs around one giant core, so trimming removes the
   bulk before any reachability work.
2. **forward max-coloring** — ``color[v] = max id that reaches v``,
   propagated along edges to fixpoint (superstep joins; the change count
   rides the cut write as an Observation).
3. **backward sweep** — for every root (``color == id``), walk reverse
   edges *within the root's color class*; everything reached is exactly
   the root's SCC (members = forward-reached ∩ backward-reached).
4. remove found SCCs, repeat — every iteration resolves one SCC per
   color class (many in parallel).

Labels are the component's maximum vertex id (the coloring root) —
components compare exactly up to relabeling, like the reference's sets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan, tuned_partitions


def strongly_connected_components(g: Graph, max_outer: int = 10_000) -> DataFrame:
    """(id, component) — component = max vertex id of the SCC.

    Directed graphs only, like the reference
    (``@not_implemented_for("undirected")``, ``strongly_connected.py:14``).
    """
    if not g.directed:
        raise ValueError("strongly_connected_components is not defined for "
                         "undirected graphs (reference raises NetworkXNotImplemented)")
    spark = g.edges.sparkSession
    # keep_scratch=0: assigned-component parts accumulate until the final union
    runner = SuperstepRunner(None, name="scc", keep_scratch=0)
    n = g.number_of_vertices()
    parts: list[DataFrame] = []
    verts = runner.cut(g.vertices())
    edges = runner.cut(g.edges.select(SRC, DST))
    try:
      with tuned_partitions(spark, n), fixed_plan(spark):
        for _ in range(max_outer):
            # ---- trim trivial SCCs (no in- or no out-edge) to a fixpoint
            while True:
                ins = edges.select(F.col(DST).alias(ID)).distinct()
                outs = edges.select(F.col(SRC).alias(ID)).distinct()
                core = verts.join(ins, ID, "semi").join(outs, ID, "semi")
                obs = Observation()
                trimmed = runner.cut(
                    verts.join(core, ID, "anti")
                    .select(ID, F.col(ID).alias("component"))
                    .observe(obs, F.count(F.lit(1)).alias("c")))
                if int(obs.get["c"]) == 0:
                    break
                parts.append(trimmed)
                verts = runner.cut(verts.join(trimmed.select(ID), ID, "anti"))
                edges = runner.cut(
                    edges.join(verts.withColumnRenamed(ID, SRC), SRC, "semi")
                    .join(verts.withColumnRenamed(ID, DST), DST, "semi"))
            if verts.limit(1).count() == 0:
                break
            # ---- forward max-coloring to fixpoint
            color = runner.cut(verts.select(ID, F.col(ID).alias("color")))
            while True:
                push = (color.join(edges, color[ID] == edges[SRC])
                        .groupBy(F.col(DST).alias(ID))
                        .agg(F.max("color").alias("_pc")))
                obs = Observation()
                new = (color.join(push, ID, "left")
                       .select(ID, F.greatest("color", F.coalesce("_pc", "color"))
                               .alias("color"), F.col("color").alias("_old"))
                       .observe(obs, F.sum((F.col("color") != F.col("_old"))
                                           .cast("long")).alias("chg")))
                color = runner.cut(new.drop("_old"))
                if int(obs.get["chg"] or 0) == 0:
                    break
            # ---- backward reach from roots within each color class
            reached = runner.cut(color.filter(F.col("color") == F.col(ID))
                                 .select(ID, F.col("color").alias("component")))
            frontier = reached
            while True:
                preds = (frontier.join(edges, frontier[ID] == edges[DST])
                         .select(F.col(SRC).alias(ID), "component").distinct())
                cand = (preds.join(color, [ID])
                        .filter(F.col("color") == F.col("component"))
                        .select(ID, "component"))
                obs = Observation()
                frontier = runner.cut(
                    cand.join(reached.select(ID), ID, "anti")
                    .observe(obs, F.count(F.lit(1)).alias("c")))
                if int(obs.get["c"]) == 0:
                    break
                reached = runner.cut(reached.unionByName(frontier))
            parts.append(reached)
            verts = runner.cut(verts.join(reached.select(ID), ID, "anti"))
            edges = runner.cut(
                edges.join(verts.withColumnRenamed(ID, SRC), SRC, "semi")
                .join(verts.withColumnRenamed(ID, DST), DST, "semi"))
            if verts.limit(1).count() == 0:
                break
        if not parts:
            return spark.createDataFrame([], g.vertices().select(
                ID, F.col(ID).alias("component")).schema)
        return reduce(DataFrame.unionByName, parts)
    finally:
        runner.close()


def number_strongly_connected_components(g: Graph) -> int:
    """Reference ``strongly_connected.py:113``."""
    return (strongly_connected_components(g)
            .select("component").distinct().count())


def is_strongly_connected(g: Graph) -> bool:
    """Reference ``strongly_connected.py:152``; raises on the empty graph."""
    if g.number_of_vertices() == 0:
        raise ValueError("connectivity is undefined for the null graph "
                         "(reference: NetworkXPointlessConcept)")
    return number_strongly_connected_components(g) == 1


def condensation(g: Graph) -> tuple[DataFrame, Graph]:
    """(membership(id, component), DAG of components) —
    ``strongly_connected.py:188``: edges between distinct components,
    deduplicated."""
    comp = strongly_connected_components(g).cache()
    e = (g.edges
         .join(comp.select(F.col(ID).alias(SRC), F.col("component").alias("_cs")), SRC)
         .join(comp.select(F.col(ID).alias(DST), F.col("component").alias("_cd")), DST)
         .filter(F.col("_cs") != F.col("_cd"))
         .select(F.col("_cs").alias(SRC), F.col("_cd").alias(DST))
         .distinct())
    return comp, Graph.from_edges(e, directed=True,
                                  vertices=comp.select(F.col("component").alias(ID))
                                  .distinct())


def flow_hierarchy(g: Graph, weighted: bool = False) -> float:
    """Fraction of edges not participating in any cycle (reference
    ``networkx/algorithms/hierarchy.py:11`` ``flow_hierarchy``): an edge
    lies on a cycle iff both endpoints share an SCC, so the measure is
    one SCC run plus a single double-join aggregate.  ``weighted``
    weighs each edge by its ``weight`` column (the reference's
    ``weight=`` attribute lookup); directed only, multigraph parallel
    edges each count, like the reference."""
    if not g.directed:
        raise ValueError("flow_hierarchy not defined for undirected graphs "
                         "(reference raises NetworkXError)")
    comp = strongly_connected_components(g)
    w = F.col("weight") if weighted else F.lit(1.0)
    tagged = (g.edges
              .join(comp.select(F.col(ID).alias(SRC),
                                F.col("component").alias("_cs")), SRC)
              .join(comp.select(F.col(ID).alias(DST),
                                F.col("component").alias("_cd")), DST))
    row = tagged.agg(
        F.sum(F.when(F.col("_cs") != F.col("_cd"), w).otherwise(F.lit(0.0)))
        .alias("acyclic"),
        F.sum(w).alias("total")).collect()[0]
    total = float(row["total"] or 0.0)
    if total == 0.0:
        raise ValueError("flow_hierarchy undefined for the empty graph "
                         "(reference ZeroDivisionError)")
    return float(row["acyclic"] or 0.0) / total

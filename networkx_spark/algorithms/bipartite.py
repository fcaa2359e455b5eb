"""Bipartite detection and two-coloring.

Reference ``networkx/algorithms/bipartite/basic.py:21`` (``color``): BFS
two-coloring, root colored 1, alternating; a same-color edge raises
"Graph is not bipartite."; directed graphs traverse predecessors AND
successors (``basic.py:56-60``), i.e. the symmetrized adjacency; isolates
are colored 0 (``basic.py:81``).  ``is_bipartite`` (``basic.py:87``)
wraps it in a try/except; ``sets`` (``basic.py:115``) additionally
requires the graph to be connected, else ``AmbiguousSolution``.

Spark shape: hash-min connected components pick one deterministic root
per component (the minimum vertex id — the reference's root is its
first-seen node, an iteration-order artifact; any root yields the same
color *partition* on a bipartite component), then ONE batched BFS from
all roots simultaneously assigns ``1 - (dist % 2)``.  State is O(V)
(one row per vertex), supersteps = max component diameter.  The conflict
check is a single join of the symmetrized edge table against the color
table — no driver-side traversal anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan
from networkx_spark.algorithms.components import _hash_min


class NotBipartite(ValueError):
    """Reference ``NetworkXError("Graph is not bipartite.")``."""


def _parity_colors(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, color) for every non-isolated vertex: BFS-tree parity from the
    min-id root of each component, root color 1 (``basic.py:69``).  Does
    NOT validate bipartiteness — callers join the edge table for that."""
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = g.symmetrized().filter(F.col(SRC) != F.col(DST))
    adj = (sym.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
           .distinct().repartition(n_part, ID).cache())
    comp = _hash_min(g.vertices(), g.edges, max_iter, None, 1, False,
                     None, 16)
    roots = (comp.filter(F.col(ID) == F.col("component")).select(ID)
             .join(adj.select(ID).distinct(), ID, "semi"))
    runner = SuperstepRunner(None, name="bipartite", keep_scratch=2)
    try:
      with fixed_plan(spark):
        # state carries the BFS level so (a) the frontier is exactly the
        # newest level (not every vertex of the same parity — older levels
        # have no unvisited neighbors, but re-expanding them re-joins the
        # whole visited set each superstep) and (b) termination observes
        # rows AT the new level only.  Observing "rows with the current
        # parity color" over the cumulative state never reaches zero once
        # both parities exist — that bug made this loop run all max_iter
        # supersteps.
        state = runner.cut(roots.select(ID, F.lit(1).alias("color"),
                                        F.lit(0).alias("_lvl")))
        for lvl in range(1, max_iter):
            frontier = state.filter(F.col("_lvl") == lvl - 1)
            nxt = (frontier.join(adj, ID)
                   .select(F.col("nbr").alias(ID)).distinct()
                   .join(state.select(ID), ID, "anti")
                   .select(ID, F.lit(1 - lvl % 2).alias("color"),
                           F.lit(lvl).alias("_lvl")))
            obs = Observation()
            state = runner.cut(
                state.unionByName(nxt)
                .observe(obs, F.sum(F.when(F.col("_lvl") == lvl, 1)
                                    .otherwise(0)).alias("n")))
            if int(obs.get["n"] or 0) == 0:
                break
        return state.select(ID, "color")
    finally:
        adj.unpersist()
        runner.close()


def bipartite_color(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, color) two-coloring of every vertex, isolates colored 0
    (``basic.py:21-82``).  Raises :class:`NotBipartite` when any edge
    joins two same-colored vertices."""
    colors = _parity_colors(g, max_iter)
    sym = g.symmetrized().filter(F.col(SRC) != F.col(DST))
    conflicts = (sym.join(colors.withColumnRenamed(ID, SRC)
                          .withColumnRenamed("color", "_cs"), SRC)
                 .join(colors.withColumnRenamed(ID, DST)
                       .withColumnRenamed("color", "_cd"), DST)
                 .filter(F.col("_cs") == F.col("_cd")))
    # self-loops are same-color by definition — the reference raises on
    # them too (v is its own neighbor with color[v] == color[v])
    loops = g.edges.filter(F.col(SRC) == F.col(DST))
    if conflicts.limit(1).count() or loops.limit(1).count():
        raise NotBipartite("Graph is not bipartite. (reference NetworkXError)")
    return (g.vertices().join(colors, ID, "left")
            .select(ID, F.coalesce("color", F.lit(0)).alias("color")))


def is_bipartite(g: Graph) -> bool:
    """Reference ``basic.py:87-113``."""
    try:
        bipartite_color(g)
        return True
    except NotBipartite:
        return False


def bipartite_sets(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, color) restricted to a CONNECTED bipartite graph — the
    reference's ``sets`` (``basic.py:115-178``) raises
    ``AmbiguousSolution`` on disconnected input because the bipartition
    is not unique across components."""
    colors = bipartite_color(g, max_iter)
    n_comp = (_hash_min(g.vertices(), g.edges, max_iter, None, 1, False,
                        None, 16)
              .select("component").distinct().count())
    if n_comp > 1:
        raise ValueError("Disconnected graph: ambiguous solution for "
                         "bipartite sets. (reference AmbiguousSolution)")
    return colors


def projection_weights(g: Graph, nodes: DataFrame) -> DataFrame:
    """(u, v, shared, jaccard) for u < v in ``nodes(id)`` sharing at least
    one neighbor: the weight table behind every bipartite projection
    flavour.  Reference ``bipartite/projection.py:12`` (``projected_graph``
    — unweighted pair existence), ``:100`` (``weighted_projected_graph`` —
    shared-neighbor counts), ``:255`` (``overlap_weighted_projected_graph``
    — Jaccard over neighborhoods).

    One wedge join through the shared neighbor (the same shuffle class as
    triangle counting: partials combine map-side, the shuffle key is the
    pair), plus a degree join for the Jaccard denominator.  The wedge
    fan-out is Σ_n deg(n)² over the OTHER side — the projection's inherent
    cost (hub neighbors are the classic skew source; cap or salt hubs
    upstream if the other side has 10^6-degree vertices)."""
    side = F.broadcast(nodes.select(ID).distinct())
    adj = (g.symmetrized().select(F.col(SRC).alias(ID), F.col(DST).alias("n"))
           .filter(F.col(ID) != F.col("n")).distinct()
           .join(side, ID))
    deg = adj.groupBy(ID).agg(F.count("*").alias("deg"))
    a = adj.select(F.col(ID).alias("u"), "n")
    b = adj.select(F.col(ID).alias("v"), "n")
    shared = (a.join(b, "n").filter(F.col("u") < F.col("v"))
              .groupBy("u", "v").agg(F.count("*").alias("shared")))
    du = deg.select(F.col(ID).alias("u"), F.col("deg").alias("_du"))
    dv = deg.select(F.col(ID).alias("v"), F.col("deg").alias("_dv"))
    return (shared.join(du, "u").join(dv, "v")
            .select("u", "v", "shared",
                    F.round(F.col("shared")
                            / (F.col("_du") + F.col("_dv") - F.col("shared")), 6)
                    .alias("jaccard")))


def projected_graph(g: Graph, nodes: DataFrame) -> Graph:
    """Unweighted projection onto ``nodes`` (``projection.py:12``)."""
    w = projection_weights(g, nodes)
    return Graph.from_edges(
        w.select(F.col("u").alias(SRC), F.col("v").alias(DST)),
        directed=False)


def weighted_projected_graph(g: Graph, nodes: DataFrame) -> Graph:
    """Shared-neighbor-weighted projection (``projection.py:100``)."""
    w = projection_weights(g, nodes)
    return Graph.from_edges(
        w.select(F.col("u").alias(SRC), F.col("v").alias(DST),
                 F.col("shared").cast("double").alias("weight")),
        directed=False, weight="weight")

"""Edge-list / adjacency-list text I/O.

Reference: ``networkx/readwrite/edgelist.py`` (``read_edgelist`` ``:302``,
``write_edgelist`` ``:127``) and ``networkx/readwrite/adjlist.py``
(``read_adjlist`` ``:228``, ``write_adjlist`` ``:90``).  SNAP-style edge
files are the first thing a user with a downloaded graph reaches for; the
Spark expression is a text scan + JVM-side split (no Python in the parse
path), so a 100 TB edge file parses with full scan parallelism and
predicate pushdown on the resulting columns.

Differences from the reference, by design:

* comments (default ``#``) and blank lines are skipped, like the
  reference's ``decode + lstrip`` loop (``edgelist.py:198-204``),
* node ids stay strings (the reference applies ``nodetype``; casting is a
  one-line ``.withColumn`` for the caller),
* writes produce a DIRECTORY of part files (Spark's contract), one line
  per edge/vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID


def read_edgelist(spark: SparkSession, path: str, comments: str = "#",
                  delimiter: str | None = None, directed: bool = False,
                  weighted: bool = False) -> Graph:
    """Parse ``src dst [weight]`` lines into a :class:`Graph`
    (``edgelist.py:302``; ``read_weighted_edgelist`` ``:398`` via
    ``weighted=True``)."""
    sep = delimiter if delimiter is not None else r"\s+"
    toks = (spark.read.text(path)
            .select(F.trim(F.col("value")).alias("v"))
            .filter((F.col("v") != "") & (~F.col("v").startswith(comments)))
            .select(F.split(F.col("v"), sep).alias("t")))
    e = toks.select(F.col("t")[0].alias(SRC), F.col("t")[1].alias(DST),
                    (F.col("t")[2].cast("double") if weighted else F.lit(1.0))
                    .alias(WEIGHT))
    return Graph.from_edges(e, directed=directed, weight=WEIGHT)


def write_edgelist(g: Graph, path: str, delimiter: str = " ",
                   data: bool = True) -> None:
    """One ``src dst [weight]`` line per canonical edge
    (``edgelist.py:127``; ``data=False`` drops the weight column like the
    reference's ``data=False``)."""
    cols = [F.col(SRC), F.col(DST)] + ([F.col(WEIGHT)] if data else [])
    (g.edges.select(F.concat_ws(delimiter, *cols).alias("value"))
     .write.mode("overwrite").text(path))


def read_adjlist(spark: SparkSession, path: str, comments: str = "#",
                 delimiter: str | None = None, directed: bool = False) -> Graph:
    """Parse ``u n1 n2 …`` lines (``adjlist.py:228``): first token is the
    vertex, the rest its neighbors; a bare token declares an isolated
    vertex."""
    sep = delimiter if delimiter is not None else r"\s+"
    toks = (spark.read.text(path)
            .select(F.trim(F.col("value")).alias("v"))
            .filter((F.col("v") != "") & (~F.col("v").startswith(comments)))
            .select(F.split(F.col("v"), sep).alias("t")))
    verts = toks.select(F.col("t")[0].alias(ID))
    e = (toks.select(F.col("t")[0].alias(SRC),
                     F.explode(F.slice(F.col("t"), 2, 1 << 30)).alias(DST)))
    return Graph.from_edges(e, directed=directed, vertices=verts)


def write_adjlist(g: Graph, path: str, delimiter: str = " ") -> None:
    """One line per vertex: the vertex then its neighbors
    (``adjlist.py:90``).  Undirected graphs list each canonical edge once
    under its ``src`` endpoint (the reference similarly suppresses the
    second occurrence); isolated vertices emit a bare id line."""
    nbrs = (g.edges.groupBy(SRC)
            .agg(F.array_sort(F.collect_list(DST)).alias("ns"))
            .select(F.col(SRC).alias(ID), "ns"))
    lines = (g.vertices().join(nbrs, ID, "left")
             .select(F.concat_ws(
                 delimiter, F.col(ID),
                 F.coalesce(F.concat_ws(delimiter, F.col("ns")), F.lit("")))
                 .alias("value"))
             .select(F.regexp_replace("value", f"{delimiter}$", "").alias("value")))
    lines.write.mode("overwrite").text(path)


# ---------------------------------------------------------- JSON node-link
def node_link_data(g: Graph, cap: int = 100_000) -> dict:
    """Reference-shaped node-link dict
    (``readwrite/json_graph/node_link.py:34``): ``{"directed", "multigraph",
    "graph", "nodes": [{"id": …}], "links": [{"source", "target",
    "weight"}]}`` — the most common "get my graph out" interop path for
    reference users.  Driver-side by nature (a JSON document is a
    driver-side structure), guarded like :mod:`networkx_spark.convert`;
    the distributed interchange format remains the edge table itself."""
    from networkx_spark.convert import _guard
    _guard(g, cap)
    nodes = [{"id": r[ID]} for r in g.vertices().orderBy(ID).collect()]
    links = [{"source": r[SRC], "target": r[DST], "weight": r[WEIGHT]}
             for r in g.edges.orderBy(SRC, DST).collect()]
    return {"directed": g.directed, "multigraph": False, "graph": {},
            "nodes": nodes, "links": links}


def node_link_graph(spark: SparkSession, data: dict) -> Graph:
    """Inverse of :func:`node_link_data`
    (``node_link.py:142`` ``node_link_graph``); accepts either the
    ``links`` or the newer ``edges`` key."""
    links = data.get("links", data.get("edges", []))
    rows = [(str(l["source"]), str(l["target"]),
             float(l.get("weight", 1.0))) for l in links]
    nodes = [str(n["id"]) for n in data.get("nodes", [])]
    return Graph.from_edge_list(spark, rows, nodes=nodes or None,
                                directed=bool(data.get("directed", False)))


def write_node_link_json(g: Graph, path: str, cap: int = 100_000) -> None:
    """Single-file JSON document (reference-interop form)."""
    import json
    with open(path, "w") as fh:
        json.dump(node_link_data(g, cap), fh)


def read_node_link_json(spark: SparkSession, path: str) -> Graph:
    import json
    with open(path) as fh:
        return node_link_graph(spark, json.load(fh))

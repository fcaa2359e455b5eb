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

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID, VID


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


# ----------------------------------------------------------------- GraphML
# Reference: ``networkx/readwrite/graphml.py`` (``write_graphml`` ``:61``,
# ``read_graphml`` ``:219``).  GraphML is the main interchange format with
# Gephi/igraph/yEd tooling — the top interop ask after JSON node-link.
#
# Write path is DISTRIBUTED where it can be: every <node>/<edge> element is
# rendered as an XML fragment string JVM-side (concat + regexp escaping,
# whole-stage codegen, no Python), written as text part files; the driver
# then streams header + parts + footer into the single .graphml document —
# an O(bytes) sequential copy with zero parsing, the unavoidable cost of a
# single-document output format.  The read path is a driver-side
# ElementTree parse (an XML document is a driver-side structure, like
# node-link JSON); both directions stay honest about that and the
# PARQUET edge table remains the at-scale interchange format.

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"
_XSI = ("http://www.w3.org/2001/XMLSchema-instance",
        "http://graphml.graphdrawing.org/xmlns "
        "http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd")
_GML_TYPES = {"string": "string", "double": "double", "float": "float",
              "bigint": "long", "int": "int", "smallint": "int",
              "tinyint": "int", "boolean": "boolean"}
_GML_CASTS = {"string": "string", "double": "double", "float": "float",
              "long": "bigint", "int": "int", "boolean": "boolean"}


def _xml_escape(col):
    c = F.regexp_replace(col.cast("string"), "&", "&amp;")
    for lit, ent in (("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
        c = F.regexp_replace(c, lit, ent)
    return c


def _data_elems(df: DataFrame, keys: list[str]):
    """Concat column rendering ``<data key="k">v</data>`` per non-null attr."""
    parts = []
    for k in keys:
        parts.append(F.when(
            F.col(k).isNotNull(),
            F.concat(F.lit(f'<data key="{k}">'), _xml_escape(F.col(k)),
                     F.lit("</data>"))).otherwise(F.lit("")))
    return F.concat(*parts) if parts else F.lit("")


def _attr_keys(df: DataFrame | None, skip: tuple) -> list[tuple[str, str]]:
    if df is None:
        return []
    return [(name, _GML_TYPES[t]) for name, t in df.dtypes
            if name not in skip and t in _GML_TYPES]


def write_graphml(g: Graph, path: str) -> None:
    """Single-file GraphML document with node/edge attributes
    (``graphml.py:61``).  Edge ``weight`` is always emitted; attribute
    tables (``Graph.with_vertex_attrs`` / ``with_edge_attrs``) contribute
    one ``<key>``-declared attribute per supported-type column."""
    import glob
    import shutil
    import tempfile

    spark = g.edges.sparkSession
    vkeys = _attr_keys(g._vertex_attrs, (ID,))
    ekeys = _attr_keys(g._edge_attrs, (SRC, DST))

    verts = g.vertices()
    if g._vertex_attrs is not None:
        verts = verts.join(g._vertex_attrs, ID, "left")
    nodes = verts.select(F.concat(
        F.lit('<node id="'), _xml_escape(F.col(ID)), F.lit('">'),
        _data_elems(verts, [k for k, _ in vkeys]),
        F.lit("</node>")).alias("value"))

    edges = g.edges
    if g._edge_attrs is not None:
        edges = edges.join(g._edge_attrs, [SRC, DST], "left")
    eattrs = _data_elems(edges, [k for k, _ in ekeys])
    erows = edges.select(F.concat(
        F.lit('<edge source="'), _xml_escape(F.col(SRC)),
        F.lit('" target="'), _xml_escape(F.col(DST)), F.lit('">'),
        F.concat(F.lit('<data key="weight">'),
                 F.col(WEIGHT).cast("string"), F.lit("</data>")),
        eattrs, F.lit("</edge>")).alias("value"))

    tmp = tempfile.mkdtemp(prefix="nxs_graphml_")
    try:
        nodes.write.mode("overwrite").text(f"{tmp}/nodes")
        erows.write.mode("overwrite").text(f"{tmp}/edges")
        with open(path, "w", encoding="utf-8") as out:
            out.write("<?xml version='1.0' encoding='utf-8'?>\n")
            out.write(f'<graphml xmlns="{_GRAPHML_NS}" '
                      f'xmlns:xsi="{_XSI[0]}" xsi:schemaLocation="{_XSI[1]}">\n')
            for name, typ in vkeys:
                out.write(f'<key id="{name}" for="node" attr.name="{name}" '
                          f'attr.type="{typ}"/>\n')
            out.write('<key id="weight" for="edge" attr.name="weight" '
                      'attr.type="double"/>\n')
            for name, typ in ekeys:
                out.write(f'<key id="{name}" for="edge" attr.name="{name}" '
                          f'attr.type="{typ}"/>\n')
            mode = "directed" if g.directed else "undirected"
            out.write(f'<graph edgedefault="{mode}">\n')
            for sub in ("nodes", "edges"):
                for part in sorted(glob.glob(f"{tmp}/{sub}/part-*")):
                    with open(part, encoding="utf-8") as fh:
                        shutil.copyfileobj(fh, out)
            out.write("</graph>\n</graphml>\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """Parse a GraphML document into a :class:`Graph` (+ attribute tables)
    — ``read_graphml`` (``graphml.py:219``).  Driver-side ElementTree
    parse (single-document format); attribute values are cast per the
    ``<key>`` declarations."""
    import xml.etree.ElementTree as ET

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    root = ET.parse(path).getroot()
    keys = {}
    for el in root.iter():
        if local(el.tag) == "key":
            keys[el.get("id")] = (el.get("for", "node"),
                                  el.get("attr.name", el.get("id")),
                                  el.get("attr.type", "string"))
    graph_el = next(el for el in root.iter() if local(el.tag) == "graph")
    directed = graph_el.get("edgedefault", "undirected") == "directed"

    def datas(el):
        out = {}
        for d in el:
            if local(d.tag) == "data" and d.get("key") in keys:
                _, name, _ = keys[d.get("key")]
                out[name] = d.text
        return out

    nodes, edges = [], []
    for el in graph_el:
        t = local(el.tag)
        if t == "node":
            nodes.append({ID: el.get("id"), **datas(el)})
        elif t == "edge":
            edges.append({SRC: el.get("source"), DST: el.get("target"),
                          **datas(el)})

    vcols = [(n, t) for _, (f, n, t) in sorted(keys.items()) if f == "node"]
    ecols = [(n, t) for _, (f, n, t) in sorted(keys.items())
             if f == "edge" and n != "weight"]
    e = spark.createDataFrame(
        [(r[SRC], r[DST], float(r.get("weight", 1.0)),
          *[r.get(n) for n, _ in ecols]) for r in edges] or
        [("", "", 1.0, *[None] * len(ecols))],
        schema=f"src string, dst string, weight double"
               + "".join(f", {n} string" for n, _ in ecols))
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame(
        [(r[ID], *[r.get(n) for n, _ in vcols]) for r in nodes] or
        [("", *[None] * len(vcols))],
        schema="id string" + "".join(f", {n} string" for n, _ in vcols))
    if not nodes:
        v = v.limit(0)
    for n, t in vcols:
        v = v.withColumn(n, F.col(n).cast(_GML_CASTS.get(t, "string")))
    for n, t in ecols:
        e = e.withColumn(n, F.col(n).cast(_GML_CASTS.get(t, "string")))
    out = Graph.from_edges(e.select(SRC, DST, WEIGHT), directed=directed,
                           weight=WEIGHT, vertices=v.select(ID))
    if vcols:
        out = out.with_vertex_attrs(v)
    if ecols:
        out = out.with_edge_attrs(e.drop(WEIGHT))
    return out


# --------------------------------------------------------------------- GML
# Reference: ``networkx/readwrite/gml.py`` (``write_gml`` ``:792``,
# ``read_gml`` ``:303``).  Same posture as GraphML: node/edge blocks are
# rendered JVM-side and streamed into the single document; reads are a
# driver-side parse of the (single-document) format.  The reference's GML
# contract keys nodes by an integer ``id`` and a string ``label`` and
# relabels to labels on read — the dense integer ids come from
# :meth:`Graph.with_vids` (distributed compaction, no global window).

def _gml_escape(col):
    c = F.regexp_replace(col.cast("string"), "&", "&amp;")
    return F.regexp_replace(c, '"', "&quot;")


def _gml_unescape(s: str) -> str:
    # the reference writer emits HTML entities (numeric for non-ASCII and
    # quotes, ``gml.py`` escape): unescape covers both forms
    import html
    return html.unescape(s)


def write_gml(g: Graph, path: str) -> None:
    """Single-file GML document (``gml.py:792``): integer node ids +
    string labels (= the engine's vertex ids), per-edge ``weight``."""
    import glob
    import shutil
    import tempfile

    vmap, evids = g.with_vids()
    nodes = vmap.select(F.concat(
        F.lit("  node [\n    id "), F.col(VID).cast("string"),
        F.lit('\n    label "'), _gml_escape(F.col(ID)),
        F.lit('"\n  ]')).alias("value"))
    edges = evids.select(F.concat(
        F.lit("  edge [\n    source "), F.col(SRC).cast("string"),
        F.lit("\n    target "), F.col(DST).cast("string"),
        F.lit("\n    weight "), F.col(WEIGHT).cast("string"),
        F.lit("\n  ]")).alias("value"))

    tmp = tempfile.mkdtemp(prefix="nxs_gml_")
    try:
        nodes.write.mode("overwrite").text(f"{tmp}/nodes")
        edges.write.mode("overwrite").text(f"{tmp}/edges")
        with open(path, "w", encoding="utf-8") as out:
            out.write("graph [\n")
            if g.directed:
                out.write("  directed 1\n")
            for sub in ("nodes", "edges"):
                for part in sorted(glob.glob(f"{tmp}/{sub}/part-*")):
                    with open(part, encoding="utf-8") as fh:
                        shutil.copyfileobj(fh, out)
            out.write("]\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _gml_tokens(text: str):
    import re
    # strings, brackets, bare tokens; #-comments run to end of line
    for m in re.finditer(r'"[^"]*"|\[|\]|#[^\n]*|[^\s\[\]]+', text):
        t = m.group(0)
        if not t.startswith("#"):
            yield t


def read_gml(spark: SparkSession, path: str) -> Graph:
    """Parse a GML document (``gml.py:303``): nodes keyed by ``id``,
    relabeled to ``label`` when present (the reference's default
    ``label='label'`` behaviour); ``weight`` honored, other keys ignored."""
    with open(path, encoding="utf-8") as fh:
        toks = list(_gml_tokens(fh.read()))

    def parse_block(i):
        """toks[i] == '[' → (dict-of-lists, next index)."""
        out: dict[str, list] = {}
        i += 1
        while i < len(toks) and toks[i] != "]":
            key = toks[i]
            val, i = parse_value(i + 1)
            out.setdefault(key, []).append(val)
        return out, i + 1

    def parse_value(i):
        t = toks[i]
        if t == "[":
            return parse_block(i)
        if t.startswith('"'):
            return _gml_unescape(t[1:-1]), i + 1
        try:
            return int(t), i + 1
        except ValueError:
            try:
                return float(t), i + 1
            except ValueError:
                return t, i + 1

    # top level: find 'graph ['
    i = 0
    doc = None
    while i < len(toks):
        if toks[i] == "graph" and i + 1 < len(toks) and toks[i + 1] == "[":
            doc, i = parse_block(i + 1)
            break
        i += 1
    if doc is None:
        raise ValueError(f"{path}: no 'graph [' block found")

    directed = bool(doc.get("directed", [0])[0])
    label_of = {}
    node_rows = []
    for nd in doc.get("node", []):
        nid = nd["id"][0]
        label = str(nd.get("label", [nid])[0])
        label_of[nid] = label
        node_rows.append((label,))
    edge_rows = [(label_of[ed["source"][0]], label_of[ed["target"][0]],
                  float(ed.get("weight", [1.0])[0]))
                 for ed in doc.get("edge", [])]
    e = spark.createDataFrame(edge_rows or [("", "", 1.0)],
                              "src string, dst string, weight double")
    if not edge_rows:
        e = e.limit(0)
    v = spark.createDataFrame(node_rows or [("",)], "id string")
    if not node_rows:
        v = v.limit(0)
    return Graph.from_edges(e, directed=directed, weight=WEIGHT, vertices=v)


# -------------------------------------------------------------------- GEXF
# Reference: ``networkx/readwrite/gexf.py`` (``write_gexf`` ``:40``,
# ``read_gexf`` ``:160``) — the Gephi-native format.  Same posture as
# GraphML: <node>/<edge> elements render JVM-side (codegen concat +
# regexp escaping), the driver streams header + part files + footer into
# the single document; the read is a driver-side ElementTree parse.

_GEXF_NS = "http://www.gexf.net/1.2draft"
_GEXF_TYPES = {"string": "string", "double": "double", "float": "float",
               "bigint": "long", "int": "integer", "smallint": "integer",
               "tinyint": "integer", "boolean": "boolean"}
_GEXF_CASTS = {"string": "string", "double": "double", "float": "float",
               "long": "bigint", "integer": "int", "boolean": "boolean"}


def _gexf_attvalues(df: DataFrame, keys: list[str]):
    parts = []
    for i, k in enumerate(keys):
        parts.append(F.when(
            F.col(k).isNotNull(),
            F.concat(F.lit(f'<attvalue for="{i}" value="'),
                     _xml_escape(F.col(k)), F.lit('"/>'))).otherwise(F.lit("")))
    if not parts:
        return F.lit("")
    return F.concat(F.lit("<attvalues>"), *parts, F.lit("</attvalues>"))


def write_gexf(g: Graph, path: str) -> None:
    """Single-file GEXF 1.2 document (``gexf.py:40``): node ``label`` =
    vertex id (the reference's default when no label attribute exists,
    ``gexf.py:388-392``), per-edge ``weight``, attribute tables declared
    per class with 0-based attribute ids like the reference's
    ``attr_id`` counter."""
    import glob
    import shutil
    import tempfile

    vkeys = _attr_keys(g._vertex_attrs, (ID,))
    ekeys = _attr_keys(g._edge_attrs, (SRC, DST))

    verts = g.vertices()
    if g._vertex_attrs is not None:
        verts = verts.join(g._vertex_attrs, ID, "left")
    nodes = verts.select(F.concat(
        F.lit('<node id="'), _xml_escape(F.col(ID)),
        F.lit('" label="'), _xml_escape(F.col(ID)), F.lit('">'),
        _gexf_attvalues(verts, [k for k, _ in vkeys]),
        F.lit("</node>")).alias("value"))

    edges = g.edges
    if g._edge_attrs is not None:
        edges = edges.join(g._edge_attrs, [SRC, DST], "left")
    erows = edges.select(F.concat(
        F.lit('<edge source="'), _xml_escape(F.col(SRC)),
        F.lit('" target="'), _xml_escape(F.col(DST)),
        F.lit('" weight="'), F.col(WEIGHT).cast("string"), F.lit('">'),
        _gexf_attvalues(edges, [k for k, _ in ekeys]),
        F.lit("</edge>")).alias("value"))

    tmp = tempfile.mkdtemp(prefix="nxs_gexf_")
    try:
        nodes.write.mode("overwrite").text(f"{tmp}/nodes")
        erows.write.mode("overwrite").text(f"{tmp}/edges")
        mode = "directed" if g.directed else "undirected"
        with open(path, "w", encoding="utf-8") as out:
            out.write("<?xml version='1.0' encoding='utf-8'?>\n")
            out.write(f'<gexf xmlns="{_GEXF_NS}" version="1.2">\n')
            out.write(f'<graph defaultedgetype="{mode}" mode="static">\n')
            for cls, keys in (("node", vkeys), ("edge", ekeys)):
                if keys:
                    out.write(f'<attributes class="{cls}">\n')
                    for i, (name, typ) in enumerate(keys):
                        gt = {"long": "long", "int": "integer",
                              "boolean": "boolean", "float": "float",
                              "double": "double"}.get(typ, "string")
                        out.write(f'<attribute id="{i}" title="{name}" '
                                  f'type="{gt}"/>\n')
                    out.write("</attributes>\n")
            out.write("<nodes>\n")
            for part in sorted(glob.glob(f"{tmp}/nodes/part-*")):
                with open(part, encoding="utf-8") as fh:
                    shutil.copyfileobj(fh, out)
            out.write("</nodes>\n<edges>\n")
            for part in sorted(glob.glob(f"{tmp}/edges/part-*")):
                with open(part, encoding="utf-8") as fh:
                    shutil.copyfileobj(fh, out)
            out.write("</edges>\n</graph>\n</gexf>\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def read_gexf(spark: SparkSession, path: str) -> Graph:
    """Parse a GEXF document into a :class:`Graph` (+ attribute tables) —
    ``read_gexf`` (``gexf.py:160``).  Attribute values cast per the
    ``<attribute>`` declarations; edge ``weight`` defaults to 1."""
    import xml.etree.ElementTree as ET

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    root = ET.parse(path).getroot()
    graph_el = next(el for el in root.iter() if local(el.tag) == "graph")
    directed = graph_el.get("defaultedgetype", "undirected") == "directed"

    attrs = {"node": {}, "edge": {}}
    for el in root.iter():
        if local(el.tag) == "attributes":
            cls = el.get("class", "node")
            for a in el:
                if local(a.tag) == "attribute":
                    attrs[cls][a.get("id")] = (a.get("title"),
                                               a.get("type", "string"))

    def attvalues(el, cls):
        out = {}
        for child in el.iter():
            if local(child.tag) == "attvalue" and child.get("for") in attrs[cls]:
                name, _ = attrs[cls][child.get("for")]
                out[name] = child.get("value")
        return out

    nodes, edges = [], []
    for el in root.iter():
        t = local(el.tag)
        if t == "node" and el.get("id") is not None:
            nodes.append({ID: el.get("id"), **attvalues(el, "node")})
        elif t == "edge":
            edges.append({SRC: el.get("source"), DST: el.get("target"),
                          "weight": el.get("weight", "1.0"),
                          **attvalues(el, "edge")})

    vcols = [attrs["node"][k] for k in sorted(attrs["node"])]
    ecols = [attrs["edge"][k] for k in sorted(attrs["edge"])]
    e = spark.createDataFrame(
        [(r[SRC], r[DST], float(r["weight"]),
          *[r.get(n) for n, _ in ecols]) for r in edges] or
        [("", "", 1.0, *[None] * len(ecols))],
        schema="src string, dst string, weight double"
               + "".join(f", {n} string" for n, _ in ecols))
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame(
        [(r[ID], *[r.get(n) for n, _ in vcols]) for r in nodes] or
        [("", *[None] * len(vcols))],
        schema="id string" + "".join(f", {n} string" for n, _ in vcols))
    if not nodes:
        v = v.limit(0)
    for n, t in vcols:
        v = v.withColumn(n, F.col(n).cast(_GEXF_CASTS.get(t, "string")))
    for n, t in ecols:
        e = e.withColumn(n, F.col(n).cast(_GEXF_CASTS.get(t, "string")))
    out = Graph.from_edges(e.select(SRC, DST, WEIGHT), directed=directed,
                           weight=WEIGHT, vertices=v.select(ID))
    if vcols:
        out = out.with_vertex_attrs(v)
    if ecols:
        out = out.with_edge_attrs(e.drop(WEIGHT))
    return out


# --------------------------------------------------------------------- Pajek
def write_pajek(g: Graph, path: str) -> None:
    """Single-file Pajek ``.net`` document (reference
    ``networkx/readwrite/pajek.py:100`` ``write_pajek`` / ``:25``
    ``generate_pajek``): 1-based dense vertex numbers with quoted labels
    (= the engine's vertex ids), ``*Arcs`` for directed graphs and
    ``*Edges`` for undirected, per-edge weight.  Fragments render
    JVM-side and stream into the one document, like GML/GraphML."""
    import glob
    import shutil
    import tempfile

    vmap, evids = g.with_vids()
    n = vmap.count()
    # a double quote inside a label would break the quoted field; Pajek has
    # no escape syntax, so substitute it (urls/ids never contain one)
    nodes = vmap.orderBy(VID).select(F.concat(
        (F.col(VID) + 1).cast("string"), F.lit(' "'),
        F.regexp_replace(F.col(ID).cast("string"), '"', "'"),
        F.lit('"')).alias("value"))
    edges = evids.select(F.concat(
        (F.col(SRC) + 1).cast("string"), F.lit(" "),
        (F.col(DST) + 1).cast("string"), F.lit(" "),
        F.col(WEIGHT).cast("string")).alias("value"))
    tmp = tempfile.mkdtemp(prefix="nxs_pajek_")
    try:
        nodes.write.mode("overwrite").text(f"{tmp}/nodes")
        edges.write.mode("overwrite").text(f"{tmp}/edges")
        with open(path, "w", encoding="utf-8") as out:
            out.write(f"*Vertices {n}\n")
            for part in sorted(glob.glob(f"{tmp}/nodes/part-*")):
                with open(part, encoding="utf-8") as fh:
                    shutil.copyfileobj(fh, out)
            out.write("*Arcs\n" if g.directed else "*Edges\n")
            for part in sorted(glob.glob(f"{tmp}/edges/part-*")):
                with open(part, encoding="utf-8") as fh:
                    shutil.copyfileobj(fh, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def read_pajek(spark: SparkSession, path: str) -> Graph:
    """Parse a Pajek ``.net`` document (reference ``pajek.py:134,167``):
    ``*Vertices`` number→label table, ``*Arcs`` directed / ``*Edges``
    undirected pairs with optional weight (default 1).  A file with BOTH
    sections is directed; each ``*Edges`` line then contributes both
    directions (the reference's MultiDiGraph + to_undirected posture).
    Driver-side parse like :func:`read_gml` — these single-file interop
    formats are interchange-scale, not data-scale."""
    import shlex

    labels: dict[int, str] = {}
    arcs: list[tuple] = []
    undirected: list[tuple] = []
    section = None
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            low = line.lower()
            if low.startswith("*"):
                section = ("vertices" if low.startswith("*vertices")
                           else "arcs" if low.startswith("*arcs")
                           else "edges" if low.startswith("*edges") else None)
                continue
            toks = shlex.split(line)
            if section == "vertices":
                num = int(toks[0])
                labels[num] = toks[1] if len(toks) > 1 else str(num)
            elif section in ("arcs", "edges"):
                w = float(toks[2]) if len(toks) > 2 else 1.0
                tgt = arcs if section == "arcs" else undirected
                tgt.append((int(toks[0]), int(toks[1]), w))
    directed = bool(arcs)
    rows = list(arcs)
    for u, v, w in undirected:
        rows.append((u, v, w))
        if directed:
            rows.append((v, u, w))
    lab = lambda i: labels.get(i, str(i))  # noqa: E731
    e = spark.createDataFrame(
        [(lab(u), lab(v), w) for u, v, w in rows] or [("", "", 1.0)],
        "src string, dst string, weight double")
    if not rows:
        e = e.limit(0)
    verts = spark.createDataFrame([(l,) for l in labels.values()] or [("",)],
                                  "id string")
    if not labels:
        verts = verts.limit(0)
    return Graph.from_edges(e, directed=directed, weight="weight",
                            vertices=verts, combine="sum")


# ----------------------------------------------------------- graph6

def _g6_n(n: int) -> bytes:
    """N(n) size header (reference ``readwrite/graph6.py:232`` ``n_to_data``)."""
    if n < 0:
        raise ValueError("n must be >= 0")
    if n <= 62:
        return bytes([n + 63])
    if n <= 258047:
        return bytes([126, (n >> 12 & 63) + 63, (n >> 6 & 63) + 63,
                      (n & 63) + 63])
    if n <= 68719476735:
        return bytes([126, 126] + [((n >> s) & 63) + 63
                                   for s in (30, 24, 18, 12, 6, 0)])
    raise ValueError("graph6 supports n < 2^36")


def to_graph6_bytes(g: Graph, cap: int = 100_000) -> bytes:
    """graph6 encoding (``readwrite/graph6.py:49`` ``to_graph6_bytes``):
    N(n) header + the upper triangle packed column-major, 6 bits/char,
    +63.  Vertices are relabeled to 0..n-1 by sort order like the
    reference's ``sorted(G)``; undirected, self-loops rejected like the
    reference.  A graph6 string is a driver-side artifact (the format
    itself is O(n²) bits), so this is a capped collector; the distributed
    interchange format remains the edge table."""
    from networkx_spark.convert import _guard
    if g.directed:
        raise ValueError("graph6 encodes undirected graphs")
    _guard(g, cap)
    verts = [r[ID] for r in g.vertices().orderBy(ID).collect()]
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    pairs = set()
    for r in g.edges.select(SRC, DST).collect():
        i, j = idx[r[SRC]], idx[r[DST]]
        if i == j:
            raise ValueError("graph6 does not represent self-loops")
        pairs.add((min(i, j), max(i, j)))
    bits = []
    for j in range(1, n):
        for i in range(j):
            bits.append(1 if (i, j) in pairs else 0)
    while len(bits) % 6:
        bits.append(0)
    data = bytes(sum(b << (5 - k) for k, b in enumerate(bits[x:x + 6])) + 63
                 for x in range(0, len(bits), 6))
    return b">>graph6<<" + _g6_n(n) + data + b"\n"


def from_graph6_bytes(spark: SparkSession, raw: bytes) -> Graph:
    """Decode graph6 (``readwrite/graph6.py:112`` ``from_graph6_bytes``)
    into an engine Graph with vertices 0..n-1."""
    s = raw.strip()
    if s.startswith(b">>graph6<<"):
        s = s[10:]
    if s.startswith(b":"):
        raise ValueError("sparse6 input: use from_sparse6_bytes")
    data = [c - 63 for c in s]
    if any(c < 0 or c > 63 for c in data):
        raise ValueError("each input character must be in range(63, 127)")
    if data[0] == 63:
        if data[1] == 63:
            n = 0
            for c in data[2:8]:
                n = (n << 6) | c
            data = data[8:]
        else:
            n = (data[1] << 12) | (data[2] << 6) | data[3]
            data = data[4:]
    else:
        n, data = data[0], data[1:]
    nbits = n * (n - 1) // 2
    bits = []
    for c in data:
        bits.extend(((c >> (5 - k)) & 1) for k in range(6))
    if len(bits) < nbits:
        raise ValueError("graph6 data too short")
    edges, b = [], 0
    for j in range(1, n):
        for i in range(j):
            if bits[b]:
                edges.append((i, j))
            b += 1
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    g = Graph.from_edges(e, directed=False)
    if n:
        g = g.add_vertices(spark.range(n).select(F.col("id")))
    return g


# ----------------------------------------------------------- sparse6
def to_sparse6_bytes(g: Graph, cap: int = 1_000_000) -> bytes:
    """sparse6 encoding (``readwrite/sparse6.py:30`` ``_generate_sparse6_
    bytes``): ':' + N(n) + a bit stream of (b, x) steps — b advances the
    current vertex, x is a k-bit neighbor (k = bits of n−1) — padded with
    1s (the small-k/n=2^k corner padded with 0 then 1s, which would
    otherwise encode a spurious loop on n−1).  Byte-identical to the
    reference for the same vertex order; edges with weight multiplicity
    m > 1 are emitted m times (the multigraph round-trip).  Driver-side
    capped artifact like graph6 — the distributed format is the edge
    table."""
    from networkx_spark.convert import _guard
    if g.directed:
        raise ValueError("sparse6 encodes undirected graphs")
    _guard(g, cap)
    verts = [r[ID] for r in g.vertices().orderBy(ID).collect()]
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    if n >= 2 ** 36:
        raise ValueError("sparse6 is only defined if number of nodes is "
                         "less than 2 ** 36 (reference ValueError)")
    cols = g.edges.columns
    mult = (F.col(WEIGHT).cast("long") if WEIGHT in cols else F.lit(1))
    rows = g.edges.select(SRC, DST, F.greatest(mult, F.lit(1)).alias("_m")
                          ).collect()
    edges = []
    for r in rows:
        i, j = idx[r[SRC]], idx[r[DST]]
        edges.extend([(max(i, j), min(i, j))] * int(r["_m"]))
    edges.sort()
    k = 1
    while (1 << k) < n:
        k += 1
    bits: list[int] = []

    def put(x: int, width: int) -> None:
        bits.extend((x >> (width - 1 - s)) & 1 for s in range(width))

    curv = 0
    for v, u in edges:
        if v == curv:
            put(0, 1)
            put(u, k)
        elif v == curv + 1:
            curv += 1
            put(1, 1)
            put(u, k)
        else:
            curv = v
            put(1, 1)
            put(v, k)
            put(0, 1)
            put(u, k)
    pad = (-len(bits)) % 6
    if k < 6 and n == (1 << k) and pad >= k and curv < n - 1:
        put(0, 1)
        bits.extend([1] * ((-len(bits)) % 6))
    else:
        bits.extend([1] * pad)
    data = bytes(sum(b << (5 - s) for s, b in enumerate(bits[x:x + 6])) + 63
                 for x in range(0, len(bits), 6))
    return b">>sparse6<<:" + _g6_n(n) + data + b"\n"


def from_sparse6_bytes(spark: SparkSession, raw: bytes) -> Graph:
    """Decode sparse6 (``readwrite/sparse6.py:105`` ``from_sparse6_bytes``)
    into an engine Graph with vertices 0..n-1; parallel encodings of an
    edge come back as its ``weight`` multiplicity (the reference returns a
    MultiGraph in that case)."""
    s = raw.strip()
    if s.startswith(b">>sparse6<<"):
        s = s[11:]
    if not s.startswith(b":"):
        raise ValueError("Expected leading colon in sparse6 "
                         "(reference NetworkXError)")
    data = [c - 63 for c in s[1:]]
    if any(c < 0 or c > 63 for c in data):
        raise ValueError("each input character must be in range(63, 127)")
    if data and data[0] == 63:
        if data[1] == 63:
            n = 0
            for c in data[2:8]:
                n = (n << 6) | c
            data = data[8:]
        else:
            n = (data[1] << 12) | (data[2] << 6) | data[3]
            data = data[4:]
    else:
        n, data = (data[0], data[1:]) if data else (0, [])
    k = 1
    while (1 << k) < n:
        k += 1
    stream = []
    acc = 0
    nbits = 0
    for c in data:
        acc = (acc << 6) | c
        nbits += 6
    # consume (1 + k)-bit records from the big-endian bit accumulator
    pos = 0
    edges = []
    v = 0
    while nbits - pos >= 1 + k:
        b = (acc >> (nbits - pos - 1)) & 1
        x = (acc >> (nbits - pos - 1 - k)) & ((1 << k) - 1)
        pos += 1 + k
        if b:
            v += 1
        if x >= n or v >= n:
            break
        if x > v:
            v = x
        else:
            edges.append((x, v))
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    g = Graph.from_edges(e, directed=False, combine="sum")
    if n:
        g = g.add_vertices(spark.range(n).select(F.col("id")))
    return g


# ------------------------------------------------------------- LEDA
def parse_leda(text: str | bytes) -> Graph:
    """LEDA.GRAPH text → engine Graph (``readwrite/leda.py:50``
    ``parse_leda``): 3 header lines, -1/-2 directedness flag, n node
    lines ``|{label}|`` (1-indexed, empty label → its index), m edge
    lines ``s t reversal |{label}|``.  Edge labels land in the edge-attr
    side table; reversal edges are untouched, like the reference."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    lines = [ln.rstrip("\n") for ln in text.split("\n")
             if ln and not ln.startswith("#")]
    it = iter(lines)
    for _ in range(3):
        next(it)
    du = int(next(it))
    directed = du == -1
    n = int(next(it))
    node = {}
    for i in range(1, n + 1):
        symbol = next(it).rstrip().strip("|{}|  ")
        node[i] = symbol if symbol else str(i)
    m = int(next(it))
    edges = []
    for i in range(m):
        try:
            s, t, _reversal, label = next(it).split()
        except Exception as err:  # noqa: BLE001
            raise ValueError(f"Too few fields in LEDA.GRAPH edge {i + 1} "
                             "(reference NetworkXError)") from err
        edges.append((node[int(s)], node[int(t)], label[2:-2]))
    from networkx_spark.session import get_spark
    spark = get_spark()
    e = spark.createDataFrame(edges or [("", "", "")],
                              "src string, dst string, label string")
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame([(s,) for s in node.values()] or [("",)],
                              "id string")
    if not node:
        v = v.limit(0)
    g = Graph.from_edges(e.select(SRC, DST), directed=directed, vertices=v)
    return g.with_edge_attrs(e.select(SRC, DST, "label"))


def read_leda(spark: SparkSession, path: str) -> Graph:
    """``readwrite/leda.py:23`` (plain files; the reference's gz/bz2
    sugar is out of scope)."""
    with open(path, "rb") as fh:
        return parse_leda(fh.read())


def write_leda(g: Graph, path: str) -> None:
    """LEDA.GRAPH writer (the reference ships only the reader; the writer
    exists so round-trips are testable).  Nodes sort by id; labels are
    the vertex ids; edge label = the ``label`` edge attribute if present
    else empty."""
    directed = g.directed
    verts = [str(r[ID]) for r in g.vertices().orderBy(ID).collect()]
    idx = {v: i + 1 for i, v in enumerate(verts)}
    lab = {}
    attrs = g.edge_attr("label")
    if "label" in attrs.columns:
        for r in attrs.collect():
            lab[(str(r[SRC]), str(r[DST]))] = r["label"] or ""
    rows = g.edges.select(SRC, DST).collect()
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("LEDA.GRAPH\nstring\nshort\n")
        fh.write("-1\n" if directed else "-2\n")
        fh.write(f"{len(verts)}\n")
        for v in verts:
            fh.write(f"|{{{v}}}|\n")
        fh.write(f"{len(rows)}\n")
        for r in rows:
            s, t = str(r[SRC]), str(r[DST])
            fh.write(f"{idx[s]} {idx[t]} 0 |{{{lab.get((s, t), '')}}}|\n")

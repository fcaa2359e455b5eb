"""The engine's one data abstraction: an edge-table graph.

The reference stores a graph as a dict-of-dict-of-dict adjacency
(``networkx/classes/graph.py:228-232``), duplicating every edge under both
endpoints.  Here a graph is

* ``edges(src, dst, weight)`` — one row per distinct edge; undirected edges
  stored canonically (``src <= dst``) exactly once,
* an optional ``vertices(id)`` DataFrame carrying isolated vertices
  (the reference's ``_node`` dict, ``graph.py:365-368``).

Undirected adjacency is *derived on demand* by symmetrization — both
directions emitted, self-loops once — mirroring what the reference's
``to_scipy_sparse_array`` does before every linear-algebra kernel
(``networkx/convert_matrix.py:600-613``).  Directed graphs never materialize
a reverse adjacency (the reference's ``_pred``, ``digraph.py:314``):
"predecessors" is just a groupBy on ``dst``.

All views here are lazy DataFrames; Catalyst gives predicate pushdown and
column pruning for free, which is the distributed analogue of the
reference's zero-copy subgraph views (``networkx/classes/graphviews.py``).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SRC, DST, WEIGHT = "src", "dst", "weight"
ID, VID = "id", "vid"


class Graph:
    """An immutable (snapshot-semantics) edge-table graph.

    Parameters
    ----------
    edges : DataFrame with columns ``src, dst[, weight]``.  Rows are assumed
        already canonical (see :meth:`from_edges` for normalization).
    directed : directed vs undirected semantics.
    vertices : optional DataFrame with column ``id``; union-ed with edge
        endpoints so isolated vertices survive (reference keeps them in
        ``_node``, ``graph.py:365``).
    """

    def __init__(self, edges: DataFrame, directed: bool = True,
                 vertices: Optional[DataFrame] = None,
                 vertex_attrs: Optional[DataFrame] = None,
                 edge_attrs: Optional[DataFrame] = None,
                 vertices_complete: bool = False):
        cols = [SRC, DST] + ([WEIGHT] if WEIGHT in edges.columns else [])
        self._edges = edges.select(*cols)
        self.directed = directed
        self._extra_vertices = vertices.select(ID) if vertices is not None else None
        # vertices_complete=True asserts the explicit vertex table already
        # contains every edge endpoint (the production web case: the page
        # table IS the vertex universe).  vertices() then skips the
        # endpoints-union-distinct — a full 2|E|-row shuffle that dominated
        # algorithm setup at protocol scale (73.5M edges → 163M-row distinct).
        self._vertices_complete = vertices_complete and vertices is not None
        # attribute side tables (reference: per-node/edge attr dicts,
        # ``classes/function.py:568-843``): (id, attr…) / (src, dst, attr…);
        # getters semi-join against the live vertex/edge set, so carrying
        # a superset through views is safe
        self._vertex_attrs = vertex_attrs
        self._edge_attrs = edge_attrs

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        directed: bool = True,
        src: str = SRC,
        dst: str = DST,
        weight: Optional[str] = None,
        vertices: Optional[DataFrame] = None,
        combine: str = "sum",
    ) -> "Graph":
        """Normalize an arbitrary edge DataFrame into a canonical Graph.

        * renames/selects ``src, dst`` (+ optional ``weight`` cast to double;
          null weight ⇒ 1.0, the reference default
          ``G.edges(data=weight, default=1)``, ``convert_matrix.py:592-594``),
        * undirected edges canonicalized to ``src <= dst``,
        * duplicate (parallel) edges collapsed; ``combine='sum'`` adds their
          weights — the semantics MultiGraph parallel edges get inside the
          reference's CSR build (COO duplicates sum, ``convert_matrix.py:615``);
          ``combine='max'``/``'min'`` for last/first-wins-ish determinism.
        """
        e = edges.select(
            F.col(src).alias(SRC),
            F.col(dst).alias(DST),
            (F.coalesce(F.col(weight).cast("double"), F.lit(1.0)) if weight
             else F.lit(1.0)).alias(WEIGHT),
        )
        if not directed:
            e = e.select(
                F.least(SRC, DST).alias(SRC),
                F.greatest(SRC, DST).alias(DST),
                WEIGHT,
            )
        agg = {"sum": F.sum, "max": F.max, "min": F.min}[combine]
        e = e.groupBy(SRC, DST).agg(agg(WEIGHT).alias(WEIGHT))
        return cls(e, directed=directed, vertices=vertices)

    @classmethod
    def from_edge_list(cls, spark: SparkSession, pairs: Iterable[tuple],
                       directed: bool = True, nodes: Iterable | None = None) -> "Graph":
        """Tiny-fixture constructor (tests): list of (u, v) or (u, v, w).

        Mirrors ``nx.from_edgelist`` (``networkx/convert.py:478``).
        """
        pairs = list(pairs)
        rows = [(str(p[0]), str(p[1]), float(p[2]) if len(p) > 2 else 1.0) for p in pairs]
        e = spark.createDataFrame(rows or [("", "", 1.0)],
                                  schema="src string, dst string, weight double")
        if not rows:
            e = e.limit(0)
        v = None
        if nodes is not None:
            node_rows = [(str(n),) for n in nodes]
            v = spark.createDataFrame(node_rows or [("",)], schema="id string")
            if not node_rows:
                v = v.limit(0)
        return cls.from_edges(e, directed=directed, weight=WEIGHT, vertices=v)

    # ------------------------------------------------------------- properties
    @property
    def edges(self) -> DataFrame:
        """Canonical edge rows (undirected: one row per edge, src<=dst)."""
        return self._edges

    def vertices(self) -> DataFrame:
        """All vertex ids: endpoints ∪ explicit isolated vertices.

        Reference: ``G.nodes`` (``graph.py:739``).
        """
        if self._vertices_complete:
            return self._extra_vertices
        v = (self._edges.select(F.col(SRC).alias(ID))
             .union(self._edges.select(F.col(DST).alias(ID))))
        if self._extra_vertices is not None:
            v = v.union(self._extra_vertices)
        return v.distinct()

    def symmetrized(self) -> DataFrame:
        """Adjacency rows with both directions, self-loops once.

        Exactly the reference's undirected symmetrization before CSR
        construction (``convert_matrix.py:600-613``): emit ``A + A.T`` then
        subtract the once-counted diagonal.  For directed graphs this is the
        edge table itself.
        """
        if self.directed:
            return self._edges
        w = [WEIGHT] if WEIGHT in self._edges.columns else []
        rev = self._edges.filter(F.col(SRC) != F.col(DST)).select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), *w)
        return self._edges.unionByName(rev)

    def reverse(self) -> "Graph":
        """Directed edge reversal — a column swap, no data movement.

        Reference: ``G.reverse()`` / ``reverse_view`` (``graphviews.py:238``).
        """
        if not self.directed:
            return self
        rev = self._edges.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST),
            *([WEIGHT] if WEIGHT in self._edges.columns else []))
        ea = self._edge_attrs
        if ea is not None:
            rest = [c for c in ea.columns if c not in (SRC, DST)]
            ea = ea.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), *rest)
        return Graph(rev, directed=True, vertices=self._extra_vertices,
                     vertex_attrs=self._vertex_attrs, edge_attrs=ea,
                     vertices_complete=self._vertices_complete)

    def to_undirected(self) -> "Graph":
        """Collapse direction (reference ``graph.py:1711``); weights of
        antiparallel pairs sum (CSR-symmetrization semantics)."""
        if not self.directed:
            return self
        out = Graph.from_edges(self._edges, directed=False, weight=WEIGHT,
                               vertices=self._extra_vertices)
        out._vertex_attrs = self._vertex_attrs
        if self._edge_attrs is not None:
            rest = [c for c in self._edge_attrs.columns if c not in (SRC, DST)]
            # canonicalize keys; if antiparallel edges carried different
            # attrs one of the two rows survives (documented best-effort)
            out._edge_attrs = (self._edge_attrs
                               .select(F.least(SRC, DST).alias(SRC),
                                       F.greatest(SRC, DST).alias(DST), *rest)
                               .dropDuplicates([SRC, DST]))
        return out

    def to_directed(self) -> "Graph":
        """Each undirected edge becomes two reciprocal directed edges
        (reference ``graph.py:1655-1709``); a directed graph returns
        itself (``DiGraph.to_directed`` copies)."""
        if self.directed:
            return self
        ea = self._edge_attrs
        if ea is not None:
            rest = [c for c in ea.columns if c not in (SRC, DST)]
            ea = ea.unionByName(ea.filter(F.col(SRC) != F.col(DST)).select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST), *rest))
        return Graph(self.symmetrized(), directed=True,
                     vertices=self._extra_vertices,
                     vertex_attrs=self._vertex_attrs, edge_attrs=ea)

    # -------------------------------------------------------------- adjacency
    def neighbors(self, v) -> DataFrame:
        """(id) neighbors of ``v`` (reference ``graph.py:1266``: iterator
        over ``G.adj[v]``); for directed graphs these are the successors,
        matching ``DiGraph.neighbors`` (``digraph.py:791``)."""
        return (self.symmetrized()
                .filter(F.col(SRC) == F.lit(v))
                .select(F.col(DST).alias(ID)).distinct())

    def successors(self, v) -> DataFrame:
        """Directed out-neighbors (``digraph.py:791``)."""
        if not self.directed:
            return self.neighbors(v)
        return (self._edges.filter(F.col(SRC) == F.lit(v))
                .select(F.col(DST).alias(ID)).distinct())

    def predecessors(self, v) -> DataFrame:
        """Directed in-neighbors (``digraph.py:812``) — a filter on ``dst``,
        the engine's stand-in for the reference's materialized ``_pred``."""
        if not self.directed:
            return self.neighbors(v)
        return (self._edges.filter(F.col(DST) == F.lit(v))
                .select(F.col(SRC).alias(ID)).distinct())

    # ---------------------------------------------------------------- degrees
    def out_degrees(self, weighted: bool = False) -> DataFrame:
        """(id, degree) per vertex, 0 for sinks/isolated.

        Directed out-degree (``digraph.py:1142``) or undirected degree; for
        undirected graphs a self-loop counts TWICE, matching
        ``DegreeView.__getitem__`` (``reportviews.py:521-528``) — the
        symmetrized table keeps the loop once, so we add its weight again.
        """
        adj = self.symmetrized()
        val = F.col(WEIGHT) if weighted else F.lit(1)
        if not self.directed:
            # self-loop contributes twice to undirected degree
            val = F.when(F.col(SRC) == F.col(DST), val * 2).otherwise(val)
        deg = adj.groupBy(F.col(SRC).alias(ID)).agg(
            F.sum(val).cast("double" if weighted else "long").alias("degree"))
        return (self.vertices().join(deg, ID, "left")
                .select(ID, F.coalesce("degree", F.lit(0)).alias("degree")))

    def in_degrees(self, weighted: bool = False) -> DataFrame:
        """(id, degree): directed in-degree (``digraph.py:1095``) — a groupBy
        on ``dst``, the engine's stand-in for the reference's materialized
        ``_pred`` map.  Undirected graphs have no in-degree concept in the
        reference; route to :meth:`out_degrees` so all three degree methods
        agree on the same graph (incl. the ×2 self-loop rule,
        ``reportviews.py:521-528``)."""
        if not self.directed:
            return self.out_degrees(weighted)
        adj = self.symmetrized()
        val = F.sum(F.col(WEIGHT) if weighted else F.lit(1))
        deg = adj.groupBy(F.col(DST).alias(ID)).agg(
            val.cast("double" if weighted else "long").alias("degree"))
        return (self.vertices().join(deg, ID, "left")
                .select(ID, F.coalesce("degree", F.lit(0)).alias("degree")))

    def degrees(self, weighted: bool = False) -> DataFrame:
        """Undirected degree, or total degree (in+out) for directed graphs."""
        if not self.directed:
            return self.out_degrees(weighted)
        val = F.col(WEIGHT) if weighted else F.lit(1)
        both = (self._edges.select(F.col(SRC).alias(ID), val.alias("d"))
                .unionByName(self._edges.select(F.col(DST).alias(ID), val.alias("d"))))
        deg = both.groupBy(ID).agg(F.sum("d").cast("double" if weighted else "long").alias("degree"))
        return (self.vertices().join(deg, ID, "left")
                .select(ID, F.coalesce("degree", F.lit(0)).alias("degree")))

    # ----------------------------------------------------------------- counts
    def number_of_vertices(self) -> int:
        """Reference ``len(G)`` (``graph.py:469``)."""
        return self.vertices().count()

    def number_of_edges(self) -> int:
        """Canonical edge count (undirected edge counted once,
        ``graph.py:1925``)."""
        return self._edges.count()

    def size(self, weighted: bool = False) -> float:
        """Reference ``G.size(weight=...)`` (``graph.py:1882``)."""
        if not weighted:
            return float(self.number_of_edges())
        row = self._edges.agg(F.sum(WEIGHT).alias("s")).collect()[0]
        return float(row["s"] or 0.0)

    def density(self) -> float:
        """m/(n(n-1)), doubled when undirected (``function.py:104``)."""
        n = self.number_of_vertices()
        m = self.number_of_edges()
        if n <= 1:
            return 0.0
        d = m / (n * (n - 1))
        return d * 2 if not self.directed else d

    # ------------------------------------------------------------- subgraphs
    def subgraph(self, nodes: DataFrame) -> "Graph":
        """Induced subgraph: keep edges with BOTH endpoints in ``nodes``
        (semi-joins).  Lazy, like the reference's ``subgraph_view``
        (``graphviews.py:136``)."""
        n = nodes.select(F.col(nodes.columns[0]).alias(ID))
        e = (self._edges
             .join(n.withColumnRenamed(ID, SRC), SRC, "semi")
             .join(n.withColumnRenamed(ID, DST), DST, "semi")
             .select(SRC, DST, WEIGHT))
        return self._carry(e, vertices=n)

    def edge_subgraph(self, edges: DataFrame) -> "Graph":
        """Keep listed edges only (``graph.py:1842``); endpoints become the
        vertex set implicitly."""
        keys = edges.select(F.col(edges.columns[0]).alias(SRC),
                            F.col(edges.columns[1]).alias(DST))
        if not self.directed:
            keys = keys.select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
        e = self._edges.join(keys, [SRC, DST], "semi")
        return self._carry(e)

    def remove_selfloops(self) -> "Graph":
        return self._carry(self._edges.filter(F.col(SRC) != F.col(DST)),
                           vertices=self._extra_vertices)

    def selfloops(self) -> DataFrame:
        """Reference ``selfloop_edges`` (``classes/function.py:1147``)."""
        return self._edges.filter(F.col(SRC) == F.col(DST))

    def isolates(self) -> DataFrame:
        """Vertices with no incident edge (``algorithms/isolate.py``):
        anti-join of the vertex set against edge endpoints."""
        ends = (self._edges.select(F.col(SRC).alias(ID))
                .union(self._edges.select(F.col(DST).alias(ID))).distinct())
        return self.vertices().join(ends, ID, "anti")

    def has_vertex(self, v) -> bool:
        """Point lookup — test convenience only (reference ``graph.py:873``);
        at scale membership is a semi-join, never a driver round-trip."""
        return self.vertices().filter(F.col(ID) == F.lit(v)).limit(1).count() > 0

    def has_edge(self, u, v) -> bool:
        a, b = (u, v)
        cond = (F.col(SRC) == F.lit(a)) & (F.col(DST) == F.lit(b))
        if not self.directed:
            cond = cond | ((F.col(SRC) == F.lit(b)) & (F.col(DST) == F.lit(a)))
        return self._edges.filter(cond).limit(1).count() > 0

    # -------------------------------------------------------- snapshot updates
    # The reference mutates in place (add_edge/remove_node, graph.py:577+);
    # an edge table is immutable, so mutation is functional: each call
    # returns a NEW snapshot Graph (the Iceberg deployment appends a table
    # snapshot).  Attribute tables ride along.
    def add_edges(self, edges: DataFrame, weight: Optional[str] = None) -> "Graph":
        """``add_edges_from`` (``graph.py:1014``): union + re-canonicalize;
        duplicate edges keep the NEW weight (last-write-wins, matching the
        reference's dict update)."""
        cols = edges.columns
        w = (F.col(weight) if weight else
             (F.col(WEIGHT) if WEIGHT in cols else F.lit(1.0)))
        new = edges.select(F.col(cols[0]).alias(SRC), F.col(cols[1]).alias(DST),
                           w.cast("double").alias(WEIGHT))
        if not self.directed:
            new = new.select(F.least(SRC, DST).alias(SRC),
                             F.greatest(SRC, DST).alias(DST), WEIGHT)
        new = new.dropDuplicates([SRC, DST])
        kept = self._edges.join(new.select(SRC, DST), [SRC, DST], "anti")
        return self._carry(kept.unionByName(new), vertices=self._extra_vertices)

    def remove_edges(self, edges: DataFrame) -> "Graph":
        """``remove_edges_from`` (``graph.py:1305``): endpoints stay as
        (possibly isolated) vertices, like the reference."""
        cols = edges.columns
        keys = edges.select(F.col(cols[0]).alias(SRC), F.col(cols[1]).alias(DST))
        if not self.directed:
            keys = keys.select(F.least(SRC, DST).alias(SRC),
                               F.greatest(SRC, DST).alias(DST))
        v = self.vertices()
        return self._carry(self._edges.join(keys, [SRC, DST], "anti"), vertices=v)

    def add_vertices(self, vertices: DataFrame) -> "Graph":
        """``add_nodes_from`` (``graph.py:644``)."""
        v = vertices.select(F.col(vertices.columns[0]).alias(ID))
        allv = v if self._extra_vertices is None else self._extra_vertices.unionByName(v)
        return self._carry(self._edges, vertices=allv)

    def remove_vertices(self, vertices: DataFrame) -> "Graph":
        """``remove_nodes_from`` (``graph.py:760``): incident edges go too."""
        v = vertices.select(F.col(vertices.columns[0]).alias(ID))
        keep = self.vertices().join(v, ID, "anti")
        e = (self._edges
             .join(keep.withColumnRenamed(ID, SRC), SRC, "semi")
             .join(keep.withColumnRenamed(ID, DST), DST, "semi"))
        return self._carry(e, vertices=keep)

    def relabel(self, mapping: DataFrame) -> "Graph":
        """``relabel_nodes`` (``networkx/relabel.py:10``): ``mapping(old,
        new)``; ids absent from the mapping keep their label.  Merging two
        old ids onto one new id collapses them (the reference's behaviour
        with ``copy=True``); parallel edges created by the merge combine
        by max weight (deterministic)."""
        m = mapping.select(F.col(mapping.columns[0]).alias("_o"),
                           F.col(mapping.columns[1]).alias("_n"))
        e = (self._edges
             .join(m.withColumnRenamed("_o", SRC), SRC, "left")
             .withColumn(SRC, F.coalesce("_n", SRC)).drop("_n")
             .join(m.withColumnRenamed("_o", DST), DST, "left")
             .withColumn(DST, F.coalesce("_n", DST)).drop("_n"))
        v = (self.vertices().join(m.withColumnRenamed("_o", ID), ID, "left")
             .select(F.coalesce("_n", ID).alias(ID)).distinct())
        return Graph.from_edges(e, directed=self.directed, weight=WEIGHT,
                                vertices=v, combine="max")

    # -------------------------------------------------------------- attributes
    def _carry(self, edges: DataFrame, directed: Optional[bool] = None,
               vertices: Optional[DataFrame] = None) -> "Graph":
        """New Graph over ``edges`` carrying this graph's attr tables."""
        return Graph(edges,
                     directed=self.directed if directed is None else directed,
                     vertices=vertices,
                     vertex_attrs=self._vertex_attrs,
                     edge_attrs=self._edge_attrs)

    def with_vertex_attrs(self, attrs: DataFrame) -> "Graph":
        """Attach/overwrite vertex attributes from ``attrs(id, col…)`` —
        the reference's ``set_node_attributes`` (``function.py:568``).
        Columns in ``attrs`` win over same-named existing ones; other
        existing columns are kept (dict-update semantics)."""
        from networkx_spark.attributes import merge_attrs
        a = attrs.withColumnRenamed(attrs.columns[0], ID)
        a = merge_attrs(self._vertex_attrs, a, [ID])
        return Graph(self._edges, directed=self.directed,
                     vertices=self._extra_vertices,
                     vertex_attrs=a, edge_attrs=self._edge_attrs)

    def vertex_attr(self, name: str, default=None) -> DataFrame:
        """(id, <name>) for live vertices — ``get_node_attributes``
        (``function.py:669``): vertices missing the attribute are omitted
        unless ``default`` is given (``:705`` default semantics)."""
        if self._vertex_attrs is None or name not in self._vertex_attrs.columns:
            base = self.vertices()
            if default is None:
                return base.limit(0).withColumn(name, F.lit(None))
            return base.withColumn(name, F.lit(default))
        live = self.vertices().join(self._vertex_attrs.select(ID, name), ID, "left")
        if default is None:
            return live.filter(F.col(name).isNotNull())
        return live.select(ID, F.coalesce(name, F.lit(default)).alias(name))

    def with_edge_attrs(self, attrs: DataFrame) -> "Graph":
        """Attach/overwrite edge attributes from ``attrs(src, dst, col…)``
        — ``set_edge_attributes`` (``function.py:843``); undirected keys
        are canonicalized like the edge table itself."""
        c0, c1 = attrs.columns[:2]
        a = attrs.withColumnRenamed(c0, SRC).withColumnRenamed(c1, DST)
        from networkx_spark.attributes import merge_attrs
        if not self.directed:
            rest = [c for c in a.columns if c not in (SRC, DST)]
            a = a.select(F.least(SRC, DST).alias(SRC),
                         F.greatest(SRC, DST).alias(DST), *rest)
        a = merge_attrs(self._edge_attrs, a, [SRC, DST])
        return Graph(self._edges, directed=self.directed,
                     vertices=self._extra_vertices,
                     vertex_attrs=self._vertex_attrs, edge_attrs=a)

    def edge_attr(self, name: str, default=None) -> DataFrame:
        """(src, dst, <name>) for live edges — ``get_edge_attributes``
        (``function.py:705``)."""
        if name == WEIGHT and (
                self._edge_attrs is None or name not in self._edge_attrs.columns):
            return self._edges.select(SRC, DST, WEIGHT)
        if self._edge_attrs is None or name not in self._edge_attrs.columns:
            base = self._edges.select(SRC, DST)
            if default is None:
                return base.limit(0).withColumn(name, F.lit(None))
            return base.withColumn(name, F.lit(default))
        live = (self._edges.select(SRC, DST)
                .join(self._edge_attrs.select(SRC, DST, name), [SRC, DST], "left"))
        if default is None:
            return live.filter(F.col(name).isNotNull())
        return live.select(SRC, DST, F.coalesce(name, F.lit(default)).alias(name))

    # ------------------------------------------------------------------- vids
    def with_vids(self) -> tuple[DataFrame, DataFrame]:
        """Dense-id compaction: ``(vertex_map(id, vid), edges(src_vid, dst_vid,
        weight))``.

        The distributed analogue of the reference's
        ``index = dict(zip(nodelist, range(nlen)))`` (``convert_matrix.py:591``)
        / ``convert_node_labels_to_integers`` (``relabel.py:227``).  vids are
        dense 0..N-1 ordered by id (deterministic, resume-stable).

        Two-level assignment — no single-partition window anywhere in the
        plan: a range-partitioned sort gives each partition a contiguous id
        range; per-partition counts (one tiny aggregate) become prefix-sum
        offsets broadcast back as a literal CASE; vid = offset[partition] +
        local rank, where the local rank is a ``row_number`` window keyed
        BY partition id, so every window group is one partition's rows.
        """
        spark = self._edges.sparkSession
        # range partition by id: partition p holds ids entirely before
        # partition p+1's (Spark's RangePartitioner samples keys; the exact
        # split points don't matter, only the ordering between partitions)
        v = (self.vertices()
             .repartitionByRange(F.col(ID))
             .sortWithinPartitions(ID)
             .withColumn("_pid", F.spark_partition_id()))
        v = v.cache()
        counts = {r["_pid"]: r["c"] for r in
                  v.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        w = Window.partitionBy("_pid").orderBy(ID)
        vmap = (v.withColumn(VID, off[F.col("_pid")] + F.row_number().over(w) - 1)
                .select(ID, F.col(VID).cast("long").alias(VID)))
        e = (self._edges
             .join(vmap.select(F.col(ID).alias(SRC), F.col(VID).alias("src_vid")), SRC)
             .join(vmap.select(F.col(ID).alias(DST), F.col(VID).alias("dst_vid")), DST)
             .select(F.col("src_vid").alias(SRC), F.col("dst_vid").alias(DST), WEIGHT))
        return vmap, e

"""Key-preserving parallel-edge graph (the reference's MultiGraph).

The reference's ``MultiGraph`` (``networkx/classes/multigraph.py:14``)
stores adjacency as dict-of-dict-of-dict-of-dict — the extra level is the
**edge key** distinguishing parallel edges; auto-assigned keys are the
lowest unused non-negative integer per endpoint pair
(``new_edge_key``, ``multigraph.py:401``).

Here the contract is a flat edge table ``(src, dst, key, weight)`` with
``(src, dst, key)`` unique.  :class:`networkx_spark.graph.Graph` collapses
parallel edges at construction (the semantics the reference's CSR build
gives them, ``convert_matrix.py:615``); this class is for callers that
need the parallel edges themselves — each row keeps its own weight and
key, degrees count every parallel edge, and ``to_graph()`` performs the
same collapse explicitly when an algorithm needs simple-graph input.

Scale posture: everything is plain column algebra over the edge table;
the only shuffle-bearing op is the per-pair key assignment (a window by
``(src, dst)`` — bounded by the max parallel-edge multiplicity, which is
tiny in practice) and the degree aggregations.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID

KEY = "key"


class MultiGraph:
    """Immutable parallel-edge graph over ``(src, dst, key, weight)``."""

    def __init__(self, edges: DataFrame, directed: bool = False,
                 vertices: Optional[DataFrame] = None):
        self._edges = edges.select(SRC, DST, KEY, WEIGHT)
        self.directed = directed
        self._extra_vertices = vertices.select(ID) if vertices is not None else None

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edges(cls, edges: DataFrame, directed: bool = False,
                   src: str = SRC, dst: str = DST,
                   key: Optional[str] = None, weight: Optional[str] = None,
                   vertices: Optional[DataFrame] = None) -> "MultiGraph":
        """Normalize an edge DataFrame, keeping parallel edges.

        Without a ``key`` column, keys are auto-assigned 0..k-1 per
        endpoint pair in a deterministic (weight, hash)-sorted order —
        the distributed analogue of ``new_edge_key``'s lowest-unused
        integer (``multigraph.py:401-429``; insertion order does not
        exist here, so the order is content-defined instead).
        Undirected edges are canonicalized to ``src <= dst`` like
        :meth:`Graph.from_edges`; duplicate explicit ``(src, dst, key)``
        rows are last-wins-reduced to one (``add_edge`` with an existing
        key updates in place, ``multigraph.py:430-525``).
        """
        e = edges.select(
            F.col(src).alias(SRC),
            F.col(dst).alias(DST),
            *( [F.col(key).alias(KEY)] if key else [] ),
            (F.coalesce(F.col(weight).cast("double"), F.lit(1.0)) if weight
             else F.lit(1.0)).alias(WEIGHT),
        )
        if not directed:
            e = e.select(
                F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST),
                *( [KEY] if key else [] ), WEIGHT)
        if key:
            # keys must be integral: the mutation paths assign
            # max-existing+1 (``new_edge_key``, ``multigraph.py:401``),
            # which has no meaning for, e.g., string keys
            ktype = dict(e.dtypes)[KEY]
            if ktype not in ("tinyint", "smallint", "int", "bigint"):
                raise TypeError(
                    f"MultiGraph key column must be integral, got {ktype}; "
                    "relabel keys to integers before from_edges")
            e = e.withColumn(KEY, F.col(KEY).cast("long"))
            # duplicate explicit (src, dst, key) rows reduce to ONE row.
            # DataFrames have no insertion order, so the reference's
            # "last add_edge wins" (``multigraph.py:430-525``) is
            # order-undefined here; the max weight is taken as a
            # deterministic, partitioning-independent pick (F.last would
            # be nondeterministic across runs).
            e = (e.groupBy(SRC, DST, KEY).agg(F.max(WEIGHT).alias(WEIGHT)))
        else:
            w = Window.partitionBy(SRC, DST).orderBy(
                F.col(WEIGHT), F.xxhash64(SRC, DST, WEIGHT))
            e = e.select(SRC, DST,
                         (F.row_number().over(w) - 1).cast("long").alias(KEY),
                         WEIGHT)
        return cls(e, directed=directed, vertices=vertices)

    # ------------------------------------------------------------- accessors
    @property
    def edges(self) -> DataFrame:
        return self._edges

    def vertices(self) -> DataFrame:
        ends = (self._edges.select(F.col(SRC).alias(ID))
                .unionByName(self._edges.select(F.col(DST).alias(ID))))
        if self._extra_vertices is not None:
            ends = ends.unionByName(self._extra_vertices)
        return ends.distinct()

    def number_of_edges(self, u=None, v=None) -> int:
        """Total parallel-edge count, or multiplicity of one pair
        (``multigraph.py:1226``)."""
        e = self._edges
        if u is not None and v is not None:
            a, b = (u, v) if self.directed or u <= v else (v, u)
            e = e.filter((F.col(SRC) == a) & (F.col(DST) == b))
        return e.count()

    def has_edge(self, u, v, key=None) -> bool:
        a, b = (u, v) if self.directed or u <= v else (v, u)
        e = self._edges.filter((F.col(SRC) == a) & (F.col(DST) == b))
        if key is not None:
            e = e.filter(F.col(KEY) == key)
        return e.limit(1).count() > 0

    def degrees(self, weighted: bool = False) -> DataFrame:
        """(id, degree) counting EVERY parallel edge; undirected self-loops
        twice (``reportviews.py:521-528`` applied per keyed edge)."""
        val = F.col(WEIGHT) if weighted else F.lit(1)
        if self.directed:
            both = (self._edges.select(F.col(SRC).alias(ID), val.alias("d"))
                    .unionByName(self._edges.select(F.col(DST).alias(ID), val.alias("d"))))
        else:
            loop2 = F.when(F.col(SRC) == F.col(DST), val * 2).otherwise(val)
            both = (self._edges.filter(F.col(SRC) != F.col(DST))
                    .select(F.col(DST).alias(ID), val.alias("d"))
                    .unionByName(self._edges.select(F.col(SRC).alias(ID),
                                                    loop2.alias("d"))))
        deg = both.groupBy(ID).agg(
            F.sum("d").cast("double" if weighted else "long").alias("degree"))
        return (self.vertices().join(deg, ID, "left")
                .select(ID, F.coalesce("degree", F.lit(0)).alias("degree")))

    # -------------------------------------------------------------- mutation
    def add_edge(self, u, v, key=None, weight: float = 1.0) -> "MultiGraph":
        """Functional add; ``key=None`` auto-assigns max-existing+1 for the
        pair (``new_edge_key`` semantics, ``multigraph.py:401``)."""
        spark = self._edges.sparkSession
        a, b = (u, v) if self.directed or u <= v else (v, u)
        if key is None:
            nxt = (self._edges
                   .filter((F.col(SRC) == a) & (F.col(DST) == b))
                   .agg(F.coalesce(F.max(KEY) + 1, F.lit(0))).collect()[0][0])
            key = int(nxt)
        row = spark.createDataFrame(
            [(a, b, int(key), float(weight))],
            schema=self._edges.schema)
        kept = self._edges.filter(~((F.col(SRC) == a) & (F.col(DST) == b)
                                    & (F.col(KEY) == key)))
        return MultiGraph(kept.unionByName(row), directed=self.directed,
                          vertices=self._extra_vertices)

    def remove_edge(self, u, v, key=None) -> "MultiGraph":
        """Functional remove; ``key=None`` removes the HIGHEST key for the
        pair — the reference removes an arbitrary one
        (``multigraph.py:623-701``), so any deterministic pick conforms."""
        a, b = (u, v) if self.directed or u <= v else (v, u)
        pair = (F.col(SRC) == a) & (F.col(DST) == b)
        if key is None:
            mx = (self._edges.filter(pair).agg(F.max(KEY)).collect()[0][0])
            if mx is None:
                raise KeyError(f"no edge between {u!r} and {v!r}")
            key = mx
        return MultiGraph(self._edges.filter(~(pair & (F.col(KEY) == key))),
                          directed=self.directed, vertices=self._extra_vertices)

    # ------------------------------------------------------------ conversion
    def to_graph(self, combine: str = "sum") -> Graph:
        """Collapse parallel edges into a simple :class:`Graph` — the exact
        transformation the reference's CSR build applies to MultiGraph
        input (COO duplicate entries sum, ``convert_matrix.py:615``)."""
        return Graph.from_edges(self._edges, directed=self.directed,
                                weight=WEIGHT, combine=combine,
                                vertices=self._extra_vertices)

"""Vertex/edge attribute tables and reference-named accessors.

Reference: ``networkx/classes/function.py`` — ``set_node_attributes``
(``:568``), ``get_node_attributes`` (``:669``), ``get_edge_attributes``
(``:705``), ``set_edge_attributes`` (``:843``).  The reference stores
per-object attr dicts; the engine keeps one DataFrame per side —
``(id, attr…)`` and ``(src, dst, attr…)`` — joined on demand, so a
100 TB attribute table never routes through the driver and Catalyst
prunes unused attr columns out of every plan.

Merging is **cell-level dict-update**: a new value wins per (key, column)
cell, absent cells keep the old value — exactly what updating per-node
dicts does in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def merge_attrs(old: DataFrame | None, new: DataFrame | None,
                keys: list[str]) -> DataFrame | None:
    """Full-outer cell-level merge: ``new`` wins where it has a non-null
    value (dict-update semantics per key row)."""
    if old is None:
        return new
    if new is None:
        return old
    common = [c for c in old.columns if c in new.columns and c not in keys]
    only_old = [c for c in old.columns if c not in new.columns]
    only_new = [c for c in new.columns if c not in old.columns and c not in keys]
    o = old
    for c in common:
        o = o.withColumnRenamed(c, f"_old_{c}")
    j = o.join(new, keys, "full")
    cols = ([F.col(k) for k in keys]
            + [F.coalesce(F.col(c), F.col(f"_old_{c}")).alias(c) for c in common]
            + [F.col(c) for c in only_old]
            + [F.col(c) for c in only_new])
    return j.select(*cols)


def set_node_attributes(g: Graph, attrs: DataFrame) -> Graph:
    """``set_node_attributes(G, values)`` (``function.py:568``): first
    column of ``attrs`` is the vertex id, the rest attribute columns."""
    return g.with_vertex_attrs(attrs)


def get_node_attributes(g: Graph, name: str, default=None) -> DataFrame:
    """``get_node_attributes(G, name, default)`` (``function.py:669``)."""
    return g.vertex_attr(name, default=default)


def set_edge_attributes(g: Graph, attrs: DataFrame) -> Graph:
    """``set_edge_attributes(G, values)`` (``function.py:843``): first two
    columns of ``attrs`` are (src, dst)."""
    return g.with_edge_attrs(attrs)


def get_edge_attributes(g: Graph, name: str, default=None) -> DataFrame:
    """``get_edge_attributes(G, name, default)`` (``function.py:705``)."""
    return g.edge_attr(name, default=default)

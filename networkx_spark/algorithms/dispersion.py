"""Dispersion centrality (Backstrom–Kleinberg romantic-tie detector).

Reference: ``networkx/algorithms/centrality/dispersion.py:9``
(``dispersion``): for a tie (u, v), the dispersion counts pairs (s, t)
of their common neighbors that are "far apart" in u's neighborhood —
not adjacent and with no common neighbor inside N(u) beyond {u, v} —
optionally normalized by the embeddedness |N(u) ∩ N(v)|.

Spark shape: the whole predicate only reads vertices and edges INSIDE
N(u) (``nbrs_s ⊆ N(u)``, and the disjointness test intersects with it),
so one ego-neighborhood shuffle (the ``cliques.py`` wedge join, the
triangle-count cost envelope) feeds an ``applyInPandas`` group per
center that scores every incident tie at once.  Output is one row per
ordered adjacent pair, the reference's ``u=None, v=None`` mode.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph
from networkx_spark.algorithms.cliques import _ordered_neighborhoods


def dispersion(g: Graph, normalized: bool = True, alpha: float = 1.0,
               b: float = 0.0, c: float = 0.0) -> DataFrame:
    """(u, v, dispersion) for every ordered adjacent pair
    (``dispersion.py:85-92``, the all-pairs mode)."""
    if g.directed:
        raise ValueError("dispersion is defined on undirected ties "
                         "(use to_undirected() first)")

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["c"].iloc[0]
        adj: dict[str, set[str]] = {}
        members: list[str] = []
        for x, y in zip(pdf["u"], pdf["v"]):
            if y is None or (isinstance(y, float) and pd.isna(y)):
                members.append(x)
                adj.setdefault(x, set())
            else:
                adj.setdefault(x, set()).add(y)
                adj.setdefault(y, set()).add(x)
        u_nbrs = set(members)
        rows = []
        for v in members:
            ST = adj.get(v, set()) & u_nbrs
            total = 0
            for s, t in combinations(ST, 2):
                nbrs_s = (u_nbrs & adj.get(s, set())) - {u, v}
                if t not in nbrs_s and nbrs_s.isdisjoint(adj.get(t, set())):
                    total += 1
            val = float(total)
            if normalized:
                val = (total + b) ** alpha
                if len(ST) + c != 0:
                    val /= len(ST) + c
            rows.append((u, v, val))
        return pd.DataFrame(rows, columns=["u", "v", "dispersion"])

    grouped = _ordered_neighborhoods(g)
    return grouped.groupBy("c").applyInPandas(
        _group, "u string, v string, dispersion double")

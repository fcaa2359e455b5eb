"""Dominating sets.

Reference ``networkx/algorithms/dominating.py:11`` (``dominating_set``):
a greedy sequential sweep that returns *some* dominating set ("this
function ... finds some dominating set, not necessarily the smallest
one"), and ``:69`` (``is_dominating_set``).  Because ANY valid dominating
set conforms, the distributed replacement is the classic fact that **a
maximal independent set is a dominating set**: a vertex outside an MIS
always has a neighbor inside it (otherwise it could be added, violating
maximality), and isolated vertices always enter the MIS.  The engine
therefore returns the Luby MIS (`algorithms/mis.py`), which is
deterministic under a seed and replayable in pure SQL — giving the
dominating-set gate row a real oracle, which the reference's
arbitrary-order greedy could never have.

``start_with``: the reference seeds the set with one node.  Luby cannot
pin a winner a priori, so ``start_with`` is honored the same way
``maximal_independent_set(nodes=...)`` honors its seed set: the vertex is
forced into the set and its neighborhood is excluded before round 1.

Scale posture: inherited from Luby — O(log n) supersteps w.h.p., each one
adjacency join + one aggregation, no Python in the loop.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.algorithms.mis import maximal_independent_set


def dominating_set(g: Graph, start_with=None, seed: int = 0,
                   max_rounds: int = 64) -> DataFrame:
    """(id) rows of a dominating set (``dominating.py:11``).

    Undirected only: the reference's directed variant dominates through
    successors, which an independent-set construction does not model.
    """
    if g.directed:
        raise ValueError("dominating_set is implemented for undirected "
                         "graphs (the MIS construction does not model "
                         "successor-only domination)")
    nodes = None
    if start_with is not None:
        spark = g.edges.sparkSession
        nodes = spark.range(1).select(
            F.lit(start_with).cast("long").alias(ID))
    return maximal_independent_set(g, nodes=nodes, seed=seed,
                                   max_rounds=max_rounds)


def is_dominating_set(g: Graph, nbunch: DataFrame) -> bool:
    """True when every vertex is in ``nbunch`` (an (id) DataFrame) or
    adjacent to one of its members (``dominating.py:69``) — one semi-join
    over the symmetrized edges, one anti-join, one empty-check.  Ids are
    compared as strings so long-typed sets (e.g. Luby output) check
    directly against string-id graphs."""
    members = (nbunch.select(F.col(nbunch.columns[0])
                             .cast("string").alias(ID)).distinct())
    covered = (g.symmetrized()
               .join(members.withColumnRenamed(ID, SRC), SRC)
               .select(F.col(DST).alias(ID))
               .unionByName(members)
               .distinct())
    return g.vertices().join(covered, ID, "left_anti").isEmpty()

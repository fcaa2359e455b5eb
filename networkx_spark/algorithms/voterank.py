"""VoteRank influential-spreader selection.

Reference ``networkx/algorithms/centrality/voterank_alg.py:9``
(``voterank(G, number_of_nodes=None)``): every vertex starts with voting
ability 1; each election round scores every vertex by the sum of its
neighbors' abilities (directed: OUT-neighbors vote for their source,
``voterank_alg.py`` edge loop), the highest scorer is elected (stop early
when the best score is 0), its ability drops to 0, and each of its
(out-)neighbors loses 1/⟨k⟩ ability, floored at 0 — ⟨k⟩ being the
average (out-)degree.

Because the per-step floor only ever *subtracts*, ability is a pure
function of the election history: ability(v) = 0 if elected else
max(0, 1 − weakenings(v)/⟨k⟩), where weakenings counts elected vertices
adjacent to v (with multiplicity one per elected vertex).  Each round is
therefore ONE broadcast-joined aggregation over the edge table plus a
1-row top-k collect — k driver rounds total, the inherently sequential
part being the argmax dependency between rounds (the reference pays the
same k-round loop).

Tie-break: the reference takes the first maximum in node-insertion
order (an artifact); this engine breaks ties by minimum vertex id —
deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID


def voterank(g: Graph, number_of_nodes: Optional[int] = None) -> DataFrame:
    """(rank, id) rows of the elected spreaders, rank 1-based in election
    order (``voterank_alg.py:9-121``)."""
    spark = g.edges.sparkSession
    # id schema follows the graph (string urls or long vids) — nothing here
    # assumes integral ids
    id_type = g.edges.schema[SRC].dataType.simpleString()
    n = g.number_of_vertices()
    if n == 0:
        return spark.createDataFrame([], f"rank long, id {id_type}")
    k = n if number_of_nodes is None or number_of_nodes > n else number_of_nodes
    m = g.edges.count()
    # exact integer scoring: with <k> = M/n (M = m directed, 2m undirected),
    # ability after c weakenings is max(0, 1 - c*n/M) = max(0, M - c*n)/M —
    # so score*M = sum of integer abilities.  Float summation-order jitter
    # otherwise flips exact-rational score ties between the distributed sum
    # and the reference's sequential sum (observed on gnm seeds).
    big_m = m if g.directed else 2 * m

    # voting incidence: (voter, candidate) — candidate's score sums the
    # voters' abilities; directed graphs vote along out-edges (nbr → n)
    e = g.symmetrized() if not g.directed else g.edges
    inc = (e.select(F.col(DST).alias("voter"), F.col(SRC).alias("cand"))
           .cache())
    elected: list = []        # ids in election order
    weaken: dict = {}         # id -> weakening count
    for _ in range(k):
        if elected:
            adj = spark.createDataFrame(
                [(i, int(c)) for i, c in weaken.items()],
                f"id {id_type}, w long")
            ability = (g.vertices()
                       .join(F.broadcast(adj), ID, "left")
                       .select(ID, F.when(F.col(ID).isin(elected), F.lit(0))
                               .otherwise(F.greatest(
                                   F.lit(0),
                                   F.lit(big_m) - F.coalesce("w", F.lit(0))
                                   * F.lit(n)))
                               .alias("ability")))
        else:
            ability = g.vertices().select(ID, F.lit(big_m).alias("ability"))
        scores = (inc.join(ability.withColumnRenamed(ID, "voter"), "voter")
                  .groupBy("cand").agg(F.sum("ability").alias("score")))
        if elected:
            scores = scores.filter(~F.col("cand").isin(elected))
        top = (scores.orderBy(F.col("score").desc(), F.col("cand").asc())
               .limit(1).collect())
        if not top or top[0]["score"] <= 0:
            break
        winner = top[0]["cand"]
        elected.append(winner)
        # weaken the winner's (out-)neighbors
        nbrs = (e.filter(F.col(SRC) == winner)
                .select(DST).distinct().collect())
        for r in nbrs:
            weaken[r[DST]] = weaken.get(r[DST], 0) + 1
    inc.unpersist()
    rows = [(i + 1, v) for i, v in enumerate(elected)]
    return spark.createDataFrame(rows or [], f"rank long, id {id_type}")

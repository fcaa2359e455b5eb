"""Weighted matching: exact (capped kernel) + distributed ½-approximation.

Reference ``max_weight_matching(G, maxcardinality, weight)``
(``networkx/algorithms/matching.py:324``) is the Galil blossom algorithm —
a pointer-machine kernel over dual variables and alternating trees, with
no known practical distributed formulation (augmenting paths are global).
The engine therefore ships the same two-tier posture as CNM/KL
(``modularity_max.py``, ``kernighan_lin.py``):

* :func:`max_weight_matching` — EXACT matching on graphs capped at
  ``max_vertices`` (default 20): exhaustive bitmask DP over vertex subsets
  (O(2ⁿ·n²) driver arithmetic, independent of the reference's code), which
  reproduces the reference optimum exactly — on weight, and on the
  (cardinality, weight) objective with ``maxcardinality=True``.  Above the
  cap it raises and names the distributed alternative.
* :func:`max_weight_matching_approx` — the scale path: deterministic
  locally-dominant matching (Preis / Manne–Bisseling): each round an edge
  is matched iff it is the strict best (max weight, hash tie-break) at
  BOTH endpoints — one per-vertex aggregation + one join per round,
  O(log m) expected rounds, ≥ ½ the optimum total weight guaranteed.
  Same superstep envelope as :func:`~networkx_spark.algorithms.mst
  .maximal_matching`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def max_weight_matching(g: Graph, maxcardinality: bool = False,
                        weight: str = WEIGHT,
                        max_vertices: int = 20) -> set[tuple]:
    """Exact maximum-weight matching as a set of (u, v) tuples (u < v) —
    the reference's set-of-pairs contract (``matching.py:324``).

    Bitmask-DP kernel: dp[S] = best (cardinality-aware) value using only
    vertices in S; transitions pick the lowest unmatched vertex and either
    skip it or match it to any co-member.  Capped because the state is
    2^n — the cap is the honesty boundary, not a sampling trick; use
    :func:`max_weight_matching_approx` at scale."""
    if g.directed:
        raise ValueError("max_weight_matching is undirected-only "
                         "(reference matchings are undirected)")
    wcol = (F.col(weight).cast("double") if weight in g.edges.columns
            else F.lit(1.0))
    rows = (g.edges.filter(F.col(SRC) != F.col(DST))
            .select(F.col(SRC).cast("string"), F.col(DST).cast("string"),
                    wcol).collect())
    verts = sorted({v for r in rows for v in (r[0], r[1])},
                   key=lambda x: (len(x), x))
    n = len(verts)
    if n > max_vertices:
        raise ValueError(
            f"max_weight_matching is an exact O(2^n) driver kernel; "
            f"{n} matched-vertex candidates > max_vertices={max_vertices} "
            "— use max_weight_matching_approx (distributed ½-approx) "
            "at scale")
    idx = {v: i for i, v in enumerate(verts)}
    w: dict[tuple[int, int], float] = {}
    for a, b, x in rows:
        i, j = sorted((idx[a], idx[b]))
        key = (i, j)
        w[key] = max(w.get(key, float("-inf")), float(x))
    # value = (cardinality, weight) when maxcardinality else (0, weight):
    # tuple comparison implements the reference's lexicographic objective
    from functools import lru_cache

    card = 1.0 if maxcardinality else 0.0

    @lru_cache(maxsize=None)
    def best(mask: int) -> tuple[float, float]:
        if mask == 0:
            return (0.0, 0.0)
        i = (mask & -mask).bit_length() - 1
        val = best(mask & ~(1 << i))          # i stays unmatched
        for j in range(i + 1, n):
            if mask & (1 << j) and (i, j) in w:
                sub = best(mask & ~(1 << i) & ~(1 << j))
                cand = (sub[0] + card, sub[1] + w[(i, j)])
                if cand > val:
                    val = cand
        return val

    # reconstruct by walking the DP decisions (values only are memoized)
    match = []
    mask = (1 << n) - 1
    while mask:
        i = (mask & -mask).bit_length() - 1
        val = best(mask)
        if best(mask & ~(1 << i)) == val:
            mask &= ~(1 << i)
            continue
        for j in range(i + 1, n):
            if mask & (1 << j) and (i, j) in w:
                sub = best(mask & ~(1 << i) & ~(1 << j))
                if (sub[0] + card, sub[1] + w[(i, j)]) == val:
                    match.append((i, j))
                    mask &= ~(1 << i) & ~(1 << j)
                    break
        else:  # pragma: no cover - unreachable by DP construction
            mask &= ~(1 << i)
    out = set()
    for i, j in match:
        a, b = verts[i], verts[j]
        out.add((a, b) if a < b else (b, a))
    return out


def max_weight_matching_approx(g: Graph, weight: str = WEIGHT,
                               max_rounds: int = 200) -> DataFrame:
    """(src, dst, weight): a matching of total weight ≥ ½ the optimum.

    Locally-dominant rounds (Preis 1999 / Manne–Bisseling 2007): an edge
    is matched iff its (weight, −hash) priority is the strict max at both
    endpoints; matched vertices leave the graph; repeat until no edges
    remain.  Every round at least one locally dominant edge exists, so
    the loop terminates; the ½ bound is the classic charging argument
    (each optimal edge shares an endpoint with a chosen edge of ≥ its
    weight)."""
    if g.directed:
        raise ValueError("max_weight_matching_approx is undirected-only")
    runner = SuperstepRunner(None, name="wmatching", keep_scratch=0)
    spark = g.edges.sparkSession
    wcol = (F.col(weight).cast("double") if weight in g.edges.columns
            else F.lit(1.0))
    e = (g.edges.filter(F.col(SRC) != F.col(DST))
         .select(SRC, DST, wcol.alias("_w"),
                 F.struct(wcol.alias("w"),
                          (-F.xxhash64(SRC, DST)).alias("tb")).alias("_pri")))
    matched = spark.createDataFrame([], e.select(SRC, DST, "_w").schema)
    try:
      with fixed_plan(spark):
        e = runner.cut(e)
        for _ in range(max_rounds):
            vmax = (e.select(F.col(SRC).alias(ID), "_pri")
                    .union(e.select(F.col(DST).alias(ID), "_pri"))
                    .groupBy(ID).agg(F.max("_pri").alias("_vm")))
            win = (e.join(vmax.withColumnRenamed(ID, SRC)
                          .withColumnRenamed("_vm", "_vs"), SRC)
                   .join(vmax.withColumnRenamed(ID, DST)
                         .withColumnRenamed("_vm", "_vd"), DST)
                   .filter((F.col("_pri") == F.col("_vs"))
                           & (F.col("_pri") == F.col("_vd")))
                   .select(SRC, DST, "_w"))
            matched = runner.cut(matched.unionByName(win))
            used = (matched.select(F.col(SRC).alias(ID))
                    .union(matched.select(F.col(DST).alias(ID))))
            obs = Observation()
            e = runner.cut(
                e.join(used.withColumnRenamed(ID, SRC), SRC, "anti")
                 .join(used.withColumnRenamed(ID, DST), DST, "anti")
                 .observe(obs, F.count(F.lit(1)).alias("m")))
            if int(obs.get["m"] or 0) == 0:
                return matched.withColumnRenamed("_w", "weight")
        raise RuntimeError("max_weight_matching_approx did not converge")
    finally:
        runner.close()


def is_matching(g: Graph, matching: DataFrame) -> bool:
    """True iff ``matching`` (src, dst rows) is a valid matching in g —
    real edges, no shared endpoints (reference ``matching.py:18``)."""
    m = matching.select(F.col(matching.columns[0]).cast("string").alias(SRC),
                        F.col(matching.columns[1]).cast("string").alias(DST))
    e = (g.symmetrized().select(F.col(SRC).cast("string").alias(SRC),
                                F.col(DST).cast("string").alias(DST)))
    if m.join(e, [SRC, DST], "anti").limit(1).count():
        return False                       # non-edge in the matching
    ends = m.select(F.col(SRC).alias(ID)).unionAll(
        m.select(F.col(DST).alias(ID)))
    return ends.groupBy(ID).count().filter("count > 1").limit(1).count() == 0


def is_maximal_matching(g: Graph, matching: DataFrame) -> bool:
    """True iff valid and no edge can be added (reference
    ``matching.py:147``): every graph edge touches a matched vertex."""
    if not is_matching(g, matching):
        return False
    m = matching.select(F.col(matching.columns[0]).cast("string").alias(SRC),
                        F.col(matching.columns[1]).cast("string").alias(DST))
    ends = (m.select(F.col(SRC).alias(ID))
            .unionAll(m.select(F.col(DST).alias(ID))).distinct())
    e = (g.edges.filter(F.col(SRC) != F.col(DST))
         .select(F.col(SRC).cast("string").alias(SRC),
                 F.col(DST).cast("string").alias(DST)))
    free = (e.join(ends.withColumnRenamed(ID, SRC), SRC, "anti")
            .join(ends.withColumnRenamed(ID, DST), DST, "anti"))
    return free.limit(1).count() == 0


def is_perfect_matching(g: Graph, matching: DataFrame) -> bool:
    """True iff valid and every vertex is matched (reference
    ``matching.py:214``)."""
    if not is_matching(g, matching):
        return False
    m = matching.select(F.col(matching.columns[0]).cast("string").alias(SRC),
                        F.col(matching.columns[1]).cast("string").alias(DST))
    ends = (m.select(F.col(SRC).alias(ID))
            .unionAll(m.select(F.col(DST).alias(ID))).distinct())
    verts = g.vertices().select(F.col(ID).cast("string").alias(ID))
    return verts.join(ends, ID, "anti").limit(1).count() == 0


def min_edge_cover(g: Graph, exact_threshold: int = 18) -> DataFrame:
    """(src, dst) rows of a minimum edge cover (reference
    ``covering.py:15``): a maximum matching extended so every vertex is
    covered — |cover| = n − |maximum matching|.

    Engine posture: the exact matching kernel below ``exact_threshold``
    vertices (true minimum, reference parity); above it the distributed
    locally-dominant maximal matching seeds the extension — still a valid
    cover, within |maximal − maximum| of the optimum, computed with no
    driver state.  Raises on isolated vertices like the reference."""
    if g.directed:
        raise ValueError("min_edge_cover is undirected-only "
                         "(reference matchings are undirected)")
    if g.isolates().limit(1).count():
        raise ValueError("Graph has a node with no edge incident on it, "
                         "so no edge cover exists. (reference "
                         "NetworkXException)")
    spark = g.edges.sparkSession
    n = g.number_of_vertices()
    if n <= exact_threshold:
        pairs = max_weight_matching(g, maxcardinality=True,
                                    max_vertices=exact_threshold)
        src_type = g.edges.schema[SRC].dataType.simpleString()
        rows = [(u, v) for u, v in pairs]
        if src_type != "string":
            rows = [(int(u), int(v)) for u, v in rows]
        m = spark.createDataFrame(rows or [(None, None)],
                                  f"src {src_type}, dst {src_type}")
        if not rows:
            m = m.limit(0)
    else:
        m = max_weight_matching_approx(g).select(SRC, DST)
    ends = (m.select(F.col(SRC).alias(ID))
            .unionByName(m.select(F.col(DST).alias(ID))).distinct())
    sym = (g.symmetrized().filter(F.col(SRC) != F.col(DST))
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")))
    ext = (g.vertices().join(ends, ID, "anti")
           .join(sym, ID)
           .groupBy(ID).agg(F.min("nbr").alias("nbr"))
           .select(F.least(ID, "nbr").alias(SRC),
                   F.greatest(ID, "nbr").alias(DST)))
    cover = (m.select(F.least(SRC, DST).alias(SRC),
                      F.greatest(SRC, DST).alias(DST))
             .unionByName(ext).distinct())
    return cover

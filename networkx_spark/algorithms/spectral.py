"""Spectral graph analysis — Fiedler vector, algebraic connectivity,
spectral bisection, by deflated power iteration on the Laplacian.

Reference: ``networkx/linalg/algebraicconnectivity.py:305``
(``algebraic_connectivity``), ``:406`` (``fiedler_vector``), and
``:475`` (``spectral_ordering``) — the reference shells out to
scipy/LOBPCG on a materialized sparse matrix.  A 10^10-vertex Laplacian
never materializes, so the engine uses the matrix-free formulation: the
operator x → (I − L/c)·x is ONE adjacency join + groupBy per step
(exactly the PageRank scatter shape), with c = 2·d_max ≥ λ_max(L) so the
iteration is a contraction.  The all-ones vector is the top eigenvector
(eigenvalue 1); starting from a mean-centered vector and staying
mean-centered, power iteration converges to the SECOND eigenpair — the
Fiedler vector, whose sign structure is the classic 2-way partition and
whose Rayleigh quotient estimates λ₂ (algebraic connectivity) from above.

Determinism: the start vector is a Weyl sequence over the vertex id
(pure integer arithmetic — engine-portable like walks.py's LCG), every
step divides by c (no norm aggregation needed, values stay O(1)), and
re-centering happens once at the end; the gate oracle unrolls the same
fixed number of steps in SQL.  Power iteration's convergence rate is
(c−λ₃)/(c−λ₂) per step — adequate for partition-quality use (signs
settle long before values); callers needing tight eigenvalues should
raise ``iterations``.

Scale posture: state is one (id, x) vector; the edge table is cached
pre-partitioned on the scatter key; each step shuffles only the vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID, WEIGHT
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _prep(g: Graph):
    if g.directed:
        raise ValueError("spectral analysis is defined for undirected graphs")
    adj = (g.symmetrized()
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"),
                   F.col(WEIGHT).cast("double").alias("w"))
           .filter(F.col(ID) != F.col("nbr")))
    deg = adj.groupBy(ID).agg(F.sum("w").alias("d"))
    return adj, deg


def _start_vector(verts: DataFrame) -> DataFrame:
    """Deterministic mean-free-ish start: a Weyl sequence on the vertex
    id, engine-portable integer arithmetic (mirrors the SQL oracle)."""
    x0 = ((F.col(ID).cast("long") * 2_654_435_761 + 1) % 1_000_003) \
        / 1_000_003.0 - 0.5
    return verts.select(ID, x0.alias("x"))


def fiedler_vector(g: Graph, iterations: int = 40) -> DataFrame:
    """(id, f): approximate Fiedler eigenvector after ``iterations``
    deflated power steps, mean-centered and sign-canonicalized (the entry
    of the minimum vertex id is made non-negative — eigenvectors are
    sign-ambiguous, reference ``fiedler_vector`` docstring)."""
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj, deg = _prep(g)
    # pre-partition on the join key: each step shuffles only the vector
    # into the cached adjacency, then the scatter groupBy re-keys on nbr
    adj = adj.repartition(n_part, ID).cache()
    c = 2.0 * (deg.agg(F.max("d")).first()[0] or 1.0)
    verts = g.vertices()
    deg = deg.cache()
    x = _start_vector(verts)
    mean = x.agg(F.avg("x")).first()[0]
    x = x.select(ID, (F.col("x") - F.lit(mean)).alias("x"))
    runner = SuperstepRunner(None, name="fiedler")
    try:
      with fixed_plan(spark):
        x = runner.cut(x)
        for _ in range(iterations):
            # (I - L/c) x  =  x - (d/c)·x + (A x)/c
            scat = (x.join(adj, ID)
                    .groupBy(F.col("nbr").alias(ID))
                    .agg(F.sum(F.col("x") * F.col("w")).alias("ax")))
            x = runner.cut(
                x.join(scat, ID, "left").join(deg, ID, "left")
                .select(ID, (F.col("x") * (1 - F.coalesce("d", F.lit(0.0)) / c)
                             + F.coalesce("ax", F.lit(0.0)) / c).alias("x")))
        stats = x.agg(F.avg("x").alias("m"),
                      F.min(F.struct(ID, "x")).alias("lo")).first()
        centered_lo = stats["lo"]["x"] - stats["m"]
        sgn = -1.0 if centered_lo < 0 else 1.0
        norm_row = (x.select(F.pow(F.col("x") - stats["m"], 2).alias("s"))
                    .agg(F.sqrt(F.sum("s")).alias("n")).first())
        nrm = norm_row["n"] or 1.0
        return x.select(ID, (F.lit(sgn) * (F.col("x") - stats["m"]) / nrm)
                        .alias("f"))
    finally:
        adj.unpersist()
        deg.unpersist()
        runner.close()


def algebraic_connectivity(g: Graph, iterations: int = 40) -> float:
    """Rayleigh-quotient estimate of λ₂ (an upper bound that tightens
    with ``iterations``): xᵀLx / xᵀx = Σ_edges w·(x_u − x_v)² / Σ x²
    over the Fiedler approximation (``algebraicconnectivity.py:305``)."""
    f = fiedler_vector(g, iterations=iterations)
    adj, _ = _prep(g)
    fu = f.select(F.col(ID), F.col("f").alias("_fu"))
    fv = f.select(F.col(ID).alias("nbr"), F.col("f").alias("_fv"))
    num = (adj.join(fu, ID).join(fv, "nbr")
           .agg((F.sum(F.col("w") * F.pow(F.col("_fu") - F.col("_fv"), 2)) / 2)
                .alias("n")).first()["n"]) or 0.0
    den = f.agg(F.sum(F.pow("f", 2))).first()[0] or 1.0
    return float(num / den)


def spectral_bisection(g: Graph, iterations: int = 40) -> DataFrame:
    """(id, side): two-way partition by Fiedler sign — the classic
    spectral bisection (side 0 = negative entries)."""
    return (fiedler_vector(g, iterations=iterations)
            .select(ID, (F.col("f") >= 0).cast("int").alias("side")))

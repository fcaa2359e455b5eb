"""Semi-supervised node classification — harmonic function and
local-and-global consistency label spreading.

Reference: ``networkx/algorithms/node_classification.py:32``
(``harmonic_function``, Zhu/Ghahramani/Lafferty 2003: F ← P·F + B with
P = D⁻¹A whose labeled rows are zeroed and B the one-hot seed matrix)
and ``:109`` (``local_and_global_consistency``, Zhou et al. 2004:
F ← α·D^-½AD^-½·F + (1−α)·B, no clamping).  Both run a fixed
``max_iter`` like the reference (no convergence test).

The distributed form keeps F SPARSE: one (id, label, p) row per nonzero
entry — after k iterations only vertices within k hops of a seed carry
rows, so the state is the diffusion frontier, not |V|·|classes|.  Each
iteration is one adjacency join + one (id, label) groupBy — the PageRank
scatter with a label column along for the ride.

Determinism: the reference assigns label column indices by first
appearance in node iteration order and breaks argmax ties toward the
lower index — an iteration-order artifact.  Here prediction is
(max p, then MIN label value), and unlabeled vertices no seed ever
reaches get NULL rather than the reference's arbitrary first label.
Everything else matches the recurrence exactly, and the gate oracle
replays it unrolled in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID, WEIGHT
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _spread(g: Graph, seeds: DataFrame, max_iter: int,
            mode: str, alpha: float) -> DataFrame:
    if g.directed:
        raise ValueError("node classification is defined for undirected "
                         "graphs (reference @not_implemented_for('directed'))")
    if seeds.isEmpty():
        raise ValueError("No node on the input graph is labeled "
                         "(reference NetworkXError)")
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (g.symmetrized()
           .select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"),
                   F.col(WEIGHT).cast("double").alias("w")))
    deg = adj.groupBy(ID).agg(F.sum("w").alias("d"))
    if mode == "harmonic":
        # P = D^-1 A, receiver-normalized: weight edge u->v by 1/d(v)
        dv = deg.select(F.col(ID).alias("nbr"), F.col("d").alias("_dv"))
        prop = (adj.join(dv, "nbr")
                .select(ID, "nbr", (F.col("w") / F.col("_dv")).alias("w")))
    else:
        # P = D^-1/2 A D^-1/2, symmetric normalization, scaled by alpha
        du = deg.select(ID, F.sqrt("d").alias("_su"))
        dv = deg.select(F.col(ID).alias("nbr"), F.sqrt("d").alias("_sv"))
        prop = (adj.join(du, ID).join(dv, "nbr")
                .select(ID, "nbr",
                        (F.lit(alpha) * F.col("w")
                         / (F.col("_su") * F.col("_sv"))).alias("w")))
    prop = prop.repartition(n_part, ID).cache()
    seed_f = seeds.select(ID, F.col("label"),
                          F.lit(1.0 if mode == "harmonic" else 1.0 - alpha)
                          .alias("p")).cache()
    seed_ids = seed_f.select(ID)
    runner = SuperstepRunner(None, name="nodeclass")
    try:
      with fixed_plan(spark):
        # the reference starts from F = 0, so its first iteration yields
        # exactly B — our initial state; run max_iter - 1 spread rounds
        if max_iter < 1:
            raise ValueError("max_iter must be >= 1")
        state = runner.cut(seed_f)
        for _ in range(max_iter - 1):
            spread = (state.join(prop, ID)
                      .groupBy(F.col("nbr").alias(ID), F.col("label"))
                      .agg(F.sum(F.col("p") * F.col("w")).alias("p")))
            if mode == "harmonic":
                # zeroed labeled rows of P + B: seeds are clamped to the
                # one-hot, everyone else takes the neighbor average
                state = runner.cut(
                    spread.join(seed_ids, ID, "anti").unionByName(seed_f))
            else:
                state = runner.cut(
                    spread.unionByName(seed_f)
                    .groupBy(ID, "label").agg(F.sum("p").alias("p")))
        return state
    finally:
        prop.unpersist()
        seed_f.unpersist()
        runner.close()


def harmonic_scores(g: Graph, seeds: DataFrame, max_iter: int = 30
                    ) -> DataFrame:
    """(id, label, p): the sparse F matrix after ``max_iter`` clamped
    averaging rounds (``node_classification.py:101-102``)."""
    return _spread(g, seeds, max_iter, "harmonic", 0.0)


def _argmax(f: DataFrame) -> DataFrame:
    """(id, label): max p then MIN label — label-type-agnostic (works for
    string labels, where a negation trick would not)."""
    mx = f.groupBy(ID).agg(F.max("p").alias("_mp"))
    return (f.join(mx, ID).filter(F.col("p") == F.col("_mp"))
            .groupBy(ID).agg(F.min("label").alias("label")))


def harmonic_function(g: Graph, seeds: DataFrame, max_iter: int = 30
                      ) -> DataFrame:
    """(id, label): argmax prediction for every vertex a seed reaches
    (deterministic tie-break: max p, then min label)."""
    return _argmax(harmonic_scores(g, seeds, max_iter=max_iter))


def local_and_global_consistency(g: Graph, seeds: DataFrame,
                                 alpha: float = 0.99, max_iter: int = 30
                                 ) -> DataFrame:
    """(id, label): Zhou et al. label spreading
    (``node_classification.py:109``), same sparse machinery with
    symmetric normalization and additive (1−α)-weighted seeds."""
    return _argmax(_spread(g, seeds, max_iter, "lgc", alpha))

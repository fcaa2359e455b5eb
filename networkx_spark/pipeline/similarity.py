"""Similarity search over an embedding column (``array<float>``).

Three tiers:

* :func:`cosine_topk` — brute-force DataFrame expression (zip_with dot
  product), exact, SQL-twinned for the oracle.  O(N·Q); the baseline.
* :func:`cosine_topk_numpy` — same answer via ``mapInPandas``: each Arrow
  batch becomes one numpy matrix multiplied against the broadcast query
  block.  This is the single-node-fast path and the per-partition kernel
  the IVF/LSH tiers reuse.
* :func:`lsh_topk` — random-hyperplane bucketing: probes only buckets whose
  sign-sketch matches the query's, turning O(N·Q) into O(N·Q/2^bits) at
  recall < 1.  The scale path for 10⁹+ vectors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HYPERPLANE_SEED = 42


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_pairs(emb: DataFrame, queries: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, vec_id, cosine) for every (query, vector) pair — exact,
    all-JVM.  ``queries`` is expected to be small (it is broadcast)."""
    e = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    return (e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id",
                    (_dot(F.col("v"), F.col("qv"))
                     / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cosine")))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbours per query; deterministic tie-break by vec_id."""
    pairs = cosine_pairs(emb, queries, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rk"))


def cosine_topk_numpy(emb: DataFrame, queries: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Same result as :func:`cosine_topk` via per-partition numpy matmul:
    partial top-k inside each Arrow batch, global top-k by one tiny window.
    The shuffled data is k rows per (partition, query) — not N·Q."""
    spark = emb.sparkSession
    qrows = queries.select(F.col(id_col).alias("qid"),
                           F.col(vec_col).alias("qv")).collect()
    qids = np.array([r["qid"] for r in qrows])
    qmat = np.array([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qnorm = np.linalg.norm(qmat, axis=1)
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, qmat, qnorm = bq.value
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            m = np.vstack(pdf[vec_col].to_numpy())
            sims = (m @ qmat.T) / (np.linalg.norm(m, axis=1)[:, None] * qnorm[None, :])
            out = []
            for j, qid in enumerate(qids):
                col = sims[:, j].copy()
                col[ids == qid] = -np.inf
                top = min(k, len(ids))
                idx = np.argpartition(-col, top - 1)[:top]
                out.append(pd.DataFrame({
                    "query_id": qid, "vec_id": ids[idx], "cosine": col[idx]}))
            yield pd.concat(out) if out else pd.DataFrame(
                columns=["query_id", "vec_id", "cosine"])

    partial = emb.select(id_col, vec_col).mapInPandas(
        part, schema="query_id long, vec_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (partial.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rk"))


def hyperplane_sketch(emb: DataFrame, bits: int = 8, dim: int | None = None,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket): sign sketch against ``bits`` fixed random
    hyperplanes (seeded, deterministic)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(HYPERPLANE_SEED)
    planes = rng.standard_normal((bits, dim))
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for b in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bucket = bucket + F.when(_dot(v, plane) > 0,
                                 F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return emb.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5, bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's
    hyperplane bucket — the bucketing prunes the candidate set ~2^bits×."""
    sk = hyperplane_sketch(emb, bits, id_col=id_col, vec_col=vec_col)
    e = (emb.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
         .join(sk, "vec_id"))
    qsk = hyperplane_sketch(queries, bits, id_col=id_col, vec_col=vec_col)
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .join(qsk.withColumnRenamed("vec_id", "query_id"), "query_id"))
    pairs = (e.join(F.broadcast(q), "bucket")
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     (_dot(F.col("v"), F.col("qv"))
                      / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rk"))


def embedding_near_duplicates(emb: DataFrame, threshold: float = 0.95,
                              bits: int = 8, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              max_bucket_size: int | None = 10_000
                              ) -> DataFrame:
    """(a, b, cosine) pairs above ``threshold`` — embedding-cosine near-dup
    detection, bucketed by hyperplane sketch (near-identical vectors land in
    the same bucket with high probability).  Sketch buckets larger than
    ``max_bucket_size`` are dropped with a logged warning — a degenerate
    corpus (e.g. millions of zero/constant vectors collapsing into one
    bucket) must not trigger a quadratic self-join; ``None`` disables."""
    from networkx_spark.pipeline.dedup import _guard_hot_buckets

    sk = hyperplane_sketch(emb, bits, id_col=id_col, vec_col=vec_col)
    e = (emb.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
         .join(sk, "vec_id"))
    e = _guard_hot_buckets(e, ["bucket"], max_bucket_size,
                           "embedding_near_duplicates")
    pairs = (e.select("bucket", F.col("vec_id").alias("a"), F.col("v").alias("va"))
             .join(e.select("bucket", F.col("vec_id").alias("b"), F.col("v").alias("vb")),
                   "bucket")
             .filter(F.col("a") < F.col("b"))
             .select("a", "b",
                     (_dot(F.col("va"), F.col("vb"))
                      / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine")))
    return pairs.filter(F.col("cosine") >= threshold)


# ----------------------------------------------------------------- IVF tier
def ivf_centroids(emb: DataFrame, n_centroids: int = 16,
                  lloyd_iters: int = 0, seed: int = HYPERPLANE_SEED,
                  id_col: str = "vec_id", vec_col: str = "embedding"
                  ) -> DataFrame:
    """(cid, cv) — IVF coarse centroids.

    Initial centroids are a seeded deterministic sample (the
    ``n_centroids`` vectors with the smallest ``xxhash64(id, seed)`` —
    TakeOrderedAndProject, no global shuffle), optionally refined by
    ``lloyd_iters`` k-means steps (assign + per-cluster mean; each step
    is one broadcast join + one groupBy, fully deterministic).  Empty
    clusters keep their previous centroid."""
    e = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    cents = (e.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)))
             .limit(n_centroids)
             .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")))
    for _ in range(lloyd_iters):
        asn = ivf_assign(e.withColumnRenamed("v", vec_col), cents,
                         id_col="vec_id", vec_col=vec_col)
        # element-wise cluster mean via posexplode + positional re-assembly
        means = (e.join(asn, "vec_id")
                 .select("cid", F.posexplode("v").alias("pos", "x"))
                 .groupBy("cid", "pos").agg(F.avg("x").alias("m"))
                 .groupBy("cid")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                 .select("cid", F.transform("pm", lambda s: s["m"]).alias("cv")))
        cents = (cents.select("cid").join(means, "cid", "left")
                 .join(cents.withColumnRenamed("cv", "_old"), "cid")
                 .select("cid", F.coalesce("cv", "_old").alias("cv")))
    return cents


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """(vec_id, cid) — nearest centroid by cosine, deterministic
    (ties → smallest cid).  One broadcast cross join + one max_by
    aggregation; cost C dot products per vector, all JVM-side."""
    e = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    c = centroids.select("cid", F.col("cv").cast("array<double>").alias("cv"))
    sims = (e.crossJoin(F.broadcast(c))
            .select("vec_id", "cid",
                    (_dot(F.col("v"), F.col("cv"))
                     / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("sim")))
    return (sims.groupBy("vec_id")
            .agg(F.max_by("cid", F.struct(F.col("sim"),
                                          -F.col("cid"))).alias("cid")))


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             centroids: DataFrame | None = None, n_centroids: int = 16,
             n_probe: int = 4, lloyd_iters: int = 0,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: assign the corpus to IVF buckets once, probe
    each query's ``n_probe`` nearest centroids, exact cosine only within
    the probed buckets.  Candidate cost O(N·Q·n_probe/C) vs the brute
    tier's O(N·Q); the inverted lists are the industry-standard IVF-flat
    layout (one hash shuffle on cid)."""
    if centroids is None:
        centroids = ivf_centroids(emb, n_centroids, lloyd_iters,
                                  id_col=id_col, vec_col=vec_col)
    centroids = centroids.cache()
    asn = ivf_assign(emb, centroids, id_col, vec_col)
    e = (emb.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
         .join(asn, "vec_id"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = centroids.select("cid", F.col("cv").cast("array<double>").alias("cv"))
    qprobe = (q.crossJoin(F.broadcast(c))
              .select("query_id", "cid",
                      (_dot(F.col("qv"), F.col("cv"))
                       / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (qprobe.withColumn("_r", F.row_number().over(wq))
              .filter(F.col("_r") <= n_probe).select("query_id", "cid"))
    cand = e.join(F.broadcast(probes), "cid")
    pairs = (cand.join(F.broadcast(q), "query_id")
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     (_dot(F.col("v"), F.col("qv"))
                      / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rk"))

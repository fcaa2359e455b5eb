"""Document deduplication for large-scale training-data pipelines.

Not part of the reference library (NetworkX has no document layer) — these
are the engine-level operations a Common-Crawl-scale corpus needs before
graph extraction, built Spark-first:

* **exact**: hash-groupBy on ``md5(text)`` — one shuffle.
* **MinHash + LSH**: word shingles → k independent 31-bit affine hashes →
  per-doc signature → banded bucket join → candidate pairs → exact Jaccard
  verify.  Only the banded join shuffles pair data; the signature build is
  one groupBy.
* **SimHash**: 64-bit majority fingerprint; near-dup = small Hamming
  distance.
* **n-gram Jaccard**: exact pairwise similarity via a shingle-equijoin —
  quadratic in bucket size, used as the verifier behind LSH candidates (or
  standalone on small corpora).

Every hash here is engine-portable arithmetic (md5-prefix → 60-bit int,
affine mod 2³¹−1) so DuckDB can run the identical computation as the
correctness oracle.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

MERSENNE31 = (1 << 31) - 1
_M64 = (1 << 64) - 1

# legacy fixed 8-pair table (round ≤ 4 goldens); new code derives wider
# constant sets from a seed via minhash_ab()
MINHASH_AB = [
    (1203114875, 613423303), (1589400307, 907716109), (600017753, 1394484313),
    (368374639, 1840116257), (931675355, 279855217), (1653689561, 1989231199),
    (1723403349, 132995269), (484882573, 1326009343),
]


def _splitmix64(x: int) -> int:
    """Scalar splitmix64 finalizer (same mix as generators._splitmix64)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def minhash_ab(num_hashes: int = 64, seed: int = 0) -> list[tuple[int, int]]:
    """``num_hashes`` seed-derived affine pairs (a, b) mod 2³¹−1, a ≥ 1.

    Pure arithmetic on both engines, so the DuckDB oracle regenerates the
    identical constants (``entry_queries._minhash_sql``).  At threshold 0.8
    the default 64 hashes / 16×4 banding gives candidate recall
    1−(1−s⁴)¹⁶ ≈ 0.9998 at s = 0.8, vs ~0.39 for the old fixed 8/4×2."""
    out = []
    for i in range(num_hashes):
        base = (seed & _M64) * 0x9E3779B97F4A7C15 + (i + 1) * 0x100000001B3
        a = _splitmix64(base & _M64) % (MERSENNE31 - 1) + 1
        b = _splitmix64((base + 0x632BE59BD9B4E019) & _M64) % MERSENNE31
        out.append((a, b))
    return out


DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16           # 64 hashes → 16 bands × 4 rows
DEFAULT_MAX_BUCKET = 1_000   # hot-bucket guard on banded self-joins


def _norm_text(col):
    """lower + collapse whitespace — shared normalization (portable SQL:
    ``regexp_replace(lower(text), '\\s+', ' ')``)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, content_hash): canonical = min doc_id sharing
    the exact (normalized) text.  Rows with canonical_id != doc_id are the
    droppable duplicates."""
    h = docs.select(F.col(id_col).alias("doc_id"),
                    F.md5(_norm_text(F.col(text_col))).alias("content_hash"))
    canon = h.groupBy("content_hash").agg(F.min("doc_id").alias("canonical_id"))
    return (h.join(canon, "content_hash")
            .select("doc_id", "canonical_id", "content_hash"))


def shingles(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word k-grams of the normalized text.
    Built with JVM-side array functions (no Python in the hot path):
    split → sliding window via transform over index sequence."""
    # empty/whitespace-only docs are excluded (Spark's split('', ' ') yields
    # [''], which would fabricate a "" shingle; the SQL oracle filters
    # ``trim(text) <> ''`` — keep both sides identical)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _norm_text(F.col(text_col)).alias("_n")).filter(
        F.col("_n") != "").select(
        "doc_id", F.split(F.col("_n"), " ").alias("_t"))
    # guard: sequence(0, -1) would DESCEND in Spark, so short docs (< k
    # tokens) must map to an empty array explicitly
    expr = (f"CASE WHEN size(_t) >= {k} THEN "
            f"transform(sequence(0, size(_t) - {k}), "
            f"i -> array_join(slice(_t, i + 1, {k}), ' ')) "
            f"ELSE array() END")
    return (toks.select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
            .distinct())


def shingle_hashes(sh: DataFrame) -> DataFrame:
    """(doc_id, h): 60-bit integer per shingle — md5 prefix, portable."""
    return sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h"))


def minhash_signatures(docs: DataFrame, k: int = 3,
                       num_hashes: int = DEFAULT_NUM_HASHES,
                       seed: int = 0,
                       ab: list[tuple[int, int]] | None = None) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}): column-per-hash signature (column layout
    keeps the band join free of array serde).  Constants are seed-derived
    (:func:`minhash_ab`); pass ``ab`` explicitly to pin a legacy table."""
    if ab is None:
        ab = minhash_ab(num_hashes, seed)
    hs = shingle_hashes(shingles(docs, k))
    base = hs.withColumn("hm", F.col("h") % F.lit(MERSENNE31))
    aggs = [
        F.min((F.lit(a) * F.col("hm") + F.lit(b)) % F.lit(MERSENNE31)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(ab[:num_hashes])
    ]
    return base.groupBy("doc_id").agg(*aggs)


def _guard_hot_buckets(buckets: DataFrame, keys: list[str],
                       max_bucket_size: int | None, what: str) -> DataFrame:
    """Drop buckets larger than ``max_bucket_size`` before a per-bucket
    self-join (a degenerate corpus — e.g. thousands of boilerplate docs
    with identical signatures — would otherwise emit B² pairs from one
    bucket).  Never silent: dropped buckets are counted and logged.  Docs
    in a dropped bucket can still pair through their other bands, and
    identical texts are caught upstream by exact_duplicates."""
    if max_bucket_size is None:
        return buckets
    sizes = buckets.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    hot = sizes.filter(F.col("_bsz") > max_bucket_size).cache()
    stats = hot.agg(F.count(F.lit(1)).alias("n"),
                    F.max("_bsz").alias("mx"),
                    F.sum("_bsz").alias("rows")).collect()[0]
    if stats["n"]:
        log.warning(
            "%s: dropped %d hot bucket(s) (> %d members, largest %d, "
            "%d member rows total) from candidate generation; pairs inside "
            "them are NOT emitted — raise max_bucket_size or dedup exact "
            "duplicates first if that recall matters",
            what, stats["n"], max_bucket_size, stats["mx"], stats["rows"])
        return buckets.join(hot.select(*keys), keys, "anti")
    hot.unpersist()
    return buckets


def lsh_candidate_pairs(sig: DataFrame, bands: int = DEFAULT_BANDS,
                        max_bucket_size: int | None = DEFAULT_MAX_BUCKET
                        ) -> DataFrame:
    """(a, b) candidate pairs (a < b) sharing at least one LSH band.

    Bands are unioned, then pairs come from a self-join per bucket — the
    classic band trick.  Buckets larger than ``max_bucket_size`` (default
    1000) are dropped with a logged warning instead of joining
    quadratically; ``None`` disables the guard (exact oracle twin)."""
    n = len([c for c in sig.columns if c.startswith("mh_")])
    rows_per_band = n // bands
    # ONE pass over the signature: a per-band union would recompute the
    # 64-aggregation signature plan once per band (measured 16x blowup);
    # explode emits all band keys from a single scan, cached because the
    # guard + both join sides read it
    bk = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("_", *[
                     f"mh_{b * rows_per_band + r}"
                     for r in range(rows_per_band)]).alias("key"))
        for b in range(bands)])
    buckets = (sig.select("doc_id", F.explode(bk).alias("_bk"))
               .select("doc_id", "_bk.band", "_bk.key").cache())
    buckets = _guard_hot_buckets(buckets, ["band", "key"], max_bucket_size,
                                 "lsh_candidate_pairs")
    left = buckets.select("band", "key", F.col("doc_id").alias("a"))
    right = buckets.select("band", "key", F.col("doc_id").alias("b"))
    return (left.join(right, ["band", "key"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.0,
                  candidates: DataFrame | None = None,
                  max_shingle_df: int | None = None) -> DataFrame:
    """(a, b, jaccard): exact word-k-gram Jaccard.

    * ``candidates`` given (the LSH scale path): intersections are computed
      **candidate-first** — ``cand ⋈ shingles(a) ⋈ shingles(b) ON (b,
      shingle)`` — so cost is O(Σ candidate-pair shingles), never the
      all-pairs shingle self-join.  A corpus-wide common shingle cannot
      cause quadratic fan-out here.
    * no candidates (small corpora / standalone use): the shingle
      equijoin, which IS quadratic in per-shingle document frequency.
      ``max_shingle_df`` caps it by dropping shingles shared by more than
      that many documents from the *pairing* step (union sizes still count
      them, so reported Jaccard is a lower bound for affected pairs); the
      default ``None`` keeps exact semantics for oracle comparison.
    """
    sh = shingles(docs, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if candidates is not None:
        cand = candidates.select("a", "b")
        inter = (cand
                 .join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
                 .join(sh.select(F.col("doc_id").alias("b"), "shingle"),
                       ["b", "shingle"]))
    else:
        pair_sh = sh
        if max_shingle_df is not None:
            hot = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
                   .filter(F.col("_df") > max_shingle_df).select("shingle"))
            pair_sh = sh.join(hot, "shingle", "anti")
        inter = (pair_sh.select(F.col("doc_id").alias("a"), "shingle")
                 .join(pair_sh.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
                 .filter(F.col("a") < F.col("b")))
    inter = inter.groupBy("a", "b").agg(F.count("*").alias("inter"))
    out = (inter
           .join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
           .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
           .select("a", "b",
                   (F.col("inter") /
                    (F.col("sa") + F.col("sb") - F.col("inter"))).alias("jaccard")))
    return out.filter(F.col("jaccard") >= threshold)


def near_duplicates_minhash(docs: DataFrame, k: int = 3, threshold: float = 0.8,
                            bands: int = DEFAULT_BANDS,
                            num_hashes: int = DEFAULT_NUM_HASHES,
                            seed: int = 0,
                            max_bucket_size: int | None = DEFAULT_MAX_BUCKET
                            ) -> DataFrame:
    """LSH candidates verified by exact Jaccard — the full scale pipeline."""
    cand = lsh_candidate_pairs(minhash_signatures(docs, k, num_hashes, seed),
                               bands, max_bucket_size)
    return jaccard_pairs(docs, k, threshold, candidates=cand)


def simhash(docs: DataFrame, k: int = 1) -> DataFrame:
    """(doc_id, simhash): 64-bit majority fingerprint over shingle hashes.

    Bit b is 1 iff more shingle hashes have bit b set than unset; computed
    by exploding bit positions (64 rows per shingle — JVM-side sequence,
    one aggregation).  The low 32 bits vote on the first md5-prefix hash
    (chars 1-15), the high 32 on an independent second prefix (chars
    17-31) — both portable to the SQL oracle.  64 bits (vs the earlier 32)
    gives birthday-collision headroom at 10¹²-document scale: P(any two of
    10¹² random fingerprints collide exactly) is ~2⁻²⁴ per pair band at
    64-bit vs near-certain at 32-bit."""
    sh = shingles(docs, k)
    hs = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h"),
        F.conv(F.substring(F.md5("shingle"), 17, 15), 16, 10).cast("long").alias("h2"))
    bits = (hs.select("doc_id", "h", "h2",
                      F.explode(F.expr("sequence(0, 63)")).alias("b"))
            .select("doc_id", "b",
                    F.expr("CASE WHEN (CASE WHEN b < 32 THEN shiftright(h, b) "
                           "ELSE shiftright(h2, b - 32) END & 1) = 1 "
                           "THEN 1 ELSE -1 END").alias("s")))
    votes = bits.groupBy("doc_id", "b").agg(F.sum("s").alias("v"))
    return (votes.groupBy("doc_id")
            .agg(F.sum(F.expr("CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END"))
                 .alias("simhash")))


N_SIMHASH_BANDS = 8  # 64-bit fingerprint → 8 byte-bands


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            k: int = 1,
                            max_bucket_size: int | None = DEFAULT_MAX_BUCKET
                            ) -> DataFrame:
    """(a, b, hamming) pairs with Hamming distance ≤ ``max_hamming``.

    Candidate generation blocks on 8 byte-bands of the 64-bit fingerprint:
    two fingerprints within Hamming distance d ≤ 7 must agree exactly on
    ≥ 8 − d bands, so any ``max_hamming`` ≤ 7 is recall-lossless here.
    Byte-band buckets above ``max_bucket_size`` are dropped with a logged
    warning (see :func:`lsh_candidate_pairs`)."""
    if max_hamming > N_SIMHASH_BANDS - 1:
        raise ValueError(f"max_hamming > {N_SIMHASH_BANDS - 1} would lose "
                         "recall with byte-band blocking")
    sig = simhash(docs, k).cache()
    bands = None
    for i in range(N_SIMHASH_BANDS):
        p = sig.select("doc_id", F.lit(i).alias("band"),
                       F.shiftright("simhash", i * 8).bitwiseAND(F.lit(255)).alias("key"))
        bands = p if bands is None else bands.unionByName(p)
    bands = _guard_hot_buckets(bands, ["band", "key"], max_bucket_size,
                               "simhash_near_duplicates")
    cand = (bands.select("band", "key", F.col("doc_id").alias("a"))
            .join(bands.select("band", "key", F.col("doc_id").alias("b")), ["band", "key"])
            .filter(F.col("a") < F.col("b")).select("a", "b").distinct())
    pairs = (cand
             .join(sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha")), "a")
             .join(sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb")), "b")
             .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))))
    return (pairs.filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


def duplicate_clusters(docs: DataFrame, k: int = 3, threshold: float = 0.8,
                       bands: int = DEFAULT_BANDS,
                       id_col: str = "doc_id",
                       num_hashes: int = DEFAULT_NUM_HASHES,
                       seed: int = 0,
                       max_bucket_size: int | None = DEFAULT_MAX_BUCKET
                       ) -> DataFrame:
    """(doc_id, cluster, keep): transitive near-duplicate clusters — the
    end-to-end dedup pipeline a training-data build runs.

    MinHash-LSH candidates → exact-Jaccard verification (≥ ``threshold``)
    → connected components over the verified pair graph (near-duplication
    is not transitive, so cluster = CC is the standard closure) →
    ``cluster`` = the component's minimum doc id, ``keep`` = true for that
    canonical representative only.  Docs with no near-duplicate are their
    own singleton cluster with ``keep`` = true.

    Scale posture: every stage is the bucketed path (banded LSH self-join,
    candidate-first verification, hash-min CC whose superstep count is the
    near-dup cluster diameter — tiny in practice); nothing is quadratic in
    corpus size.
    """
    from networkx_spark.algorithms.components import connected_components
    from networkx_spark.graph import Graph

    pairs = near_duplicates_minhash(docs, k=k, threshold=threshold,
                                    bands=bands, num_hashes=num_hashes,
                                    seed=seed, max_bucket_size=max_bucket_size)
    g = Graph.from_edges(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        directed=False)
    labels = connected_components(g)       # (id, component) = min id in CC
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", F.col("doc_id")).alias("cluster"))
            .withColumn("keep", F.col("doc_id") == F.col("cluster")))

"""Corpus-curation operators for training-data pipelines — n-gram
vocabulary building, benchmark decontamination, deterministic sampling,
and PII redaction.

Like :mod:`networkx_spark.pipeline.text`, everything here is JVM-side
column math (regex + explode + hash groupBy) so it stays inside
whole-stage codegen over a 10¹²-row corpus, and every operator has an
exact ANSI-SQL twin for the DuckDB oracle:

- word n-grams are built by a self-join of (doc_id, word, position)
  exploded tokens — in Spark via ``posexplode``; the oracle uses
  ``unnest ... WITH ORDINALITY`` and the same offset join, so both
  engines materialize byte-identical n-gram strings;
- deterministic sampling compares md5 hex digests lexicographically
  against a rate-derived hex threshold — md5 of the same bytes is the
  same string in every engine, so the sample is reproducible across
  Spark, DuckDB, and any future backend with no RNG state;
- PII regexes are restricted to the common Java-regex ∩ RE2 dialect
  (character classes, ``{m,n}`` bounds, ``\\b``) so Spark's
  ``regexp_replace`` and DuckDB's produce identical redacted bytes.

Scale posture: n-gram construction is one explode + one equi-join on
(doc_id, position) — co-partitioned by doc_id, no skew beyond document
length; vocabulary top-k is a partial-aggregated count + per-partition
top-k (TakeOrderedAndProject); decontamination is a semi-join on the
n-gram hash where the benchmark side is tiny and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative email/phone patterns valid in BOTH Java regex and RE2
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"


def _words(text_col: str):
    """Normalized word array: lowercase, non-alphanumerics → space, split
    on whitespace runs, empties dropped (mirrors the oracle's
    ``string_split_regex(trim(...), '\\s+')``)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    return F.split(F.trim(norm), r"\s+")


def word_ngrams(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, ngram): every word n-gram of every document, one row per
    occurrence.  Built as a positional self-join of exploded tokens so the
    oracle (``unnest WITH ORDINALITY`` + offset join) is byte-identical.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = (docs.select(F.col(id_col).alias("doc_id"),
                     F.posexplode(_words(text_col)).alias("pos", "w"))
         .filter(F.col("w") != ""))
    out = w.select("doc_id", F.col("pos"), F.col("w").alias("g"))
    for i in range(1, n):
        nxt = w.select("doc_id", (F.col("pos") - i).alias("pos"),
                       F.col("w").alias(f"w{i}"))
        out = out.join(nxt, ["doc_id", "pos"])
        out = out.withColumn("g", F.concat_ws(" ", "g", f"w{i}")).drop(f"w{i}")
    return out.select("doc_id", F.col("g").alias("ngram"))


def ngram_vocabulary(docs: DataFrame, n: int = 2, top_k: int = 50,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(ngram, n_docs, n_occurrences): the corpus's ``top_k`` most frequent
    word n-grams — vocabulary building for tokenizer training.  Count
    descending, then ngram ascending (deterministic tie-break); top-k via
    ``orderBy().limit()`` = TakeOrderedAndProject (per-partition top-k,
    never a single-partition global window)."""
    grams = word_ngrams(docs, n=n, id_col=id_col, text_col=text_col)
    counts = (grams.groupBy("ngram")
              .agg(F.countDistinct("doc_id").alias("n_docs"),
                   F.count(F.lit(1)).alias("n_occurrences")))
    return counts.orderBy(F.desc("n_occurrences"), F.asc("ngram")).limit(top_k)


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_id_col: str = "doc_id",
                  bench_text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits, n_bench_docs): training documents sharing at least
    one word ``n``-gram with any benchmark document — the standard
    exact-substring decontamination pass (GPT-3/PaLM-style 8-13-gram
    overlap).  ``n_hits`` counts distinct contaminated n-grams, and
    ``n_bench_docs`` counts distinct benchmark documents hit.

    The benchmark side (eval sets: thousands of docs, not billions) is
    deduplicated to distinct n-grams and broadcast, so the pass over the
    corpus is one broadcast semi-join — no shuffle of the big side."""
    train = word_ngrams(docs, n=n, id_col=id_col, text_col=text_col)
    bench = (word_ngrams(benchmark, n=n, id_col=bench_id_col,
                         text_col=bench_text_col)
             .select(F.col("doc_id").alias("bench_id"), "ngram")
             .distinct())
    hits = train.join(F.broadcast(bench), "ngram")
    return (hits.groupBy("doc_id")
            .agg(F.countDistinct("ngram").alias("n_hits"),
                 F.countDistinct("bench_id").alias("n_bench_docs")))


def hash_sample(docs: DataFrame, rate: float, salt: str = "nxs",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic ``rate``-fraction sample: keep a row iff
    ``md5(salt || ':' || id)`` is lexicographically below the rate's hex
    threshold.  No RNG state: the same (salt, id) is in or out of the
    sample on every engine, every run, every partitioning — which is what
    a reproducible training-data pipeline needs (and what
    ``df.sample(fraction)`` cannot give across engines)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    scaled = int(round(rate * 16 ** 8))
    # rate == 1.0 would need a 9-hex-char threshold, which breaks the
    # 8-char lexicographic compare — "g" sorts above every hex digit
    threshold = "g" if scaled >= 16 ** 8 else format(scaled, "08x")
    digest = F.md5(F.concat(F.lit(salt + ":"),
                            F.col(id_col).cast("string")))
    return docs.filter(F.substring(digest, 1, 8) < F.lit(threshold))


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, redacted_fp): scrub emails and
    phone-shaped numbers, replacing them with fixed tokens; returns the
    match counts plus the md5 of the redacted text (the fingerprint makes
    the oracle byte-exact without shipping full documents through the
    compare).  Patterns live in the Java-regex ∩ RE2 dialect."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), F.lit(PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"))


def segment_document_frequency(docs: DataFrame, delimiter: str = "\n",
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """(segment, df) — corpus document frequency of every non-blank text
    segment (lines by default; '\\n\\n' = paragraphs, ' ' = tokens).

    The segment-level analogue of the CCNet / RefinedWeb line-dedup
    stage: boilerplate lines (nav bars, cookie banners) recur across
    many pages and are identified purely by exact-match document
    frequency.  One explode + one hash groupBy — whole-stage codegen,
    no Python.  Net-new (training-data layer); no reference analogue.
    """
    import re as _re
    seg = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), _re.escape(delimiter)))
        .alias("segment"))
    return (seg.filter(F.trim("segment") != "")
            .groupBy("segment")
            .agg(F.count_distinct(id_col).alias("df")))


def remove_duplicate_segments(docs: DataFrame, min_df: int = 2,
                              delimiter: str = "\n", id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Documents with corpus-frequent segments removed, order preserved.

    Every segment whose document frequency ≥ ``min_df`` is dropped from
    every document (blank segments are never dropped); remaining
    segments are rejoined with the same delimiter, preserving order.
    Returns the input schema with ``text`` rewritten (possibly '').

    Scale: the frequent-segment set is usually tiny relative to the
    corpus (boilerplate follows a power law), so the anti-join is
    hash-partitioned on the segment — the same shuffle envelope as the
    df count itself; reassembly groups by doc_id, co-partitioned with
    the explode.
    """
    import re as _re
    pat = _re.escape(delimiter)
    seg = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat))
        .alias("pos", "segment"))
    dup = (segment_document_frequency(docs, delimiter, id_col, text_col)
           .filter(F.col("df") >= min_df).select("segment"))
    kept = seg.join(dup, "segment", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "segment"))),
                       lambda x: x["segment"]),
                   delimiter).alias("_new_text")))
    others = [c for c in docs.columns if c != text_col]
    return (docs.join(rebuilt, id_col, "left")
            .select(*others,
                    F.coalesce("_new_text", F.lit("")).alias(text_col)))

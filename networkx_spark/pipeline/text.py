"""Text analysis operators for training-data curation — language ID,
quality scoring, token counting, fingerprinting.

All JVM-side column expressions (regex + arithmetic), no Python UDFs: these
run over every document of a 10¹²-row corpus, so they must stay inside
whole-stage codegen.  Each has an exact ANSI-SQL twin for the DuckDB
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny stopword inventories for the n-gram/stopword language heuristic;
# deliberately small + fixed so the SQL oracle can inline them
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con"],
}


def _word_regex(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens): whitespace tokenization; empty text → 0."""
    t = F.trim(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(t == "", F.lit(0))
         .otherwise(F.size(F.split(t, r"\s+"))).alias("n_tokens"))


def bpe_ish_token_count(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(doc_id, n_subtokens): BPE-flavoured proxy — word pieces + digits +
    punctuation each count; deterministic regex, good for budget estimates."""
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"([a-z]{1,6}|[0-9]|[^a-z0-9\s])"), 1)
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.size(pieces).alias("n_subtokens"))


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, alpha_ratio, punct_ratio, stopword_ratio,
    mean_token_len, quality): the classic cheap-filter feature set
    (C4/Gopher-style length+symbol heuristics) as pure column math."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.when(F.trim(t) == "", F.lit(0)).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    stop = F.size(F.regexp_extract_all(
        F.lower(t), F.lit(_word_regex(LANG_STOPWORDS["en"])), 1))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        toks.alias("n_tokens"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop / F.greatest(toks, F.lit(1)), 6).alias("stopword_ratio"),
        F.round((n_chars - F.greatest(toks, F.lit(1)) + 1)
                / F.greatest(toks, F.lit(1)), 6).alias("mean_token_len"),
    )
    quality = (
        F.when(F.col("n_tokens") < 5, F.lit(0.0))
        .otherwise(F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.3
            + F.col("alpha_ratio") * 0.4
            + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.3, 6)))
    return out.withColumn("quality", quality)


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits): stopword-count heuristic across the
    fixed inventories; argmax with deterministic tie-break (count desc, then
    language code asc); 'und' when nothing matches."""
    t = F.lower(F.col(text_col))
    hit_cols = {
        lang: F.size(F.regexp_extract_all(t, F.lit(_word_regex(words)), 1))
        for lang, words in LANG_STOPWORDS.items()
    }
    scored = docs.select(F.col(id_col).alias("doc_id"),
                         *[c.alias(f"hits_{l}") for l, c in hit_cols.items()])
    # argmax via greatest + chained when (deterministic order: en, de, es, fr)
    best = F.greatest(*[F.col(f"hits_{l}") for l in LANG_STOPWORDS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_STOPWORDS):
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.select("doc_id", pred.alias("lang_pred"), best.alias("lang_hits"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fp): content fingerprint = md5 of aggressively normalized
    text (lower, strip non-alphanumerics) — the join key for cross-snapshot
    document identity."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    return docs.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))


def line_stats(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, n_distinct_lines, repetition_ratio): within-document
    repetition — the Gopher-style "fraction of duplicate lines" filter.
    ``repetition_ratio`` = 1 − distinct/total over non-empty trimmed lines
    (0.0 for documents with no non-empty line).  One explode + two counts,
    all JVM-side."""
    lines = F.filter(F.transform(F.split(F.col(text_col), r"\n"),
                                 lambda s: F.trim(s)),
                     lambda s: s != "")
    base = docs.select(F.col(id_col).alias("doc_id"), lines.alias("ls"))
    n = F.size(F.col("ls"))
    nd = F.size(F.array_distinct(F.col("ls")))
    return base.select(
        "doc_id", n.alias("n_lines"), nd.alias("n_distinct_lines"),
        F.when(n == 0, F.lit(0.0))
         .otherwise(F.round(F.lit(1.0) - nd / n, 6))
         .alias("repetition_ratio"))


def duplicate_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_chars: int = 20) -> DataFrame:
    """(paragraph_hash, n_docs, n_occurrences): corpus-level boilerplate
    detection — paragraphs (blank-line-separated blocks, trimmed, at least
    ``min_chars`` chars) that occur in MORE THAN ONE document, keyed by
    md5.  The backbone of "remove the cookie banner from every page":
    explode + one hash groupBy, the same shuffle class as exact dedup.
    """
    paras = F.filter(F.transform(F.split(F.col(text_col), r"\n\s*\n"),
                                 lambda s: F.trim(s)),
                     lambda s: F.length(s) >= min_chars)
    exploded = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode(paras).alias("para"))
                .select("doc_id", F.md5(F.col("para")).alias("paragraph_hash")))
    return (exploded.groupBy("paragraph_hash")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_docs") > 1))

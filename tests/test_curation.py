"""Corpus-curation operators: n-gram vocabulary, decontamination,
deterministic sampling, PII redaction (pipeline/curation.py)."""

import hashlib

import pytest

from networkx_spark.pipeline.curation import (
    decontaminate, hash_sample, ngram_vocabulary, redact_pii, word_ngrams)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the mat"),
        (2, "dogs bark loudly at night"),
        (3, ""),
        (4, "solo"),
        (5, "The CAT sat, on the mat!"),  # normalizes identically to doc 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_bigrams(docs):
    got = {(r.doc_id, r.ngram) for r in word_ngrams(docs, n=2).collect()}
    assert ("the cat", ) not in got  # tuples carry doc_id
    assert (0, "the cat") in got and (0, "the mat") in got
    assert (5, "the cat") in got     # punctuation/case-normalized
    assert all(d != 3 for d, _ in got)   # empty doc yields nothing
    assert all(d != 4 for d, _ in got)   # single token has no bigram


def test_word_ngrams_trigram_count(docs):
    rows = word_ngrams(docs, n=3).filter("doc_id = 0").collect()
    # 6 tokens -> 4 trigrams
    assert sorted(r.ngram for r in rows) == sorted(
        ["the cat sat", "cat sat on", "sat on the", "on the mat"])


def test_ngram_vocabulary_order_and_ties(docs):
    rows = ngram_vocabulary(docs, n=2, top_k=3).collect()
    assert rows[0].ngram == "the cat" and rows[0].n_occurrences == 3
    assert rows[0].n_docs == 3
    # ties broken ascending by ngram
    occ = [r.n_occurrences for r in rows]
    assert occ == sorted(occ, reverse=True)


def test_decontaminate(docs, spark):
    bench = spark.createDataFrame(
        [(100, "why the cat sat on chairs")], "doc_id long, text string")
    out = {r.doc_id: (r.n_hits, r.n_bench_docs)
           for r in decontaminate(docs, bench, n=3).collect()}
    # docs 0 and 5 share "the cat sat" and "cat sat on" with the benchmark
    assert set(out) == {0, 5}
    assert out[0] == (2, 1) and out[5] == (2, 1)


def test_hash_sample_deterministic_and_engine_exact(docs):
    kept = sorted(r.doc_id for r in hash_sample(docs, 0.5, salt="s").collect())
    kept2 = sorted(r.doc_id for r in
                   hash_sample(docs.repartition(7), 0.5, salt="s").collect())
    assert kept == kept2  # partitioning-independent
    expect = [i for i in range(6)
              if hashlib.md5(f"s:{i}".encode()).hexdigest()[:8] < "80000000"]
    assert kept == expect  # engine-independent md5 threshold rule


def test_hash_sample_bounds(docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_redact_pii(spark):
    rows = [(0, "mail a.b-c_d@foo-bar.org or call +44-201-794 0958 now"),
            (1, "no pii here"), (2, "")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(d).collect()}
    assert out[0].n_emails == 1 and out[0].n_phones == 1
    assert out[1].n_emails == 0 and out[1].n_phones == 0
    # the redacted fingerprint of a clean doc equals md5 of the raw text
    assert out[1].redacted_fp == hashlib.md5(b"no pii here").hexdigest()
    assert out[0].redacted_fp == hashlib.md5(
        b"mail <EMAIL> or call <PHONE> now").hexdigest()


def test_extract_anchors_nested_and_relative(spark):
    from networkx_spark.extract import extract_anchors
    html = (b'<html><body><a href="/a">go  here</a>'
            b'<a href="http://x.com/b"><b>bold</b> link</a>'
            b'<a>no href</a></body></html>')
    got = extract_anchors(html, "http://base.org/p")
    assert got == [("http://base.org/a", "go here"),
                   ("http://x.com/b", "bold link")]


# ------------------------------------------------ segment (line) dedup
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_df_counts_lines(spark):
    from networkx_spark.pipeline.curation import segment_document_frequency
    docs = _docs(spark, [
        (1, "unique one\ncookie banner\nbody a"),
        (2, "cookie banner\nbody b\ncookie banner"),
        (3, "cookie banner\n\nbody c"),
    ])
    got = {r["segment"]: r["df"]
           for r in segment_document_frequency(docs).collect()}
    # repeated within one doc counts once; blank lines never counted
    assert got["cookie banner"] == 3
    assert got["unique one"] == 1
    assert "" not in got


def test_remove_duplicate_segments_order_and_blanks(spark):
    from networkx_spark.pipeline.curation import remove_duplicate_segments
    docs = _docs(spark, [
        (1, "keep a\nboiler\nkeep b"),
        (2, "boiler\nkeep c"),
        (3, "boiler"),
    ])
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_segments(docs, min_df=2).collect()}
    assert out[1] == "keep a\nkeep b"
    assert out[2] == "keep c"
    assert out[3] == ""            # fully-boilerplate doc survives, empty


def test_remove_duplicate_segments_identity_when_no_dups(spark):
    from networkx_spark.pipeline.curation import remove_duplicate_segments
    docs = _docs(spark, [(1, "a\n\nb"), (2, "c\nd")])
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_segments(docs, min_df=2).collect()}
    assert out == {1: "a\n\nb", 2: "c\nd"}   # split/join round-trip exact

"""Training-data pipeline ops: dedup, text analysis, similarity, multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkx_spark.pipeline.dedup import (exact_duplicates, jaccard_pairs,
                                           lsh_candidate_pairs, minhash_signatures,
                                           near_duplicates_minhash, shingles,
                                           simhash, simhash_near_duplicates)
from networkx_spark.pipeline.similarity import (cosine_topk, cosine_topk_numpy,
                                                embedding_near_duplicates, lsh_topk)
from networkx_spark.pipeline.text import (bpe_ish_token_count, fingerprint,
                                          language_id, quality_scores, token_count)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),      # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog", "en"),      # near dup of 1
        (4, "der schnelle braune fuchs springt und das ist gut", "de"),
        (5, "completely different text about graph engines and spark", "en"),
        (6, "  The   Quick  Brown Fox jumps over the lazy dog ", "en"),  # ws/case dup of 1
        (7, "", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


def test_exact_dedup(spark, docs):
    d = {r.doc_id: r.canonical_id for r in exact_duplicates(docs).collect()}
    assert d[1] == 1 and d[2] == 1 and d[6] == 1      # normalized-exact group
    assert d[3] == 3 and d[4] == 4 and d[5] == 5 and d[7] == 7


def test_shingles_and_jaccard(spark, docs):
    sh = shingles(docs.filter("doc_id = 1"), k=3)
    assert sh.count() == 7  # 9 tokens → 7 trigrams
    pairs = {(r.a, r.b): r.jaccard for r in
             jaccard_pairs(docs.filter("doc_id in (1,2,3,5)"), k=3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.2 < pairs[(1, 3)] < 0.8
    assert (1, 5) not in pairs  # no shared trigram


def test_minhash_lsh_pipeline(spark, docs):
    # the empty doc 7 stays in the input: shingles() must drop it (a "" doc
    # has no k-grams), matching the SQL oracle's trim(text) <> '' filter
    from networkx_spark.pipeline.dedup import DEFAULT_NUM_HASHES
    sig = minhash_signatures(docs, k=2)
    assert (sig.count() == 6 and
            len([c for c in sig.columns if c.startswith("mh_")])
            == DEFAULT_NUM_HASHES)
    assert sig.filter("doc_id = 7").count() == 0
    # identical docs → identical signatures
    s = {r.doc_id: tuple(r[f"mh_{i}"] for i in range(DEFAULT_NUM_HASHES))
         for r in sig.collect()}
    assert s[1] == s[2] == s[6]
    cand = {(r.a, r.b) for r in lsh_candidate_pairs(sig).collect()}
    assert (1, 2) in cand and (1, 6) in cand
    nd = {(r.a, r.b): r.jaccard for r in
          near_duplicates_minhash(docs, k=2, threshold=0.5).collect()}
    assert nd[(1, 2)] == 1.0
    assert all(j >= 0.5 for j in nd.values())


def test_simhash(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert 7 not in sh                       # empty doc excluded, like the oracle
    assert sh[1] == sh[2] == sh[6]
    assert -(1 << 63) <= sh[1] < (1 << 63)   # full 64-bit fingerprint
    # distinct docs should disagree somewhere in the high 32 bits too —
    # the second md5-prefix hash is really voting
    assert any((sh[a] >> 32) != (sh[b] >> 32)
               for a in sh for b in sh if a < b)
    nd = {(r.a, r.b): r.hamming for r in
          simhash_near_duplicates(docs, max_hamming=0).collect()}
    assert nd[(1, 2)] == 0 and nd[(1, 6)] == 0
    with pytest.raises(ValueError):          # 8 byte-bands cover distance ≤ 7
        simhash_near_duplicates(docs, max_hamming=8)


def test_jaccard_candidate_path_survives_common_shingle(spark):
    # every doc shares the token "corpuswide": the all-pairs shingle
    # self-join would fan out quadratically; the candidate-driven path must
    # return the same values while joining only through candidate pairs
    rows = [(i, "corpuswide " + " ".join(f"tok{i}_{j}" for j in range(6)))
            for i in range(20)]
    rows[1] = (1, rows[0][1])                            # 1 duplicates 0
    d = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r.a, r.b): r.jaccard for r in jaccard_pairs(d, k=1).collect()}
    cand = spark.createDataFrame([(0, 1), (2, 3)], "a long, b long")
    got = {(r.a, r.b): r.jaccard for r in
           jaccard_pairs(d, k=1, candidates=cand).collect()}
    assert set(got) == {(0, 1), (2, 3)}
    assert got[(0, 1)] == full[(0, 1)] == 1.0
    assert got[(2, 3)] == full[(2, 3)]
    # df cap drops the corpus-wide shingle from pairing in the all-pairs path
    capped = jaccard_pairs(d, k=1, max_shingle_df=5)
    assert {(r.a, r.b) for r in capped.collect()} == {(0, 1)}


def test_token_counts_and_quality(spark, docs):
    tc = {r.doc_id: r.n_tokens for r in token_count(docs).collect()}
    assert tc[1] == 9 and tc[7] == 0 and tc[6] == 9
    bp = {r.doc_id: r.n_subtokens for r in bpe_ish_token_count(docs).collect()}
    assert bp[1] >= 9
    q = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert q[7].quality == 0.0
    assert q[1].quality > 0.3
    assert 0 <= q[1].alpha_ratio <= 1 and 0 <= q[1].stopword_ratio <= 1


def test_language_id(spark, docs):
    lid = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert lid[1] == "en" and lid[4] == "de" and lid[7] == "und"


def test_fingerprint_normalization(spark, docs):
    fp = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    assert fp[1] == fp[2] == fp[6]
    assert fp[1] != fp[3]


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((30, 8))
    base[7] = base[3] * 1.001 + 1e-4            # near-dup pair (3, 7)
    rows = [(i, base[i].astype(float).tolist(), i % 3) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int").cache()


def _np_topk(embed_rows, qids, k):
    ids = np.array([r[0] for r in embed_rows])
    m = np.array([r[1] for r in embed_rows])
    out = {}
    for qid in qids:
        qv = m[ids == qid][0]
        sims = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
        sims[ids == qid] = -np.inf
        order = np.lexsort((ids, -sims))[:k]
        out[qid] = [(int(ids[i]), round(float(sims[i]), 6)) for i in order]
    return out


def test_cosine_topk_exact_and_numpy_agree(spark, emb):
    rows = [(r.vec_id, np.array(r.embedding)) for r in emb.collect()]
    queries = emb.filter("vec_id < 3")
    want = _np_topk(rows, [0, 1, 2], 5)
    for fn in (cosine_topk, cosine_topk_numpy):
        got = {}
        for r in fn(emb, queries, k=5).collect():
            got.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
        for qid in want:
            got_ids = [v for v, _ in sorted(got[qid], key=lambda t: -t[1])]
            want_ids = [v for v, _ in want[qid]]
            assert got_ids == want_ids, (fn.__name__, qid)
            for (gv, gc), (wv, wc) in zip(sorted(got[qid], key=lambda t: -t[1]), want[qid]):
                assert gc == pytest.approx(wc, abs=1e-5)


def test_lsh_topk_finds_near_duplicate(spark, emb):
    got = lsh_topk(emb, emb.filter("vec_id = 3"), k=3, bits=6).collect()
    assert any(r.vec_id == 7 and r.cosine > 0.999 for r in got)


def test_embedding_near_duplicates(spark, emb):
    nd = {(r.a, r.b): r.cosine for r in
          embedding_near_duplicates(emb, threshold=0.99, bits=6).collect()}
    assert (3, 7) in nd and nd[(3, 7)] > 0.999


def test_multimodal_plumbing(spark):
    from networkx_spark.pipeline.multimodal import (decode_features, resize_images,
                                                    sample_frames, synthesize_media)
    media = synthesize_media(spark, 8, kind="image").cache()
    assert media.count() == 8
    with pytest.raises(NotImplementedError):
        decode_features(media, decoder="stub").collect()
    feats = decode_features(media, decoder="fake", feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 8 and all(len(r.features) == 16 for r in rows)
    # determinism across partitioning
    again = decode_features(media.repartition(3), decoder="fake", feature_dim=16)
    a = {r.media_id: tuple(r.features) for r in rows}
    b = {r.media_id: tuple(r.features) for r in again.collect()}
    assert a == b
    rs = resize_images(media, 8, 8).collect()
    assert all(len(r.pixels) == 64 for r in rs)
    vids = synthesize_media(spark, 4, kind="video")
    fr = sample_frames(vids, every_ms=1000)
    counts = {r[0]: r[1] for r in fr.groupBy("media_id").count().collect()}
    meta = {r.media_id: r.meta.duration_ms for r in vids.collect()}
    for mid, c in counts.items():
        assert c == meta[mid] // 1000


def test_multimodal_native_codecs(spark):
    from networkx_spark.pipeline.multimodal import (decode_features, decode_ppm,
                                                    decode_wav, encode_ppm,
                                                    encode_wav, resize_images,
                                                    synthesize_media)
    # pure-numpy codec roundtrips
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    samples = (np.sin(np.linspace(0, 10, 1600)) * 1000).astype(np.int16)
    dec, rate = decode_wav(encode_wav(samples, 16_000))
    assert rate == 16_000 and (dec == samples).all()

    # native decode over Spark: real PPM pixels end to end
    media = synthesize_media(spark, 6, kind="image").cache()   # codec=ppm
    assert media.select("meta.codec").distinct().collect()[0][0] == "ppm"
    f1 = {r.media_id: tuple(r.features) for r in
          decode_features(media, decoder="native", feature_dim=8).collect()}
    f2 = {r.media_id: tuple(r.features) for r in
          decode_features(media.repartition(4), decoder="native",
                          feature_dim=8).collect()}
    assert f1 == f2 and all(0.0 <= v <= 1.0 for t in f1.values() for v in t)

    # resize on a known gradient: top-left darker than bottom-right
    grad = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 3, 1)
                   ).transpose(0, 2, 1)
    row = [(0, "image", bytearray(encode_ppm(grad)),
            (64, 32, 0, 0, "ppm"))]
    one = spark.createDataFrame(
        row, ("media_id long, kind string, payload binary, "
              "meta struct<width:int,height:int,sample_rate:int,"
              "duration_ms:int,codec:string>"))
    px = resize_images(one, 4, 4, decoder="native").collect()[0].pixels
    assert px[0] < px[3]                                   # gradient preserved

    # audio: real WAV samples pooled
    wavs = synthesize_media(spark, 3, kind="audio")
    fa = decode_features(wavs, decoder="native", feature_dim=4).collect()
    assert all(len(r.features) == 4 for r in fa)
    # unsupported codec under native → explicit NotImplementedError
    jpg = synthesize_media(spark, 2, kind="image", codec="jpeg")
    with pytest.raises(Exception):
        decode_features(jpg, decoder="native").collect()


def test_minhash_ab_seed_derived():
    from networkx_spark.pipeline.dedup import MERSENNE31, minhash_ab
    ab = minhash_ab(128, seed=0)
    assert len(ab) == 128 and len(set(ab)) == 128
    assert all(1 <= a < MERSENNE31 and 0 <= b < MERSENNE31 for a, b in ab)
    assert minhash_ab(128, seed=0) == ab          # deterministic
    assert minhash_ab(128, seed=1) != ab          # seed-sensitive
    assert minhash_ab(64, seed=0) == ab[:64]      # prefix-stable


def test_minhash_recall_s_curve(spark):
    """Seeded corpus with known-similarity pairs: 64-hash/16x4 banding must
    recall essentially all J~0.85 pairs while passing few J~0.2 pairs
    (the S-curve the 8-hash table could not express at threshold 0.8)."""
    from networkx_spark.pipeline.dedup import (lsh_candidate_pairs,
                                               minhash_signatures)
    rows = []
    n_pairs = 40
    for p in range(n_pairs):
        base = [f"w{p}_{j}" for j in range(20)]
        # high-sim partner: drop 2 tokens, add 2 new -> J = 18/22 ~ 0.82
        high = base[:18] + [f"x{p}_0", f"x{p}_1"]
        # low-sim partner: keep 7 of 20 -> J = 7/33 ~ 0.21
        low = base[:7] + [f"y{p}_{j}" for j in range(13)]
        rows.append((4 * p, " ".join(base)))
        rows.append((4 * p + 1, " ".join(high)))
        rows.append((4 * p + 2, " ".join(base)))  # unused id-spacing filler
        rows.append((4 * p + 3, " ".join(low)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = {(r.a, r.b) for r in lsh_candidate_pairs(
        minhash_signatures(docs, k=1)).collect()}
    got_high = sum((4 * p, 4 * p + 1) in cand for p in range(n_pairs))
    got_low = sum((4 * p, 4 * p + 3) in cand for p in range(n_pairs))
    assert got_high >= int(0.95 * n_pairs), got_high
    assert got_low <= int(0.35 * n_pairs), got_low


def test_lsh_hot_bucket_guard_degenerate_corpus(spark, caplog):
    """Thousands of near-identical boilerplate docs collapse into one LSH
    bucket per band; the guard must drop those buckets (logged) instead of
    emitting a quadratic pair blow-up."""
    import logging
    import time

    from networkx_spark.pipeline.dedup import (lsh_candidate_pairs,
                                               minhash_signatures,
                                               simhash_near_duplicates)
    n = 5000
    rows = [(i, "lorem ipsum dolor sit amet boilerplate footer text")
            for i in range(n)]
    rows += [(n, "one genuinely unique document about spark engines"),
             (n + 1, "one genuinely unique document about spark engines")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(docs, k=2)
    t0 = time.time()
    with caplog.at_level(logging.WARNING,
                         logger="networkx_spark.pipeline.dedup"):
        pairs = lsh_candidate_pairs(sig, max_bucket_size=100)
        got = {(r.a, r.b) for r in pairs.collect()}
    assert time.time() - t0 < 120
    # the 5000-doc degenerate bucket is dropped...
    assert len(got) <= 1
    # ...but the pair outside it survives
    assert (n, n + 1) in got
    assert any("hot bucket" in r.message for r in caplog.records)

    with caplog.at_level(logging.WARNING,
                         logger="networkx_spark.pipeline.dedup"):
        sh_pairs = simhash_near_duplicates(docs, max_hamming=2,
                                           max_bucket_size=100)
        sh = {(r.a, r.b) for r in sh_pairs.collect()}
    assert (n, n + 1) in sh and len(sh) <= 1


def test_embedding_near_duplicates_hot_bucket_guard(spark, caplog):
    import logging

    from networkx_spark.pipeline.similarity import embedding_near_duplicates
    # 500 identical vectors -> one sketch bucket; cap drops it, pairs from
    # the small healthy bucket survive
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(500)]
    # same direction (scalar multiple) -> same sketch bucket by construction
    rows += [(1000, [0.0, 1.0, 0.1, 0.0]), (1001, [0.0, 2.0, 0.2, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with caplog.at_level(logging.WARNING,
                         logger="networkx_spark.pipeline.dedup"):
        got = {(r.a, r.b) for r in embedding_near_duplicates(
            emb, threshold=0.99, max_bucket_size=100).collect()}
    assert (1000, 1001) in got
    assert all(a >= 1000 for a, _ in got)
    assert any("hot bucket" in r.message for r in caplog.records)


def test_png_codec_roundtrip_and_filters(spark):
    import struct
    import zlib

    from networkx_spark.pipeline.multimodal import (_PNG_SIG, _png_chunk,
                                                    decode_features,
                                                    decode_png, encode_png,
                                                    synthesize_media)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()
    gray = rng.integers(0, 256, size=(6, 11), dtype=np.uint8)
    assert (decode_png(encode_png(gray)) == gray).all()

    # hand-built PNG using Sub(1)/Up(2)/Average(3)/Paeth(4) filters: the
    # decoder must un-apply each (the engine's encoder only emits 0)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8).astype(np.int32)
    lines = []
    prev = np.zeros(15, np.int32)
    for y, f in enumerate([1, 2, 3, 4]):
        cur = px[y].reshape(-1)
        enc = np.zeros(15, np.int32)
        for x in range(15):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            pred = {1: a, 2: b, 3: (a + b) // 2}.get(f)
            if pred is None:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0)
    crafted = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
               + _png_chunk(b"IEND", b""))
    assert (decode_png(crafted) == px.astype(np.uint8)).all()

    # corrupted CRC is rejected, not silently decoded
    bad = bytearray(encode_png(img))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|IEND|chunk"):
        decode_png(bytes(bad))

    # end-to-end over Spark: compressed payloads through the Arrow path
    media = synthesize_media(spark, 5, kind="image", codec="png").cache()
    assert media.select("meta.codec").distinct().collect()[0][0] == "png"
    f1 = {r.media_id: tuple(r.features) for r in
          decode_features(media, decoder="native", feature_dim=8).collect()}
    f2 = {r.media_id: tuple(r.features) for r in
          decode_features(media.repartition(3), decoder="native",
                          feature_dim=8).collect()}
    assert f1 == f2 and len(f1) == 5
    assert all(0.0 <= v <= 1.0 for t in f1.values() for v in t)

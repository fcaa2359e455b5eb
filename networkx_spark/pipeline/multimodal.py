"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-side concerns (schema, Arrow batch shape, partition sizing, UDF
signatures) are real and tested; the actual codec work is stubbed because
the image/audio libraries are not in this container:

* ``decoder='stub'`` raises :class:`NotImplementedError` listing the
  library that would be used (Pillow / soundfile / pyav),
* ``decoder='fake'`` is a deterministic pure-numpy stand-in (hash-seeded
  pixels / samples) so the downstream plumbing — batching, feature shapes,
  resize geometry, frame sampling cadence — is fully exercised.

At 100 TB the rule encoded here: media bytes stay in their Arrow batch end
to end (no per-row Python calls, no driver round-trips), and each operator
emits fixed-width feature columns so downstream joins never carry blobs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, sample_rate:int, "
                "duration_ms:int, codec:string>")
_LIBS = {"image": "Pillow", "audio": "soundfile", "video": "pyav"}


def synthesize_media(spark, n: int, kind: str = "image", seed: int = 42) -> DataFrame:
    """Deterministic opaque payloads + plausible metadata (for tests)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                payload = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
                rows.append((int(i), kind, payload,
                             (64 + int(i) % 128, 64 + int(i) % 64, 16_000,
                              1000 + int(i) % 9000, "fake")))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, shape: tuple[int, ...]) -> np.ndarray:
    rng = np.random.default_rng(np.frombuffer(payload[:16], dtype=np.uint64))
    return rng.random(shape, dtype=np.float32)


def decode_features(media: DataFrame, decoder: str = "stub",
                    feature_dim: int = 16) -> DataFrame:
    """(media_id, features array<float>): decode → pooled feature vector.

    The Arrow plumbing (mapInPandas, fixed-width output, blob dropped after
    decode) is the real engine contract; the decode kernel is stubbed."""
    if decoder == "stub":
        kinds = [r["kind"] for r in media.select("kind").distinct().collect()]
        libs = ", ".join(_LIBS.get(k, "?") for k in kinds)
        raise NotImplementedError(
            f"media decoding requires {libs} which are not installed in this "
            f"environment; use decoder='fake' for the deterministic stand-in")
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(bytes(p), (feature_dim,)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        part, schema="media_id long, features array<float>")


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: str = "fake") -> DataFrame:
    """(media_id, pixels, width, height): decode + nearest-neighbour resize
    on the fake decode plane — geometry math is real, codec is not."""
    if decoder == "stub":
        raise NotImplementedError("image resize requires Pillow (not installed); "
                                  "use decoder='fake'")

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w0, h0 = int(meta["width"]), int(meta["height"])
                img = _fake_decode(bytes(p), (h0, w0))
                yi = (np.arange(height) * h0 // height)
                xi = (np.arange(width) * w0 // width)
                small = img[np.ix_(yi, xi)]
                out.append((int(mid), small.flatten().tolist(), width, height))
            yield pd.DataFrame(out, columns=["media_id", "pixels", "width", "height"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        part, schema="media_id long, pixels array<float>, width int, height int")


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decoder: str = "fake") -> DataFrame:
    """(media_id, frame_idx, ts_ms): frame-sampling cadence from metadata —
    one row per sampled frame, payload decoded per frame in the fake path."""
    if decoder == "stub":
        raise NotImplementedError("video decoding requires pyav (not installed); "
                                  "use decoder='fake'")
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.expr(f"sequence(0, cast(meta.duration_ms/{every_ms} as int) - 1)"))
         .alias("frame_idx"))
    return frames.withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))

"""Deterministic synthetic web-graph + pages generators (FIXTURES.md §1.1, §3).

Distributed and seed-deterministic: every page's out-links are a pure
function of ``(seed, page_id)`` via a vectorized splitmix64 hash over numpy
uint64 arrays, evaluated inside ``mapInPandas`` over ``spark.range`` — no
driver-side materialization, no RNG state shared across partitions, so the
same (seed, n) produces the same graph at any parallelism/partitioning.

Graph shape (per FIXTURES.md §3): ``n`` urls across ``n/50`` hosts; Zipf-ish
out-degree clamped to [0, 200]; ~8% dangling pages; 10 hot pages receive
~20% of all links (forces skew handling); 80% intra-host links.

The reference's fixture generators (``networkx/generators/classic.py`` etc.)
are mirrored only where tests need them (edge lists built in the tests
themselves); this module is about the engine-scale ingest path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from networkx_spark.extract import PAGES_SCHEMA, EDGES_SCHEMA

HOST_SIZE = 50
N_HOT = 10
P_HOT = 0.20
P_INTRA = 0.80
P_DANGLING = 0.08
MAX_OUT = 200
ZIPF_A = 2.0


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the per-(seed,id,slot) hash."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(seed: int, ids: np.ndarray, slot: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        mix = (ids.astype(np.uint64) * np.uint64(0x100000001B3)
               ^ np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
               ^ (np.uint64(slot) << np.uint64(32)))
        return _splitmix64(mix)


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def url_of(i) -> "np.ndarray | str":
    if np.isscalar(i):
        return f"https://host{int(i) // HOST_SIZE}.test/p{int(i)}"
    host = (np.asarray(i) // HOST_SIZE)
    return np.char.add(
        np.char.add("https://host", host.astype(str)),
        np.char.add(".test/p", np.asarray(i).astype(str)))


def _out_targets(ids: np.ndarray, n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized: for a batch of page ids return (src_ids, dst_ids)."""
    ids = ids.astype(np.int64)
    u_deg = _u01(_h(seed, ids, 0))
    # ~8% dangling; otherwise Zipf-ish: deg = ceil(u^(-1/(a-1))) capped
    deg = np.where(
        u_deg < P_DANGLING, 0,
        np.minimum(MAX_OUT, np.ceil(
            np.power(np.maximum(_u01(_h(seed, ids, 1)), 1e-12),
                     -1.0 / (ZIPF_A - 1.0))).astype(np.int64)))
    deg = np.minimum(deg, max(0, n - 1))
    src = np.repeat(ids, deg)
    if len(src) == 0:
        return src, src
    # slot index within each page's link list
    k = np.arange(len(src)) - np.repeat(np.cumsum(deg) - deg, deg)
    with np.errstate(over="ignore"):
        r = _h(seed, src * np.int64(1_000_003) + k, 2)
    mode = _u01(r)
    r2 = _splitmix64(r)
    hot = (r2 % np.uint64(N_HOT)).astype(np.int64)
    host_base = (src // HOST_SIZE) * HOST_SIZE
    intra = host_base + (r2 % np.uint64(min(HOST_SIZE, n))).astype(np.int64)
    anywhere = (r2 % np.uint64(n)).astype(np.int64)
    dst = np.where(mode < P_HOT, hot,
                   np.where(mode < P_HOT + P_INTRA, intra, anywhere))
    keep = (dst != src) & (dst < n)
    return src[keep], dst[keep]


def web_edges(spark, n: int, seed: int = 42, as_urls: bool = True):
    """edges(src, dst) of the synthetic web graph — generated distributed."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            s, d = _out_targets(pdf["id"].to_numpy(), n, seed)
            if as_urls:
                yield pd.DataFrame({"src": url_of(s), "dst": url_of(d)})
            else:
                yield pd.DataFrame({"src": s, "dst": d})

    schema = EDGES_SCHEMA if as_urls else "src long, dst long"
    return spark.range(n).mapInPandas(gen, schema=schema).distinct()


def _page_rows(ids: np.ndarray, n: int, seed: int) -> pd.DataFrame:
    from networkx_spark.extract import extract_text

    rows = []
    for i in ids.astype(np.int64):
        s, d = _out_targets(np.array([i]), n, seed)
        links = [url_of(int(t)) for t in d]
        h = int(i) // HOST_SIZE
        wordbits = int(_h(seed, np.array([i]), 3)[0] % np.uint64(9999))
        body = (f"Deterministic text body for page {int(i)} on host {h}. "
                f"Corpus token w{wordbits} appears here.")
        anchors = "".join(f'<a href="{l}">link {k}</a> ' for k, l in enumerate(links))
        html = (f"<html><head><title>Page {int(i)}</title>"
                f"<script>var x={int(i)};</script></head>"
                f"<body><p>{body}</p>{anchors}</body></html>").encode()
        rows.append((url_of(int(i)), pd.Timestamp("2025-01-01", tz="UTC")
                     + pd.Timedelta(seconds=int(i)), html,
                     extract_text(html, url_of(int(i))), "en"))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synthesize_pages(spark, n: int, seed: int = 42):
    """pages(url, warc_ts, html, text, lang): html embeds the out-links as
    anchors; ``text`` is the golden extraction (computed with the same pinned
    extractor the engine UDF uses ⇒ byte-identical by construction, and the
    invariant test re-derives it through the Spark path to prove it)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _page_rows(pdf["id"].to_numpy(), n, seed)

    return spark.range(n).mapInPandas(gen, schema=PAGES_SCHEMA)

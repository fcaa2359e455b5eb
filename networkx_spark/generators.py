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


# --------------------------------------------------------- classic fixtures
# Distributed, seed-deterministic builders mirroring the reference's
# fixture generators; all return :class:`~networkx_spark.graph.Graph`.

def _range_graph(spark, edges_df, directed=False, vertices=None):
    from networkx_spark.graph import Graph
    return Graph.from_edges(edges_df, directed=directed, vertices=vertices)


def complete_graph(spark, n: int, directed: bool = False):
    """All vertex pairs (``networkx/generators/classic.py:317``).
    Θ(n²) edges — fixture scale."""
    import pyspark.sql.functions as F
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    pairs = a.crossJoin(b)
    pairs = pairs.filter("src != dst") if directed else pairs.filter("src < dst")
    v = spark.range(n).select(F.col("id"))
    return _range_graph(spark, pairs, directed, vertices=v)


def path_graph(spark, n: int):
    """0-1-2-…-(n-1) (``classic.py:754``)."""
    import pyspark.sql.functions as F
    e = spark.range(max(0, n - 1)).select(F.col("id").alias("src"),
                                          (F.col("id") + 1).alias("dst"))
    v = spark.range(n).select(F.col("id"))
    return _range_graph(spark, e, vertices=v)


def cycle_graph(spark, n: int):
    """Path plus the closing edge (``classic.py:414``)."""
    import pyspark.sql.functions as F
    e = spark.range(n).select(F.col("id").alias("src"),
                              ((F.col("id") + 1) % n).alias("dst"))
    v = spark.range(n).select(F.col("id"))
    return _range_graph(spark, e, vertices=v)


def star_graph(spark, n: int):
    """Center 0 joined to n leaves — n+1 vertices (``classic.py:780``)."""
    import pyspark.sql.functions as F
    e = spark.range(1, n + 1).select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    v = spark.range(n + 1).select(F.col("id"))
    return _range_graph(spark, e, vertices=v)


def gnp_random_graph(spark, n: int, p: float, seed: int = 42,
                     directed: bool = False):
    """Erdős–Rényi G(n, p) (``random_graphs.py:113``): pair (i, j) is an
    edge iff a splitmix64 hash of (seed, i·n+j) maps below p — the same
    graph at any parallelism, no RNG state (SURVEY §2.9 seeded-randomness
    contract; the reference uses a seeded ``random()`` stream, so graphs
    differ from CPython's but match this engine's across runs).
    Θ(n²) candidate pairs — fixture scale."""
    import pyspark.sql.functions as F

    def gen(it):
        for pdf in it:
            k = pdf["id"].to_numpy(np.int64)
            i, j = k // n, k % n
            keep = (i < j) if not directed else (i != j)
            i, j, k = i[keep], j[keep], k[keep]
            u = _u01(_h(seed, k, 9))
            sel = u < p
            yield pd.DataFrame({"src": i[sel], "dst": j[sel]})

    e = spark.range(n * n).mapInPandas(gen, schema="src long, dst long")
    v = spark.range(n).select(F.col("id"))
    return _range_graph(spark, e, directed, vertices=v)


# Zachary's karate club (public-domain social network; reference
# ``generators/social.py:15`` embeds the same data)
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def karate_club_graph(spark):
    """Zachary's karate club, 34 vertices / 78 edges (``social.py:15``)."""
    e = spark.createDataFrame(KARATE_EDGES, "src long, dst long")
    return _range_graph(spark, e)

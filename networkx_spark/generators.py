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


# -------------------------------------------- round 5: fixture generators
def gnm_random_graph(spark, n: int, m: int, seed: int = 42,
                     directed: bool = False, method: str = "hash"):
    """G(n, m): uniformly random graph with exactly m edges
    (``random_graphs.py:240``).

    * ``method='hash'`` (default, distributed): rank all candidate pairs
      by a seeded splitmix64 hash and keep the m smallest — a hash that is
      uniform over pairs makes the kept set a uniform m-subset, with no
      RNG state and the same graph at any parallelism (Θ(n²) candidates,
      fixture scale; a TakeOrdered cut, no global sort materialized).
    * ``method='reference'``: driver kernel replicating the reference's
      exact ``seed.choice``/``has_edge`` rejection loop — graph-identical
      to CPython networkx for the same seed (parity tests).
    """
    import pyspark.sql.functions as F

    max_edges = n * (n - 1) if directed else n * (n - 1) // 2
    if m >= max_edges:
        return complete_graph(spark, n, directed)
    v = spark.range(n).select(F.col("id"))
    if method == "reference":
        import random
        rng = random.Random(seed)
        edges, have = [], set()
        nlist = list(range(n))
        while len(edges) < m:
            u, w = rng.choice(nlist), rng.choice(nlist)
            if u == w or (u, w) in have:
                continue
            have.add((u, w))
            if not directed:
                have.add((w, u))
            edges.append((u, w))
        e = spark.createDataFrame(edges, "src long, dst long")
        return _range_graph(spark, e, directed, vertices=v)

    def gen(it):
        for pdf in it:
            k = pdf["id"].to_numpy(np.int64)
            i, j = k // n, k % n
            keep = (i != j) if directed else (i < j)
            i, j, k = i[keep], j[keep], k[keep]
            h = _h(seed, k, 23)
            yield pd.DataFrame({"src": i, "dst": j, "h": h.astype(np.int64)})

    pairs = spark.range(n * n).mapInPandas(
        gen, schema="src long, dst long, h long")
    import pyspark.sql.functions as F
    e = pairs.orderBy("h", "src", "dst").limit(m).select("src", "dst")
    return _range_graph(spark, e, directed, vertices=v)


def barabasi_albert_graph(spark, n: int, m: int, seed: int = 42,
                          max_n: int = 1_000_000):
    """Barabási–Albert preferential attachment (``random_graphs.py:626``).

    Preferential attachment is sequential by definition — every new
    vertex's targets depend on the degree distribution the previous
    vertices produced — so this is a capped driver kernel (the
    double_edge_swap/CNM posture) replicating the reference's exact
    control flow: star-graph start, ``repeated_nodes`` multiset,
    ``_random_subset``'s ``rng.choice``-into-set loop (same
    ``random.Random(seed)`` call sequence and set-iteration order), hence
    graph-identical to the reference for the same seed.  For scale-ready
    power-law fixtures use :func:`lfr_benchmark_graph` or ``web_edges``.
    """
    import random

    if m < 1 or m >= n:
        raise ValueError("Barabási–Albert network must have m >= 1 and "
                         f"m < n, m = {m}, n = {n} (reference NetworkXError)")
    if n > max_n:
        raise ValueError(f"n = {n} > max_n = {max_n}: the BA chain is a "
                         "sequential driver kernel; use lfr_benchmark_graph "
                         "or web_edges for web-scale fixtures")
    rng = random.Random(seed)
    edges = [(0, k) for k in range(1, m + 1)]          # star_graph(m)
    repeated = [0] * m + list(range(1, m + 1))         # degree-repeated list
    source = m + 1
    while source < n:
        targets = set()
        while len(targets) < m:
            targets.add(rng.choice(repeated))
        edges.extend((source, t) for t in targets)
        repeated.extend(targets)
        repeated.extend([source] * m)
        source += 1
    e = spark.createDataFrame(edges, "src long, dst long")
    import pyspark.sql.functions as F
    v = spark.range(n).select(F.col("id"))
    return _range_graph(spark, e, vertices=v)


def caveman_graph(spark, l: int, k: int):
    """l disjoint k-cliques (``generators/community.py:23``) —
    deterministic and fully distributed: vertex i belongs to cave i//k;
    the clique edges are a bounded self-join within each cave."""
    import pyspark.sql.functions as F
    v = spark.range(l * k)
    a = v.select(F.col("id").alias("src"), (F.col("id") / k).cast("long").alias("c"))
    b = v.select(F.col("id").alias("dst"), (F.col("id") / k).cast("long").alias("c"))
    e = (a.join(b, "c").filter(F.col("src") < F.col("dst"))
         .select("src", "dst"))
    return _range_graph(spark, e, vertices=v.select("id"))


def connected_caveman_graph(spark, l: int, k: int):
    """Caveman with one edge per cave rewired to the previous cave
    (``community.py:70``): remove (i·k, i·k+1), add
    (i·k, (i·k − 1) mod l·k) — the reference's exact rewiring, so graphs
    match edge-for-edge."""
    import pyspark.sql.functions as F
    if k < 2:
        raise ValueError("The size of cliques in a connected caveman graph "
                         "must be at least 2 (reference NetworkXError)")
    g = caveman_graph(spark, l, k)
    drop = (g.edges.sparkSession.range(l)
            .select((F.col("id") * k).alias("src"),
                    (F.col("id") * k + 1).alias("dst")))
    e = g.edges.select("src", "dst").join(drop, ["src", "dst"], "anti")
    ring = (g.edges.sparkSession.range(l)
            .select((F.col("id") * k).alias("a"),
                    F.pmod(F.col("id") * k - 1, F.lit(l * k)).alias("b"))
            .select(F.least("a", "b").alias("src"),
                    F.greatest("a", "b").alias("dst")))
    return _range_graph(spark, e.unionByName(ring).distinct(),
                        vertices=g.vertices())


def ring_of_cliques(spark, num_cliques: int, clique_size: int):
    """num_cliques cliques joined in a ring (``community.py:388``): clique
    i's SECOND vertex (i·k + 1) connects to clique (i+1)'s first
    ((i+1)·k mod n·k) — the reference's exact attachment, so graphs
    match."""
    import pyspark.sql.functions as F
    if num_cliques < 2:
        raise ValueError("A ring of cliques must have at least two cliques "
                         "(reference NetworkXError)")
    if clique_size < 2:
        raise ValueError("The cliques must have at least two nodes "
                         "(reference NetworkXError)")
    g = caveman_graph(spark, num_cliques, clique_size)
    spark_ = g.edges.sparkSession
    n_all = num_cliques * clique_size
    link = (spark_.range(num_cliques)
            .select((F.col("id") * clique_size + 1).alias("a"),
                    F.pmod((F.col("id") + 1) * clique_size,
                           F.lit(n_all)).alias("b"))
            .select(F.least("a", "b").alias("src"),
                    F.greatest("a", "b").alias("dst")))
    return _range_graph(spark, g.edges.select("src", "dst")
                        .unionByName(link).distinct(),
                        vertices=g.vertices())


def lfr_benchmark_graph(spark, n: int, tau1: float = 2.5, tau2: float = 1.5,
                        mu: float = 0.1, min_degree: int = 3,
                        max_degree: int | None = None,
                        min_community: int = 10,
                        max_community: int | None = None,
                        seed: int = 42, max_n: int = 5_000_000):
    """LFR community benchmark (``generators/community.py:810``) with
    planted ground truth: returns ``(Graph, communities)`` where
    ``communities`` is (id, community).

    Independent implementation of the published construction (Lancichinetti,
    Fortunato & Radicchi 2008), not a port of the reference's sampler:

    * degrees ~ discrete power law exponent ``tau1`` on
      [min_degree, max_degree] via inverse-CDF over seeded hash uniforms,
    * community sizes ~ power law exponent ``tau2`` on
      [min_community, max_community], greedily filled to cover n,
    * each vertex splits its stubs (1−mu) intra / mu inter and edges come
      from configuration-model pairing of the two stub pools (seeded
      shuffles; self-loops and duplicates dropped — the standard LFR
      simplification, so realized mu is approximate like the reference's),
    * the node→community assignment guarantees intra-degree < community
      size (vertices are placed into the smallest community that fits).

    The graph differs edge-for-edge from CPython networkx (different RNG),
    like ``gnp_random_graph``; tests assert the STRUCTURAL contract
    (partition cover, mixing fraction, degree bounds, seed determinism).
    Sequence construction is driver-side numpy (O(n) ints); the edge
    table itself is built as a DataFrame — fixture-scale by design,
    capped at ``max_n``.
    """
    if n > max_n:
        raise ValueError(f"n = {n} > max_n: LFR sequence construction is "
                         "driver-side; use web_edges at protocol scale")
    if not 0 <= mu <= 1:
        raise ValueError("mu must be in [0, 1] (reference NetworkXError)")
    rng = np.random.default_rng(seed)
    max_degree = max_degree or max(min_degree + 1, int(round(n ** 0.5)))
    max_community = max_community or max(min_community + 1,
                                         int(round(n ** 0.6)))

    def _powerlaw(size, lo, hi, exponent):
        ks = np.arange(lo, hi + 1, dtype=np.float64)
        pdf = ks ** (-exponent)
        cdf = np.cumsum(pdf) / pdf.sum()
        u = rng.random(size)
        return lo + np.searchsorted(cdf, u)

    deg = _powerlaw(n, min_degree, max_degree, tau1).astype(np.int64)
    if deg.sum() % 2:
        deg[0] += 1
    intra = np.round(deg * (1.0 - mu)).astype(np.int64)

    sizes = []
    while sum(sizes) < n:
        sizes.append(int(_powerlaw(1, min_community,
                                   max_community, tau2)[0]))
    sizes[-1] -= sum(sizes) - n
    if sizes[-1] < min_community and len(sizes) > 1:
        sizes[-2] += sizes[-1]
        sizes.pop()

    # place high-intra-degree vertices first into the largest community
    # that fits (intra-degree must stay < community size)
    order = np.argsort(-intra, kind="stable")
    csizes = np.array(sizes, dtype=np.int64)
    room = csizes.copy()
    comm = np.full(n, -1, dtype=np.int64)
    for v in order:
        ok = np.flatnonzero((room > 0) & (csizes > intra[v]))
        if len(ok) == 0:  # degenerate parameters: clamp the intra demand
            ok = np.flatnonzero(room > 0)
            intra[v] = min(intra[v], csizes[ok].max() - 1)
            ok = ok[csizes[ok] > intra[v]]
        pick = ok[np.argmax(room[ok])]
        comm[v] = pick
        room[pick] -= 1

    # configuration-model pairing, intra per community then inter globally
    def _pair(stubs):
        stubs = stubs[rng.permutation(len(stubs))]
        if len(stubs) % 2:
            stubs = stubs[:-1]
        a, b = stubs[0::2], stubs[1::2]
        keep = a != b
        return a[keep], b[keep]

    srcs, dsts = [], []
    for c in range(len(sizes)):
        members = np.flatnonzero(comm == c)
        stubs = np.repeat(members, intra[members])
        a, b = _pair(stubs)
        srcs.append(a)
        dsts.append(b)
    inter_stubs = np.repeat(np.arange(n), deg - intra)
    a, b = _pair(inter_stubs)
    keep = comm[a] != comm[b]          # inter stubs must cross communities
    srcs.append(a[keep])
    dsts.append(b[keep])
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    e = spark.createDataFrame(
        pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates(),
        "src long, dst long")
    import pyspark.sql.functions as F
    v = spark.range(n).select(F.col("id"))
    g = _range_graph(spark, e, vertices=v)
    communities = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "community": comm}),
        "id long, community long")
    return g, communities

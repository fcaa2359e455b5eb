"""HTML link + text extraction: the pages → edges front end.

The reference has no HTML layer (NetworkX starts at the graph); this module
is net-new engine code required by the input contract: an Iceberg/parquet
table ``pages(url, warc_ts, html, text, lang)`` of Common-Crawl-style web
pages is turned into the ``edges(src, dst)`` table the algorithms run on.

The extractor is a single pure function (stdlib ``html.parser``, pinned — no
external deps) used in BOTH places:

* driver/test side, as the local oracle, and
* executor side, inside ``mapInPandas`` over Arrow record batches,

so extracted text is **byte-identical per url** by construction (the
per-row invariant from BASELINE.json ``input_hint``).  HTML parsing is
inherently per-document Python; the Arrow batching amortizes serde, and the
stage is embarrassingly parallel (no shuffle) — it scales with input splits.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
EDGES_SCHEMA = "src string, dst string"


class _LinkTextParser(HTMLParser):
    """Collects absolute hrefs and visible text (script/style skipped)."""

    _SKIP = {"script", "style", "noscript", "template"}

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.links: list[str] = []
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.links.append(urljoin(self.base, href))

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.chunks.append(data)


def parse_page(html_bytes: bytes, base_url: str) -> tuple[str, list[str]]:
    """(normalized text, absolute out-links) — THE extractor; deterministic:
    whitespace-normalized token join, links in document order."""
    p = _LinkTextParser(base_url)
    p.feed(html_bytes.decode("utf-8", errors="replace"))
    p.close()
    text = " ".join(" ".join(p.chunks).split())
    return text, p.links


def extract_text(html_bytes: bytes, base_url: str = "") -> str:
    return parse_page(html_bytes, base_url)[0]


def extract_links(html_bytes: bytes, base_url: str) -> list[str]:
    return parse_page(html_bytes, base_url)[1]


def edges_from_pages(pages) -> "pyspark.sql.DataFrame":  # noqa: F821
    """pages DataFrame → edges(src, dst): one row per anchor, document order
    dropped (the edge table is a set).  Self-links removed, duplicates
    collapsed — matching :meth:`Graph.from_edges` canonicalization
    downstream."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs, dsts = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                for link in extract_links(bytes(html), url):
                    if link != url:
                        srcs.append(url)
                        dsts.append(link)
            yield pd.DataFrame({"src": srcs, "dst": dsts})

    return (pages.select("url", F.col("html").cast("binary").alias("html"))
            .mapInPandas(batches, schema=EDGES_SCHEMA).distinct())


def texts_from_pages(pages) -> "pyspark.sql.DataFrame":  # noqa: F821
    """pages → (url, extracted_text); the invariant test compares this
    byte-for-byte against the golden ``text`` column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [extract_text(bytes(h), u) for u, h in zip(pdf["url"], pdf["html"])]
            yield pd.DataFrame({"url": pdf["url"], "extracted_text": out})

    return (pages.select("url", F.col("html").cast("binary").alias("html"))
            .mapInPandas(batches, schema="url string, extracted_text string"))


class _AnchorParser(HTMLParser):
    """Collects (absolute href, visible anchor text) pairs — the anchor
    text signal (what the web says about the TARGET page), the classic
    relevance/label source for retrieval training corpora."""

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.anchors: list[tuple[str, list[str]]] = []
        self._open: list[str] | None = None
        self._href: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self._href = urljoin(self.base, href)
                self._open = []

    def handle_endtag(self, tag):
        if tag == "a" and self._open is not None:
            self.anchors.append((self._href, self._open))
            self._open, self._href = None, None

    def handle_data(self, data):
        if self._open is not None:
            self._open.append(data)


def extract_anchors(html_bytes: bytes, base_url: str) -> list[tuple[str, str]]:
    """[(absolute href, whitespace-normalized anchor text)], document
    order."""
    p = _AnchorParser(base_url)
    p.feed(html_bytes.decode("utf-8", errors="replace"))
    p.close()
    return [(href, " ".join(" ".join(chunks).split()))
            for href, chunks in p.anchors]


def anchors_from_pages(pages) -> "pyspark.sql.DataFrame":  # noqa: F821
    """pages → (src, dst, anchor): one row per distinct anchor
    occurrence, self-links dropped — the edge table with its text label,
    feeding anchor-text aggregation per target page."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs, dsts, texts = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                for href, text in extract_anchors(bytes(html), url):
                    if href != url:
                        srcs.append(url)
                        dsts.append(href)
                        texts.append(text)
            yield pd.DataFrame({"src": srcs, "dst": dsts, "anchor": texts})

    return (pages.select("url", F.col("html").cast("binary").alias("html"))
            .mapInPandas(batches, schema="src string, dst string, anchor string")
            .distinct())


def anchor_text_per_target(pages) -> "pyspark.sql.DataFrame":  # noqa: F821
    """(dst, n_anchors, anchor_texts): what the web calls each target —
    distinct anchor strings aggregated per target URL, sorted for
    determinism."""
    a = anchors_from_pages(pages)
    return (a.groupBy("dst")
            .agg(F.count("*").alias("n_anchors"),
                 F.array_join(F.array_sort(F.collect_set("anchor")), "|")
                 .alias("anchor_texts")))

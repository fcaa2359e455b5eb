"""Host-level web-graph operators.

Net-new engine surface (the reference starts at an abstract graph and has
no URL layer): the classic Common-Crawl-style collapse of the page-level
link graph ``edges(src_url, dst_url)`` to the **host graph** — one vertex
per hostname, one weighted edge per (src_host, dst_host) pair with the
page-link multiplicity as the weight.  Production web analyses (spam
detection, domain-level PageRank, crawl prioritization) run on the host
graph because it is 3-4 orders of magnitude smaller than the page graph.

Everything is JVM column work: one ``regexp_extract`` per endpoint and one
``groupBy`` shuffle on the (src_host, dst_host) key, partially aggregated
map-side — at 10^12 pages the output is ~10^8 hosts, so the shuffle
output is tiny relative to the scan.  The regex (not ``parse_url``) keeps
the expression replayable verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST

#: one regex shared by the engine and the SQL oracles
HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def host_of(col) -> Column:
    """Hostname (authority) of a URL column; '' for scheme-less strings —
    the groupBy keeps those visible rather than silently dropping them."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, HOST_RE, 1)


def host_graph(edges: DataFrame, src: str = SRC, dst: str = DST,
               keep_self: bool = True) -> DataFrame:
    """(src, dst, weight) host-level edge table from page-level URL edges.

    ``weight`` = number of page links between the two hosts;
    ``keep_self=False`` drops intra-host edges (the bulk of real web
    links), the usual prefilter before host-level PageRank.
    """
    hg = (edges.select(host_of(src).alias(SRC), host_of(dst).alias(DST))
          .groupBy(SRC, DST)
          .agg(F.count(F.lit(1)).cast("double").alias("weight")))
    if not keep_self:
        hg = hg.filter(F.col(SRC) != F.col(DST))
    return hg


def host_degrees(edges: DataFrame, src: str = SRC,
                 dst: str = DST) -> DataFrame:
    """(host, out_pages, out_links, in_links) per-host link stats —
    distinct pages that link out, total out-links, total in-links.  Two
    partial-agg shuffles on the host key."""
    out = (edges.select(host_of(src).alias("host"), F.col(src).alias("page"))
           .groupBy("host")
           .agg(F.count_distinct("page").alias("out_pages"),
                F.count(F.lit(1)).alias("out_links")))
    ins = (edges.select(host_of(dst).alias("host"))
           .groupBy("host").agg(F.count(F.lit(1)).alias("in_links")))
    return (out.join(ins, "host", "full")
            .select("host",
                    F.coalesce("out_pages", F.lit(0)).alias("out_pages"),
                    F.coalesce("out_links", F.lit(0)).alias("out_links"),
                    F.coalesce("in_links", F.lit(0)).alias("in_links")))


def host_graph_as_graph(edges: DataFrame, keep_self: bool = True) -> Graph:
    """The host graph as an engine :class:`Graph` (directed, weighted) —
    ready for host-level PageRank / components / k-core."""
    return Graph.from_edges(host_graph(edges, keep_self=keep_self),
                            directed=True, weight="weight")

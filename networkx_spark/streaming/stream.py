"""Structured-Streaming layer: incremental link-graph maintenance.

The reference is purely batch/in-memory; streams are net-new engine
surface.  The model: an append-only stream of crawl events (``events`` rows
or freshly crawled ``pages``) continuously folds into the graph state —

* :func:`streaming_event_counts` — watermarked windowed counts per event
  type (the generic ingestion-health aggregation),
* :func:`streaming_degree_updates` — per-``src`` out-degree deltas over
  tumbling windows: the incremental form of the engine's degree tables,
* :func:`stream_pages_to_edges` — the extraction UDF applied on a stream of
  pages; identical semantics to the batch path (same pure extractor).

All run with file sources in tests (``memory`` sink +
``processAllAvailable``), Kafka-ready by swapping the source format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
                 "value double, props string")


def streaming_event_counts(spark, path: str, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    ev = (spark.readStream.schema(EVENTS_SCHEMA).parquet(path))
    return (ev.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "total"))


def streaming_degree_updates(spark, edges_path: str, window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Edge stream (src, dst, ts) → per-window out-degree deltas."""
    e = spark.readStream.schema("src string, dst string, ts timestamp").parquet(edges_path)
    return (e.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "src")
            .agg(F.count("*").alias("degree_delta"))
            .select(F.col("w.start").alias("window_start"), "src", "degree_delta"))


def stream_pages_to_edges(spark, pages_path: str) -> DataFrame:
    """Streaming extraction: same mapInPandas extractor as the batch path
    (``networkx_spark.extract.edges_from_pages``), so stream- and
    batch-derived edge tables are identical for identical inputs."""
    from networkx_spark.extract import PAGES_SCHEMA, edges_from_pages

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_path)
    # distinct() is not allowed on a stream; dedup happens on fold-in
    import pandas as pd
    from typing import Iterator
    from networkx_spark.extract import extract_links

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs, dsts = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                for link in extract_links(bytes(html), url):
                    if link != url:
                        srcs.append(url)
                        dsts.append(link)
            yield pd.DataFrame({"src": srcs, "dst": dsts})

    return pages.select("url", "html").mapInPandas(batches, "src string, dst string")


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drive a (bounded file-source) stream to completion into a memory
    sink — the test/smoke harness.  ``mode='complete'`` for windowed
    aggregations (append would hold rows until the watermark passes, which
    a bounded replay never does); ``'append'`` for stateless transforms."""
    q = (stream_df.writeStream.outputMode(mode)
         .format("memory").queryName(name).trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()

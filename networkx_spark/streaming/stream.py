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


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete",
                  checkpoint: str | None = None) -> None:
    """Drive a (bounded file-source) stream to completion into a memory
    sink — the test/smoke harness.  ``mode='complete'`` for windowed
    aggregations (append would hold rows until the watermark passes, which
    a bounded replay never does); ``'append'`` for stateless transforms;
    ``'update'`` for stateful operators.  Passing ``checkpoint`` makes
    state durable across repeated calls (restart-resume tests)."""
    w = stream_df.writeStream.outputMode(mode)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.format("memory").queryName(name).trigger(availableNow=True).start()
    q.processAllAvailable()
    q.stop()


DOCS_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def streaming_exact_dedup(spark, docs_path: str,
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first document per normalized-content hash
    survives; state is bounded by the watermark horizon
    (``dropDuplicatesWithinWatermark`` — late duplicates beyond it are the
    documented trade-off, same as any streaming dedup at scale)."""
    d = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(docs_path)
    hashed = d.select(
        "doc_id", "ts",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
        .alias("content_hash"))
    return (hashed.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


def streaming_running_degrees(spark, edges_path: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): running
    out-degree per ``src`` across micro-batches.  Per-group state is one
    long; restarts resume from the checkpoint, so the running totals are
    exactly-once with respect to the file source."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    e = spark.readStream.schema("src string, dst string, ts timestamp").parquet(edges_path)

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"src": [key[0]], "out_degree": [total]})

    return (e.groupBy("src")
            .applyInPandasWithState(update,
                                    outputStructType="src string, out_degree long",
                                    stateStructType="total long",
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def run_collect(stream_df: DataFrame, checkpoint: str) -> list:
    """Drive a bounded stream via ``foreachBatch`` and return the emitted
    rows.  Unlike the memory sink, ``foreachBatch`` supports resuming from
    ``checkpoint`` — the restart/exactly-once test path for stateful
    operators."""
    rows: list = []

    def sink(batch_df, _batch_id):
        rows.extend(batch_df.collect())

    q = (stream_df.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint)
         .outputMode("update").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    return rows


def streaming_session_counts(spark, path: str, gap: str = "30 minutes",
                             watermark: str = "1 hour") -> DataFrame:
    """Per-user session event counts over a file stream using Spark's
    native ``session_window`` (gap-based merge, watermark-bounded state)
    — the streaming twin of ``pipeline.sessions.sessionize``; in batch
    mode the same expression computes the same sessions, which is what
    the pytest cross-checks."""
    ev = (spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
          .parquet(path))
    return (ev.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), F.col("user_id"))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("session_window.start").alias("started"),
                    F.col("session_window.end").alias("ended"),
                    "user_id", "n_events"))

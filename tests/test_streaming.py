"""Structured-Streaming layer: bounded file-source replay into memory sinks,
compared against the equivalent batch aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from networkx_spark.streaming.stream import (run_to_memory, stream_pages_to_edges,
                                             streaming_degree_updates,
                                             streaming_event_counts)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_streaming_event_counts_match_batch(spark, tmp_path):
    # file stream sources need a directory; stage the single-file table
    path = str(tmp_path / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(path)
    agg = streaming_event_counts(spark, path, window="1 hour")
    run_to_memory(agg, "ev_counts", mode="complete")
    got = {(r.window_start, r.event_type): (r.n, r.total)
           for r in spark.sql("select * from ev_counts").collect()}
    batch = (spark.read.parquet(path)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
             .select(F.col("w.start").alias("ws"), "event_type", "n", "total"))
    want = {(r.ws, r.event_type): (r.n, r.total) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_streaming_edges_and_degrees(spark, tmp_path):
    from networkx_spark.generators import synthesize_pages
    pages_dir = str(tmp_path / "pages")
    synthesize_pages(spark, 120, seed=42).write.parquet(pages_dir)

    edges = stream_pages_to_edges(spark, pages_dir)
    run_to_memory(edges, "stream_edges", mode="append")
    got = {(r.src, r.dst) for r in spark.sql("select * from stream_edges").collect()}
    from networkx_spark.generators import web_edges
    want = {(r.src, r.dst) for r in web_edges(spark, 120, 42).collect()}
    assert got == want

    edges_dir = str(tmp_path / "edges")
    (spark.read.parquet(pages_dir)
     .select(F.col("url").alias("src"), F.col("warc_ts").alias("ts"))
     .write.parquet(edges_dir))
    deg = streaming_degree_updates(spark, edges_dir, window="1 hour")
    run_to_memory(deg, "deg_updates", mode="complete")
    assert spark.sql("select sum(degree_delta) from deg_updates").collect()[0][0] == 120


def test_streaming_exact_dedup(spark, tmp_path):
    import pandas as pd
    from networkx_spark.streaming.stream import run_to_memory, streaming_exact_dedup
    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "ts": pd.to_datetime(["2025-01-01 00:00"] * 3).astype("datetime64[us]"),
        "text": ["hello world", "Hello   WORLD", "other text"],
    }).to_parquet(src / "a.parquet")
    out = streaming_exact_dedup(spark, str(src))
    run_to_memory(out, "dedup_t", mode="append")
    rows = spark.sql("SELECT * FROM dedup_t").collect()
    # 1 and 2 share a normalized hash -> exactly one survives
    hashes = [r.content_hash for r in rows]
    assert len(rows) == 2 and len(set(hashes)) == 2


def test_streaming_running_degrees_stateful_across_restart(spark, tmp_path):
    import pandas as pd
    from networkx_spark.streaming.stream import (run_to_memory,
                                                 streaming_running_degrees)
    src = tmp_path / "edges"
    src.mkdir()
    ck = str(tmp_path / "ck")
    ts = pd.to_datetime(["2025-01-01"] * 3).astype("datetime64[us]")
    pd.DataFrame({"src": ["a", "a", "b"], "dst": ["x", "y", "z"],
                  "ts": ts}).to_parquet(src / "b1.parquet")
    from networkx_spark.streaming.stream import run_collect
    out = streaming_running_degrees(spark, str(src))
    first = {r.src: r.out_degree for r in run_collect(out, ck)}
    assert first == {"a": 2, "b": 1}
    # new file after "restart": totals must RESUME from checkpointed state
    pd.DataFrame({"src": ["a", "c"], "dst": ["z", "z"],
                  "ts": ts[:2]}).to_parquet(src / "b2.parquet")
    out2 = streaming_running_degrees(spark, str(src))
    second = {r.src: r.out_degree for r in run_collect(out2, ck)}
    assert second == {"a": 3, "c": 1}      # only updated groups emitted

"""Sessionization (pipeline/sessions.py + streaming twin)."""

import datetime as dt

import pytest

from networkx_spark.algorithms.mst import min_vertex_cover_approx
from networkx_spark.graph import Graph
from networkx_spark.pipeline.sessions import session_stats, sessionize


def _t(minute):
    return dt.datetime(2025, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, _t(0), 7, "c", 1.0, ""),
        (2, _t(10), 7, "c", 1.0, ""),     # same session (gap 10 <= 30)
        (3, _t(50), 7, "c", 1.0, ""),     # new session (gap 40)
        (4, _t(55), 7, "c", 1.0, ""),
        (5, _t(0), 9, "c", 1.0, ""),      # other user
        (6, _t(31), 9, "c", 1.0, ""),     # 31 min gap -> new session
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_sessionize_boundaries(events):
    got = {r.event_id: r.session_id for r in sessionize(events, 30).collect()}
    assert got == {1: "7:1", 2: "7:1", 3: "7:2", 4: "7:2",
                   5: "9:1", 6: "9:2"}


def test_session_stats(events):
    s = {r.session_id: r for r in session_stats(events, 30).collect()}
    assert s["7:1"].n_events == 2 and s["7:1"].duration_sec == 600
    assert s["7:2"].n_events == 2 and s["7:2"].duration_sec == 300
    assert s["9:2"].n_events == 1 and s["9:2"].duration_sec == 0


def test_sessionize_gap_guard(events):
    with pytest.raises(ValueError):
        sessionize(events, 0)


def test_streaming_session_counts_matches_batch(spark, events, tmp_path):
    from networkx_spark.streaming.stream import (
        run_to_memory, streaming_session_counts)
    p = str(tmp_path / "ev")
    events.write.parquet(p)
    stream = streaming_session_counts(spark, p, gap="30 minutes")
    run_to_memory(stream, "sess_counts")
    got = {(r.user_id, r.n_events)
           for r in spark.table("sess_counts").collect()}
    want = {(r.user_id, r.n_events)
            for r in session_stats(events, 30).collect()}
    assert got == want


def test_min_vertex_cover(spark):
    import networkx as nx
    nxg = nx.karate_club_graph()
    g = Graph.from_edges(
        spark.createDataFrame(list(nxg.edges()), "src long, dst long"),
        directed=False)
    cover = {r.id for r in min_vertex_cover_approx(g).collect()}
    # it IS a vertex cover ...
    assert all(u in cover or v in cover for u, v in nxg.edges())
    # ... within 2x of optimum (karate's minimum vertex cover is 14)
    assert len(cover) <= 28

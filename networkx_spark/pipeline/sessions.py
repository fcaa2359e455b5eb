"""Event sessionization — gap-based session assignment over event logs.

Net-new training-data-pipeline operator (the reference has no event
layer): web-log sessionization is how raw click/request streams become
documents and interaction traces.  Batch form: one window partitioned by
user (never a global window — the lag/cumsum pair runs inside each
user's partition, so the shuffle key is ``user_id`` and skew follows the
busiest user, not the table), with a deterministic ``(ts, event_id)``
ordering so ties cannot flip session boundaries between runs or engines.
The streaming form reuses Spark's native ``session_window`` aggregation
(watermark-bounded state) in :mod:`networkx_spark.streaming.stream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """(event_id, user_id, session_no, session_id): a new session starts
    at a user's first event and whenever the gap to their previous event
    exceeds ``gap_minutes``.  ``session_id`` is ``user:session_no`` —
    stable, engine-portable naming."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    # TIMESTAMP_NTZ cannot cast straight to BIGINT; route via TIMESTAMP
    # (session timezone pinned to UTC in session.py, so the epoch math is
    # engine-exact vs DuckDB's epoch())
    secs = F.col(ts_col).cast("timestamp").cast("long")
    prev_secs = prev.cast("timestamp").cast("long")
    new_sess = (prev.isNull()
                | (secs - prev_secs > gap_minutes * 60)).cast("long")
    return (events
            .withColumn("_new", new_sess)
            .withColumn("session_no", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .select(F.col(id_col).alias("event_id"),
                    F.col(user_col).alias("user_id"),
                    F.col("session_no"),
                    F.concat_ws(":", F.col(user_col).cast("string"),
                                F.col("session_no").cast("string"))
                    .alias("session_id")))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """(session_id, user_id, n_events, started, ended, duration_sec):
    one row per session — the rollup that feeds session-level quality
    filtering."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    joined = events.select(F.col(id_col).alias("_eid"), ts_col).join(
        s.select(F.col("event_id").alias("_eid"), "session_id",
                 F.col("user_id").alias("_u")), "_eid")
    return (joined.groupBy("session_id")
            .agg(F.first("_u").alias("user_id"),
                 F.count("*").alias("n_events"),
                 F.min(ts_col).alias("started"),
                 F.max(ts_col).alias("ended"))
            .withColumn("duration_sec",
                        F.col("ended").cast("timestamp").cast("long")
                        - F.col("started").cast("timestamp").cast("long")))

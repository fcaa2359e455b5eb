"""Superstep runtime shared by all iterative algorithms.

The reference runs iterations as an in-process Python loop
(e.g. ``pagerank_alg.py:492-498``); a Spark loop needs what no Catalyst rule
provides:

* **plan cutting** — each superstep's DataFrame references the previous
  one; without truncation the optimizer re-analyzes an ever-deeper plan.
  The primitive here is a **parquet round-trip**: write the state, read it
  back as a fresh ``LogicalRelation``.  ``DataFrame.localCheckpoint`` is
  deliberately NOT used: its ``LogicalRDD`` preserves the origin plan's
  statistics/constraints, and chaining checkpoints across supersteps makes
  Catalyst's stats estimation blow up super-linearly after ~10 iterations
  (measured: 1s → 130s per superstep; driver pegged in
  ``SizeInBytesOnlyStatsPlanVisitor`` / ``BigInteger.multiply``).
* **durable vertex-state snapshots** — the north rule requires per-superstep
  checkpoints with lineage + metrics so an algorithm is resumable after
  executor loss.  With a ``checkpoint_dir`` the cadence-selected supersteps
  land in ``<dir>/<name>/step=NNNNN/`` plus a ``metrics.jsonl`` line per
  superstep (rows, bytes, partition skew factor, residual, elapsed);
  off-cadence supersteps go to a scratch dir that is rotated away.
* **resume** — ``latest()`` finds the newest complete snapshot so a caller
  can restart mid-algorithm.

Production target is an Iceberg table per state (snapshot per superstep,
retention-managed); this sandbox has no Iceberg jars, so the durable path
is partitioned parquet with identical semantics (append-only snapshot dirs
+ ``_SUCCESS`` commit marker).
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import tempfile
import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from contextlib import contextmanager


@contextmanager
def fixed_plan(spark):
    """Disable AQE for the duration of a superstep loop.

    AQE re-plans every stage of every superstep of a fixed-shape query —
    measured ~2× per-superstep overhead and high variance on the PageRank
    scatter join.  The loop's shapes are known (sizes change only in
    value), so static planning wins; restored afterwards for ad-hoc
    queries."""
    settings = {
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in settings}
    for k, v in settings.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@contextmanager
def tuned_partitions(spark, n_rows: int, rows_per_partition: int = 100_000):
    """Shrink ``spark.sql.shuffle.partitions`` to match a small loop state.

    Iterative algorithms pay per-stage fixed cost × partitions every
    superstep; on a graph whose state is a few thousand rows, the
    cluster-sized partition count is pure overhead.  Never *raises* the
    configured value — at scale this is a no-op."""
    old = int(spark.conf.get("spark.sql.shuffle.partitions"))
    target = max(1, min(old, (n_rows + rows_per_partition - 1) // rows_per_partition))
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        yield target
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(old))


class SuperstepRunner:
    """Checkpoint/metrics/resume driver for one algorithm run.

    Parameters
    ----------
    checkpoint_dir : None → scratch-only (bench mode; snapshots rotated).
    interval : durable checkpoint every N supersteps (1 = the north-rule
        default: every superstep durable).
    keep_scratch : how many scratch snapshots to retain before rotating
        (older ones may still back in-flight DataFrames; 4 is safe for
        loops that reference at most the previous two states; 0 disables
        rotation for loops holding long-lived references).
    collect_partition_metrics : also record per-partition row counts and the
        skew factor (max/mean); one extra cheap job per checkpoint.
    """

    def __init__(self, checkpoint_dir: Optional[str] = None, name: str = "state",
                 interval: int = 1, collect_partition_metrics: bool = False,
                 keep_scratch: int = 4):
        self.name = name
        self.dir = os.path.join(checkpoint_dir, name) if checkpoint_dir else None
        self.interval = max(1, interval)
        self.collect_partition_metrics = collect_partition_metrics
        self.keep_scratch = keep_scratch
        self.metrics: list[dict] = []
        self._flushed = 0
        self._scratch: Optional[str] = None
        self._scratch_count = 0
        self.bucket_cols: Optional[list[str]] = None
        self.n_buckets: Optional[int] = None
        self._tables: dict[str, str] = {}   # snapshot path -> catalog table
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    # ------------------------------------------------------------- bucketing
    def enable_bucketing(self, cols, n_buckets: int) -> None:
        """Write snapshots as bucketed(+sorted) tables instead of plain
        parquet.

        A plain parquet round-trip forgets the state's partitioning, so the
        next superstep re-shuffles the state for every key-join even though
        the write produced exactly hash-partitioned output.  A bucketed
        table scan exposes ``HashPartitioning(cols, n_buckets)`` (and, with
        one file per bucket, the per-bucket sort order), which Spark's
        bucket hash shares with ``repartition(n, cols)`` — so a state
        re-read joins a co-partitioned cached edge table or an aggregation
        keyed on the same column with NO exchange and NO sort.  For the
        PageRank superstep this removes both 16M-row state exchanges,
        leaving the scatter partials as the only shuffle (cluster
        analogue: the Iceberg state table is bucket-partitioned to match
        the bucketed edge table).  Callers that already pre-partition their
        state by ``cols`` before the write pay no extra shuffle on the
        write side either.  Idempotent; algorithms call it with their
        state key.

        DEFAULT OFF (opt in with ``NXS_BUCKETED=1``): measured on this
        box at the 16M-page protocol input (same box, back to back,
        local[8], 12 supersteps — see BENCH.md appendix), the bucketed
        loop's steady superstep was 19.5s vs 16.0s plain and its warmup
        ~2× longer: the write-side (bucketId, id) sort buffers the whole
        partition and breaks the write stage's codegen pipeline, costing
        more than the two avoided 16M-row exchanges return, because the
        exchanges were never the bottleneck (the scatter partials shuffle
        and the agg dominate).  On a real cluster, where an exchange is a
        network round-trip instead of an in-process memcpy, the trade
        flips — the option stays wired and tested for that deployment."""
        if os.environ.get("NXS_BUCKETED", "0") != "1":
            return
        if self.bucket_cols is None:
            self.bucket_cols = list(cols)
            self.n_buckets = int(n_buckets)

    def _write_read(self, df: DataFrame, path: str) -> DataFrame:
        """Write a snapshot and return the lineage-cut re-read."""
        spark = df.sparkSession
        if self.bucket_cols:
            import hashlib
            import re
            # content-stable path digest (NOT Python hash(): salted, and a
            # collision between live snapshot paths would make saveAsTable
            # silently replace the other snapshot's catalog table)
            digest = hashlib.sha1(path.encode()).hexdigest()[:12]
            tbl = ("nxs_" + re.sub(r"[^A-Za-z0-9_]", "_", self.name)
                   + f"_{self._scratch_count}_{digest}")
            old = self._tables.pop(path, None)
            if old:
                spark.sql(f"DROP TABLE IF EXISTS {old}")
            (df.write.mode("overwrite").format("parquet")
             .bucketBy(self.n_buckets, *self.bucket_cols)
             .sortBy(*self.bucket_cols)
             .option("path", path).saveAsTable(tbl))
            self._tables[path] = tbl
            return spark.table(tbl)
        df.write.mode("overwrite").parquet(path)
        # explicit schema: skips the driver-side footer read on every
        # superstep (a fixed cost that would not amortize with cores)
        return spark.read.schema(df.schema).parquet(path)

    def _drop_table(self, spark, path: str) -> None:
        tbl = self._tables.pop(path, None)
        if tbl:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            except Exception:
                pass

    # ----------------------------------------------------------------- paths
    def _step_path(self, step: int) -> str:
        return os.path.join(self.dir, f"step={step:05d}")

    def _scratch_dir(self) -> str:
        if self._scratch is None:
            # prefer tmpfs for non-durable cuts: the lineage cut needs the
            # round-trip, not the disk (cluster analogue: executor-local
            # NVMe/ram scratch); durable snapshots still go to checkpoint_dir
            base = "/dev/shm" if os.path.isdir("/dev/shm") else None
            self._scratch = tempfile.mkdtemp(prefix=f"nxs_{self.name}_", dir=base)
            # returned DataFrames keep reading the final snapshot after the
            # runner is closed, so scratch lives until process exit
            atexit.register(shutil.rmtree, self._scratch, ignore_errors=True)
        return self._scratch

    # ------------------------------------------------------------------- cut
    def cut(self, df: DataFrame) -> DataFrame:
        """Materialize ``df`` and truncate its lineage (parquet round-trip
        into the scratch dir, rotating old snapshots)."""
        self._scratch_count += 1
        path = os.path.join(self._scratch_dir(), f"ck{self._scratch_count:06d}")
        out = self._write_read(df, path)
        if self.keep_scratch > 0:
            old = self._scratch_count - self.keep_scratch
            if old > 0:
                old_path = os.path.join(self._scratch_dir(), f"ck{old:06d}")
                self._drop_table(df.sparkSession, old_path)
                shutil.rmtree(old_path, ignore_errors=True)
        return out

    # ----------------------------------------------------------------- state
    def latest(self, spark) -> tuple[int, Optional[DataFrame]]:
        """Newest complete durable snapshot (commit marker present)."""
        if not self.dir or not os.path.isdir(self.dir):
            return -1, None
        steps = sorted(
            int(d.split("=")[1]) for d in os.listdir(self.dir)
            if d.startswith("step=") and os.path.exists(os.path.join(self.dir, d, "_SUCCESS"))
        )
        if not steps:
            return -1, None
        s = steps[-1]
        return s, spark.read.parquet(self._step_path(s))

    def checkpoint(self, df: DataFrame, step: int, residual: float | None = None,
                   force: bool = False, extra: dict | None = None,
                   rows: int | None = None) -> DataFrame:
        """Cut lineage; durably snapshot on the cadence; record metrics.

        Returns the re-read DataFrame to carry into the next superstep.
        Pass ``rows`` when the caller already knows the state cardinality
        (vertex state is constant-size) to skip a count job — job-launch
        latency, not data volume, dominates superstep cost on small inputs.
        """
        t0 = time.time()
        durable = self.dir is not None and (force or step % self.interval == 0)
        if durable:
            path = self._step_path(step)
            if os.path.exists(path):
                self._drop_table(df.sparkSession, path)
                shutil.rmtree(path)
            out = self._write_read(df, path)
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path) for f in fs)
        else:
            out = self.cut(df)
            nbytes = None
        rows = out.count() if rows is None else rows
        m = {
            "superstep": step,
            "rows": rows,
            "bytes": nbytes,
            "residual": residual,
            "durable": durable,
            "elapsed_sec": round(time.time() - t0, 4),
            **(extra or {}),
        }
        if self.collect_partition_metrics:
            per_part = (out.groupBy(F.spark_partition_id().alias("pid"))
                        .count().agg(F.max("count").alias("mx"), F.avg("count").alias("avg"),
                                     F.count("*").alias("nparts")).collect()[0])
            if per_part["avg"]:
                m["partitions"] = int(per_part["nparts"])
                m["skew_factor"] = round(float(per_part["mx"]) / float(per_part["avg"]), 3)
        self._flush()          # previous superstep's line is final by now
        self.metrics.append(m)
        return out

    def update_last(self, **kw):
        """Patch the most recent superstep's metrics (e.g. the residual is
        only known after the state was materialized)."""
        if self.metrics:
            self.metrics[-1].update(kw)

    def _flush(self):
        if not self.dir:
            self._flushed = len(self.metrics)
            return
        with open(os.path.join(self.dir, "metrics.jsonl"), "a") as fh:
            for m in self.metrics[self._flushed:]:
                fh.write(json.dumps(m) + "\n")
        self._flushed = len(self.metrics)

    def close(self):
        """Flush metrics.  Scratch snapshots are NOT removed here — the
        DataFrame returned to the caller is backed by the newest one; the
        atexit hook reclaims them at process end (an Iceberg deployment
        would use snapshot retention instead)."""
        self._flush()

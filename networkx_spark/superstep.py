"""Superstep runtime shared by all iterative algorithms.

The reference runs iterations as an in-process Python loop
(e.g. ``pagerank_alg.py:492-498``); a Spark loop needs what no Catalyst rule
provides:

* **plan cutting** — each superstep's DataFrame references the previous
  one; 100 supersteps of uncut lineage blow up the optimizer.  We cut via
  ``localCheckpoint`` (fast, in-memory) or a parquet round-trip (durable).
* **durable vertex-state snapshots** — the north rule requires per-superstep
  checkpoints with lineage + metrics so an algorithm is resumable after
  executor loss.  ``mode='parquet'`` writes
  ``<dir>/<name>/step=NNNNN/`` plus a ``metrics.jsonl`` line per superstep
  (rows, bytes, partition skew factor, residual, elapsed).
* **resume** — ``latest()`` finds the newest complete snapshot so a caller
  can restart mid-algorithm.

Production target is an Iceberg table per state (snapshot per superstep);
this sandbox has no Iceberg jars, so the durable path is partitioned parquet
with identical semantics (append-only snapshot dirs + commit marker).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SuperstepRunner:
    """Checkpoint/metrics/resume driver for one algorithm run.

    Parameters
    ----------
    checkpoint_dir : None → in-memory ``localCheckpoint`` only (bench mode).
    interval : checkpoint every N supersteps (1 = the north-rule default:
        every superstep durable).
    collect_partition_metrics : also record per-partition row counts and the
        skew factor (max/mean); one extra cheap job per checkpoint.
    """

    def __init__(self, checkpoint_dir: Optional[str] = None, name: str = "state",
                 interval: int = 1, collect_partition_metrics: bool = False):
        self.dir = os.path.join(checkpoint_dir, name) if checkpoint_dir else None
        self.interval = max(1, interval)
        self.collect_partition_metrics = collect_partition_metrics
        self.metrics: list[dict] = []
        self._flushed = 0
        self._persisted: list[DataFrame] = []
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    # ----------------------------------------------------------------- state
    def _step_path(self, step: int) -> str:
        return os.path.join(self.dir, f"step={step:05d}")

    def latest(self, spark) -> tuple[int, Optional[DataFrame]]:
        """Newest complete snapshot (committed marker present), for resume."""
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

        Returns the (possibly re-read) DataFrame to carry into the next
        superstep.  Pass ``rows`` when the caller already knows the state
        cardinality (vertex state is constant-size) to skip a count job —
        job-launch latency, not data volume, dominates superstep cost on
        small inputs.
        """
        t0 = time.time()
        durable = self.dir is not None and (force or step % self.interval == 0)
        if durable:
            path = self._step_path(step)
            if os.path.exists(path):
                shutil.rmtree(path)
            df.write.mode("overwrite").parquet(path)
            out = df.sparkSession.read.parquet(path)
            rows = out.count() if rows is None else rows
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path) for f in fs)
        else:
            out = df.localCheckpoint(eager=True)
            rows = out.count() if rows is None else rows
            nbytes = None
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
        self._persisted.append(out)
        # free the superstep before last — its lineage is already cut
        if len(self._persisted) > 2:
            old = self._persisted.pop(0)
            try:
                old.unpersist()
            except Exception:
                pass
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
        self._flush()
        for df in self._persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self._persisted.clear()

"""Blocked-CSR PageRank: the Arrow/pandas-UDF kernel path.

The reference's production kernel is a scipy CSR matvec
(``pagerank_alg.py:460-465,494``).  The distributed analogue here — and the
north-star physical design — partitions the normalized adjacency into
**B×B vertex-block tiles** and runs each superstep as a blocked sparse
matvec:

* vertices are dense vids; vid ``v`` lives in block ``v % B`` at local
  index ``v // B`` (modulo blocking stripes hot vertices' in-edges across
  source blocks — built-in skew salting),
* ``tiles(sb, db, si, di, w)`` — one row per block pair, the tile's edges
  as int/double arrays (built once, parquet-backed, **cached partitioned
  by sb**),
* a superstep shuffles ONLY the B-row rank state to the tile partitions
  (co-partitioned join on ``sb`` — O(n) doubles, never a broadcast: an
  O(n) per-executor broadcast is ~80 GB per superstep at the 10¹⁰-vertex
  target), computes per-tile contributions with ``np.bincount`` inside
  ``mapInPandas`` and folds them per ``db`` within the partition,
  emitting **sparse** (index, value) partials — reduce volume is bounded
  by the number of distinct (source-block, dst) pairs ≤ m, the same
  asymptotics as the row kernel's scatter shuffle,
* partials reduce per ``db`` in one grouped-pandas ``bincount``; the rank
  update (teleport + dangling) stays JVM-side array math,
* residual + dangling mass come from one JVM-side aggregation over the
  array state (``zip_with``/``aggregate``), exactly like the row path.

Numerics match ``networkx_spark.algorithms.pagerank`` (same normalization,
dangling rule, ``err < N·tol`` stop) — the parity test compares them at
1e-12.  Scale story: per superstep the engine shuffles O(n) state +
O(distinct (sb, dst)) sparse partials; nothing is broadcast and nothing
driver-side grows with n except the scalar residual.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, WEIGHT, ID
from networkx_spark.superstep import SuperstepRunner
from networkx_spark.algorithms.pagerank import PowerIterationFailedConvergence

def _block_sizes(n: int, n_blocks: int) -> list[int]:
    return [len(range(b, n, n_blocks)) for b in range(n_blocks)]


def build_tiles(edges: DataFrame, n: int, n_blocks: int,
                weight: bool = True) -> DataFrame:
    """Normalized adjacency → (sb, db, si, di, w) tile rows."""
    e = edges.select(F.col(SRC).cast("long"), F.col(DST).cast("long"),
                     (F.col(WEIGHT) if weight and WEIGHT in edges.columns
                      else F.lit(1.0)).cast("double").alias(WEIGHT))
    out_w = e.groupBy(SRC).agg(F.sum(WEIGHT).alias("_S"))
    norm = (e.join(out_w, SRC).filter(F.col("_S") != 0)
            .select(SRC, DST, (F.col(WEIGHT) / F.col("_S")).alias("w")))
    tagged = norm.select(
        (F.col(SRC) % n_blocks).cast("int").alias("sb"),
        (F.col(DST) % n_blocks).cast("int").alias("db"),
        (F.col(SRC) / n_blocks).cast("int").alias("si"),
        (F.col(DST) / n_blocks).cast("int").alias("di"),
        "w")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "sb": [int(pdf["sb"].iloc[0])],
            "db": [int(pdf["db"].iloc[0])],
            "si": [pdf["si"].to_numpy(np.int32)],
            "di": [pdf["di"].to_numpy(np.int32)],
            "w": [pdf["w"].to_numpy(np.float64)],
        })

    return tagged.groupBy("sb", "db").applyInPandas(
        pack, schema="sb int, db int, si array<int>, di array<int>, w array<double>")


def _build_dangling(edges: DataFrame, n: int, n_blocks: int,
                    weight: bool) -> DataFrame:
    """(b, dang array<double>): 1.0 where the vertex has zero out-weight
    (includes vids absent from the edge table — isolated pages)."""
    spark = edges.sparkSession
    e = edges.select(F.col(SRC).cast("long"),
                     (F.col(WEIGHT) if weight and WEIGHT in edges.columns
                      else F.lit(1.0)).cast("double").alias(WEIGHT))
    non_dangling = (e.groupBy(SRC).agg(F.sum(WEIGHT).alias("_S"))
                    .filter(F.col("_S") != 0)
                    .select((F.col(SRC) % n_blocks).cast("int").alias("b"),
                            (F.col(SRC) / n_blocks).cast("int").alias("i")))
    sizes = _block_sizes(n, n_blocks)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        dang = np.ones(sizes[b], dtype=np.float64)
        idx = pdf["i"].to_numpy(np.int64)
        dang[idx[idx >= 0]] = 0.0
        return pd.DataFrame({"b": [b], "dang": [dang]})

    seed = spark.range(n_blocks).select(F.col("id").cast("int").alias("b"),
                                        F.lit(-1).cast("int").alias("i"))
    return (non_dangling.unionByName(seed)
            .groupBy("b").applyInPandas(pack, schema="b int, dang array<double>"))


def pagerank_blocked(
    g: Graph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1.0e-6,
    weight: bool = True,
    n_blocks: Optional[int] = None,
    n: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 1,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, rank) over DENSE long vids 0..n-1 (use ``Graph.with_vids`` for
    string ids first).  ``n`` may exceed the number of edge endpoints —
    vids absent from the edge table are isolated vertices (dangling, rank
    mass included), matching a page universe where some pages have no
    links.  Uniform personalization/dangling (the common web case); exotic
    options route through the row-wise ``pagerank``."""
    spark = g.edges.sparkSession
    n_row = (g.vertices()
             .agg(F.max(ID).cast("long").alias("mx"), F.count("*").alias("c"))
             .collect()[0])
    if n_row["c"] == 0 and n is None:
        return spark.createDataFrame([], "id long, rank double")
    if n is None:
        n = int(n_row["mx"]) + 1
        if n != n_row["c"]:
            raise ValueError(
                f"pagerank_blocked requires dense vids 0..n-1; edge endpoints "
                f"have max={n - 1} but only {n_row['c']} distinct ids — pass "
                f"n= explicitly if the gaps are isolated vertices")
    elif n_row["c"] and int(n_row["mx"]) >= n:
        raise ValueError(f"vid {int(n_row['mx'])} out of range for n={n}")
    if n_blocks is None:
        n_blocks = max(4, int(spark.conf.get("spark.sql.shuffle.partitions")))
    n_blocks = min(n_blocks, n)
    B = n_blocks
    sizes = _block_sizes(n, B)

    own_runner = runner is None
    if own_runner:
        runner = SuperstepRunner(checkpoint_dir, name="pagerank_blocked",
                                 interval=checkpoint_interval)
    adj = g.symmetrized()
    # partitioned by sb: the superstep join co-locates each state row with
    # every tile needing it, so only the state (B rows, O(n) total)
    # shuffles per superstep
    tiles = runner.cut(build_tiles(adj, n, B, weight)
                       .repartition(B, "sb")).cache()
    tiles.count()
    statics = runner.cut(_build_dangling(adj, n, B, weight)).cache()
    # x0: per-block uniform arrays, built JVM-side (size_b = ceil((n-b)/B))
    x0 = spark.range(B).select(
        F.col("id").cast("int").alias("b"),
        F.expr(f"array_repeat({1.0 / n}d, cast(ceil(({n} - id) / {B}) as int))")
         .alias("x"))
    state = runner.cut(x0)

    def scatter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # tiles in this partition share a small set of sb values; fold all
        # contributions per db into sparse (index, value) partials so the
        # reduce shuffle is bounded by distinct (sb, dst) pairs, not B·n
        acc_i: dict[int, list[np.ndarray]] = {}
        acc_v: dict[int, list[np.ndarray]] = {}
        for pdf in it:
            for db, si, di, w, x in zip(pdf["db"], pdf["si"], pdf["di"],
                                        pdf["w"], pdf["x"]):
                xv = np.asarray(x, dtype=np.float64)
                si = np.asarray(si, dtype=np.int64)
                di = np.asarray(di, dtype=np.int64)
                wv = np.asarray(w, dtype=np.float64)
                y = np.bincount(di, weights=wv * xv[si])
                nz = np.nonzero(y)[0]
                acc_i.setdefault(int(db), []).append(nz.astype(np.int32))
                acc_v.setdefault(int(db), []).append(y[nz])
        out_db, out_i, out_v = [], [], []
        for db, idx_list in acc_i.items():
            # one sparse partial per (partition, db): duplicate indices
            # across tiles of the same db are pre-summed here
            idx = np.concatenate(idx_list)
            val = np.concatenate(acc_v[db])
            y = np.bincount(idx, weights=val)
            nz = np.nonzero(y)[0]
            out_db.append(db)
            out_i.append(nz.astype(np.int32))
            out_v.append(y[nz])
        if out_db:
            yield pd.DataFrame({"db": out_db, "i": out_i, "y": out_v})

    def scalars(st: DataFrame) -> tuple[float, float]:
        """(dangling_mass, l1 residual) in one JVM aggregation."""
        row = (st.join(statics, "b")
               .agg(F.sum(F.aggregate(F.zip_with("x", "dang", lambda a, d: a * d),
                                      F.lit(0.0), lambda acc, v: acc + v)).alias("dm"),
                    F.sum(F.aggregate(F.zip_with("x", "xprev",
                                                 lambda a, b_: F.abs(a - b_)),
                                      F.lit(0.0), lambda acc, v: acc + v)).alias("err"))
               .collect()[0])
        return float(row["dm"] or 0.0), float(row["err"] or 0.0)

    dmass = float(
        state.join(statics, "b")
        .agg(F.sum(F.aggregate(F.zip_with("x", "dang", lambda a, d: a * d),
                               F.lit(0.0), lambda acc, v: acc + v)))
        .collect()[0][0] or 0.0)

    def reduce_db(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        idx = np.concatenate([np.asarray(a, np.int64) for a in pdf["i"]])
        val = np.concatenate([np.asarray(a, np.float64) for a in pdf["y"]])
        y = np.bincount(idx, weights=val, minlength=sizes[b])
        return pd.DataFrame({"b": [b], "y": [y]})

    try:
        for it in range(max_iter):
            # co-partitioned join: tiles cached partitioned by sb, only the
            # B-row state shuffles (no O(n)-per-executor broadcast)
            partials = (tiles.join(
                state.select(F.col("b").alias("sb"), "x"), "sb")
                .mapInPandas(scatter, schema="db int, i array<int>, y array<double>"))
            summed = partials.groupBy("db").applyInPandas(
                reduce_db, schema="b int, y array<double>")
            # x_new = alpha*(y + dmass/n) + (1-alpha)/n, all JVM-side
            teleport = (1.0 - alpha) / n
            base = alpha * dmass / n
            new_state = (state.join(summed, "b", "left")
                         .select("b",
                                 F.when(F.col("y").isNull(),
                                        F.expr(f"transform(x, v -> {alpha}d * {dmass / n}d"
                                               f" + {teleport}d)"))
                                 .otherwise(
                                     F.expr(f"transform(y, v -> {alpha}d * (v + {dmass / n}d)"
                                            f" + {teleport}d)"))
                                 .alias("x"),
                                 F.col("x").alias("xprev")))
            new_state = runner.checkpoint(
                new_state, it, rows=B,
                extra={"dangling_mass": dmass, "algorithm": "pagerank_blocked",
                       "n_blocks": B})
            dmass, err = scalars(new_state)
            runner.update_last(residual=err)
            state = new_state.drop("xprev")
            if tol is not None and err < n * tol:
                break
        else:
            if tol is not None:
                raise PowerIterationFailedConvergence(max_iter)

        # unpack block arrays → (id, rank)
        def unpack(it2: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it2:
                for _, row in pdf.iterrows():
                    x = np.asarray(row["x"], dtype=np.float64)
                    b = int(row["b"])
                    yield pd.DataFrame({
                        "id": b + np.arange(len(x), dtype=np.int64) * B,
                        "rank": x})

        return state.mapInPandas(unpack, schema="id long, rank double")
    finally:
        tiles.unpersist()
        statics.unpersist()
        if own_runner:
            runner.close()

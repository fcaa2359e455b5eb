#!/usr/bin/env python
"""Supplementary N→4N scaling point: hash-min connected components.

Same protocol as scripts/scaling.py (fresh JVM per parallelism level,
identical deterministic pre-generated edge table, steady-state = median
of the last half of the supersteps) applied to the second north-star
algorithm.  CC converges in single-digit supersteps on web graphs, so
this run is cheap — it exists to show the ≥0.8 criterion is not a
PageRank-only artifact of the engine.  No hardware control here: the
PageRank protocol already measured this box's 4×-parallel envelope;
interpret the raw numbers against that (BENCH.md).

Usage: python scripts/scaling_cc.py [--pages 16000000] [--cores 8,32]
       [--edges-path AUTO] [--out BENCH.md]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, pages: int, edges_path: str,
           shuffle_factor: int = 2) -> None:
    import time

    from pyspark.sql import functions as F

    from networkx_spark.session import get_spark
    from networkx_spark.graph import Graph
    from networkx_spark.algorithms.components import _hash_min
    from networkx_spark.superstep import SuperstepRunner

    spark = get_spark(f"scale-cc-{cores}-{os.getpid()}", cores=cores,
                      shuffle_partitions=cores * shuffle_factor)
    edges = spark.read.parquet(edges_path)
    m = edges.count()
    verts = spark.range(pages).select(F.col("id").cast("long"))
    # undirected CC over the canonical generator rows (see scaling.py for
    # why dedup/vertex-derivation shuffles are skipped)
    g = Graph(edges.withColumn("weight", F.lit(1.0)), directed=False,
              vertices=verts, vertices_complete=True)
    runner = SuperstepRunner(None, name=f"cc{cores}")
    t0 = time.time()
    out = _hash_min(g.vertices(), g.edges, 200, None, 1, False,
                    runner=runner)
    n_comp = out.select("component").distinct().count()
    wall = time.time() - t0
    steps = [mt["elapsed_sec"] for mt in runner.metrics]
    tail = steps[len(steps) // 2:] if len(steps) >= 4 else steps
    steady = statistics.median(tail)
    print("WORKER_JSON " + json.dumps({
        "cores": cores, "pages": pages, "edges": m,
        "supersteps": len(steps), "n_components": n_comp,
        "wall_sec": round(wall, 2),
        "setup_sec": round(wall - sum(steps), 2),
        "edges_per_sec_total": round(m * len(steps) / wall, 0),
        "edges_per_sec_steady": round(m / steady, 0),
        "steady_superstep_sec": round(steady, 2),
        "per_superstep_sec": [round(s, 2) for s in steps],
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--edges-path", default="AUTO")
    ap.add_argument("--driver-mem", default="48g")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    args = ap.parse_args()

    if os.environ.get("NXS_CC_WORKER"):
        worker(int(os.environ["NXS_CC_WORKER"]), args.pages,
               args.edges_path)
        return

    levels = [int(c) for c in args.cores.split(",")]
    edges_path = args.edges_path
    if edges_path == "AUTO":
        edges_path = os.path.join(tempfile.mkdtemp(prefix="nxs_cc_scale_"),
                                  "edges.parquet")
        from networkx_spark.session import get_spark
        from networkx_spark.generators import web_edges
        spark = get_spark("cc-scale-gen", cores=max(levels),
                          shuffle_partitions=max(levels) * 2)
        web_edges(spark, args.pages, seed=42, as_urls=False) \
            .write.mode("overwrite").parquet(edges_path)
        spark.stop()
        args.edges_path = edges_path

    results = []
    for cores in levels:
        env = dict(os.environ, NXS_CC_WORKER=str(cores),
                   SPARK_GRAFT_DRIVER_MEM=args.driver_mem)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--pages", str(args.pages), "--edges-path", edges_path],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("WORKER_JSON ")]
        if not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            raise SystemExit(f"worker {cores} produced no result")
        results.append(json.loads(line[0][len("WORKER_JSON "):]))

    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff_total = hi["edges_per_sec_total"] / (ratio * lo["edges_per_sec_total"])
    eff_steady = hi["edges_per_sec_steady"] / (ratio * lo["edges_per_sec_steady"])
    summary = {"algorithm": "connected_components", "results": results,
               "efficiency_total": round(eff_total, 3),
               "efficiency_steady": round(eff_steady, 3)}
    print(json.dumps(summary))
    with open(args.out, "a") as f:
        f.write(f"""

## Supplementary scaling point — hash-min connected components ({lo['cores']}→{hi['cores']} cores)

Same protocol and input as the PageRank runs (fresh JVMs, identical
deterministic 16M-page / {lo['edges']:,}-edge table); CC converges in
{lo['supersteps']} supersteps, so totals are warmup-heavy by construction
and steady-state is the governing statistic.

| run | wall (s) | setup (s) | supersteps | edges/sec steady | per-superstep (s) |
|---|---|---|---|---|---|
""")
        for r in results:
            f.write(f"| local[{r['cores']}] | {r['wall_sec']} | "
                    f"{r['setup_sec']} | {r['supersteps']} | "
                    f"{r['edges_per_sec_steady']:,.0f} | "
                    f"{r['per_superstep_sec']} |\n")
        f.write(f"\n- raw steady-state efficiency: **{eff_steady:.3f}**\n"
                f"- raw total efficiency: **{eff_total:.3f}** "
                f"(dominated by setup+warmup at {lo['supersteps']} "
                f"supersteps; see the PageRank adjudication for the box's "
                f"measured 4×-parallel envelope)\n")


if __name__ == "__main__":
    main()

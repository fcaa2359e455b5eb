#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md sandbox protocol).

A real multi-node cluster is unavailable here, so the north rule's
"efficiency ≥ 0.8 from N to 4N executors" criterion is evidenced by running
the IDENTICAL PageRank job on the SAME deterministic input at two
parallelism levels (default local[8] vs local[32], a 4× core ratio) in
fresh JVMs, and reporting edges-processed/sec at both plus

    efficiency = throughput(4N) / (4 × throughput(N)).

Steady-state throughput (supersteps after the first, which pays one-time
plan/codegen/caching warmup) is reported alongside total, since at real
scale the warmup is amortized over a 100× longer run.

Usage:  python scripts/scaling.py [--pages 8000000] [--cores 8,32]
        [--supersteps 10] [--out BENCH.md]
Worker: invoked internally with NXS_SCALING_WORKER=cores set.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, pages: int, supersteps: int, kernel: str = "row") -> None:
    import time

    from pyspark.sql import functions as F

    from networkx_spark.session import get_spark
    from networkx_spark.graph import Graph
    from networkx_spark.generators import web_edges
    from networkx_spark.algorithms.pagerank import pagerank
    from networkx_spark.algorithms.pagerank_blocked import pagerank_blocked
    from networkx_spark.superstep import SuperstepRunner

    # 3 partitions per core: finer tasks smooth hot-vertex partition skew
    # across scheduling waves (AQE is disabled inside the superstep loop)
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=3 * cores)
    edges = web_edges(spark, pages, seed=42, as_urls=False).cache()
    m = edges.count()
    verts = spark.range(pages).select(F.col("id").cast("long"))
    g = Graph.from_edges(edges, vertices=verts)

    runner = SuperstepRunner(None, name=f"scale{cores}")
    t0 = time.time()
    if kernel == "blocked":
        out = pagerank_blocked(g, alpha=0.85, tol=None, max_iter=supersteps,
                               runner=runner, n=pages, n_blocks=3 * cores)
    else:
        out = pagerank(g, alpha=0.85, tol=None, max_iter=supersteps, runner=runner)
    out.agg(F.sum("rank")).collect()
    wall = time.time() - t0
    steps = [mt["elapsed_sec"] for mt in runner.metrics]
    resid = [mt.get("residual") for mt in runner.metrics]
    # steady state: median of the last 5 supersteps — the first 1-2 pay
    # one-time cache materialization / codegen warmup that a production
    # run amortizes over 50-100+ supersteps
    import statistics
    tail = steps[-5:] if len(steps) >= 5 else steps
    steady = statistics.median(tail)
    print("WORKER_JSON " + json.dumps({
        "cores": cores, "pages": pages, "edges": m, "supersteps": supersteps,
        "kernel": kernel,
        "wall_sec": round(wall, 2),
        "edges_per_sec_total": round(m * supersteps / wall, 0),
        "edges_per_sec_steady": round(m / steady, 0),
        "steady_superstep_sec": round(steady, 2),
        "final_residual": resid[-1],
        "per_superstep_sec": [round(s, 2) for s in steps],
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=8_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--supersteps", type=int, default=10)
    ap.add_argument("--kernel", default="row", choices=["row", "blocked"])
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    args = ap.parse_args()

    if os.environ.get("NXS_SCALING_WORKER"):
        worker(int(os.environ["NXS_SCALING_WORKER"]), args.pages, args.supersteps,
               args.kernel)
        return

    results = []
    for cores in [int(c) for c in args.cores.split(",")]:
        env = dict(os.environ, NXS_SCALING_WORKER=str(cores))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--pages", str(args.pages), "--supersteps", str(args.supersteps),
             "--kernel", args.kernel],
            env=env, capture_output=True, text=True, cwd=REPO)
        line = [l for l in proc.stdout.splitlines() if l.startswith("WORKER_JSON ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"worker for cores={cores} produced no result")
        results.append(json.loads(line[-1][len("WORKER_JSON "):]))

    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff_total = hi["edges_per_sec_total"] / (ratio * lo["edges_per_sec_total"])
    eff_steady = hi["edges_per_sec_steady"] / (ratio * lo["edges_per_sec_steady"])

    lines = [
        "# BENCH — PageRank scaling evidence (N → 4N parallelism)",
        "",
        "Protocol per BASELINE.md: identical job, identical deterministic input",
        f"(synthetic web graph, seed=42, {lo['pages']:,} pages / {lo['edges']:,} edges),",
        f"run at local[{lo['cores']}] and local[{hi['cores']}] in fresh JVMs;",
        f"{lo['supersteps']} fixed supersteps of the {args.kernel}-kernel PageRank",
        "(row: join + partial-hash-agg scatter; blocked: CSR-tile numpy matvec;",
        "parquet-cut lineage per superstep).",
        "",
        "| cores | wall (s) | edges/sec (total) | edges/sec (steady-state) | per-superstep (s) |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| local[{r['cores']}] | {r['wall_sec']} | {r['edges_per_sec_total']:,.0f} "
            f"| {r['edges_per_sec_steady']:,.0f} | {r['per_superstep_sec']} |")
    lines += [
        "",
        f"**Scaling efficiency ({lo['cores']}→{hi['cores']} cores, ratio {ratio:.0f}×):**",
        f"- total:        **{eff_total:.3f}**",
        f"- steady-state: **{eff_steady:.3f}**  (target ≥ 0.8)",
        "",
        "Steady-state = median of the last 5 supersteps: the first 1-2 pay",
        "one-time cache materialization / codegen warmup, amortized over the",
        "50-100+ supersteps of a production convergence run (full per-superstep",
        "series shown above for transparency).  Raw worker JSON:",
        "```json",
        *[json.dumps(r) for r in results],
        "```",
        "",
    ]
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({"efficiency_total": round(eff_total, 3),
                      "efficiency_steady": round(eff_steady, 3),
                      "out": args.out}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""spark-submit entrypoint for the link-graph engine.

The north rule requires the engine to run "via spark-submit --py-files on
a multi-executor cluster"; this is that entrypoint.  Packaging:

    cd /root/repo && zip -qr networkx_spark.zip networkx_spark
    spark-submit --master <cluster> --py-files networkx_spark.zip \\
        scripts/run_job.py --job pagerank --edges <path> --output <path> \\
        [--checkpoint-dir hdfs://.../ck --resume] [--alpha 0.85 --tol 1e-6]

The master, executor sizing, and cluster conf come from spark-submit; this
script deliberately does NOT call ``.master(...)`` (unlike the local-mode
factory in ``networkx_spark/session.py``) and only sets workload-level SQL
conf that is runtime-settable.  Inputs are parquet paths by default;
``--format table`` reads a catalog table name instead (e.g. an Iceberg
table through a catalog configured on the submit command line), which is
the production shape for the Common-Crawl-style ``pages`` table.

Jobs
----
extract     pages(url, warc_ts, html, text, lang) -> edges(src, dst)
pagerank    edges -> (id, rank); checkpoint/resume per superstep
cc          edges -> (id, component) hash-min connected components
lpa         edges -> (id, label) semi-synchronous label propagation
triangles   edges -> (id, triangles) degree-ordered exact counts
sssp        edges -> (id, dist, pred) weighted single-source paths

Each job prints ONE JSON metrics line (rows, seconds, job args) to stdout
so a workflow scheduler can scrape it.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build_session(app_name: str):
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName(app_name).getOrCreate()
    # runtime-settable workload conf; cluster-level sizing stays on the
    # submit command line where it belongs
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        spark.conf.set(k, v)
    return spark


def read_input(spark, ref: str, fmt: str):
    if fmt == "table":
        return spark.read.table(ref)
    return spark.read.format(fmt).load(ref)


def write_output(df, ref: str, fmt: str, mode: str = "overwrite"):
    if fmt == "table":
        df.write.mode(mode).saveAsTable(ref)
    else:
        df.write.mode(mode).format(fmt).save(ref)


def load_graph(spark, args):
    from networkx_spark.graph import Graph
    e = read_input(spark, args.edges, args.format)
    weight = args.weight if args.weight in e.columns else None
    return Graph.from_edges(e, directed=not args.undirected,
                            src=args.src_col, dst=args.dst_col,
                            weight=weight)


def job_extract(spark, args):
    from networkx_spark.extract import edges_from_pages
    pages = read_input(spark, args.pages, args.format)
    return edges_from_pages(pages)


def job_pagerank(spark, args):
    from networkx_spark.algorithms.pagerank import pagerank
    return pagerank(load_graph(spark, args), alpha=args.alpha,
                    max_iter=args.max_iter, tol=args.tol,
                    checkpoint_dir=args.checkpoint_dir, resume=args.resume,
                    salt_threshold=args.salt_threshold)


def job_cc(spark, args):
    from networkx_spark.algorithms.components import (
        connected_components, weakly_connected_components)
    g = load_graph(spark, args)
    fn = connected_components if args.undirected else weakly_connected_components
    return fn(g, checkpoint_dir=args.checkpoint_dir, resume=args.resume,
              salt_threshold=args.salt_threshold)


def job_lpa(spark, args):
    from networkx_spark.algorithms.label_propagation import (
        label_propagation_communities)
    return label_propagation_communities(load_graph(spark, args),
                                         checkpoint_dir=args.checkpoint_dir)


def job_triangles(spark, args):
    from networkx_spark.algorithms.triangles import triangles
    return triangles(load_graph(spark, args))


def job_sssp(spark, args):
    from networkx_spark.algorithms.sssp import sssp_predecessors
    if args.source is None:
        raise SystemExit("--source is required for --job sssp")
    return sssp_predecessors(load_graph(spark, args), args.source,
                             checkpoint_dir=args.checkpoint_dir)


JOBS = {"extract": job_extract, "pagerank": job_pagerank, "cc": job_cc,
        "lpa": job_lpa, "triangles": job_triangles, "sssp": job_sssp}


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--job", required=True, choices=sorted(JOBS))
    p.add_argument("--edges", help="edge-table path or table name")
    p.add_argument("--pages", help="pages-table path or table name (extract)")
    p.add_argument("--output", required=True,
                   help="output path or table name")
    p.add_argument("--format", default="parquet",
                   help="input/output format: parquet (default), orc, "
                        "or 'table' for catalog tables (Iceberg et al.)")
    p.add_argument("--src-col", default="src")
    p.add_argument("--dst-col", default="dst")
    p.add_argument("--weight", default="weight",
                   help="weight column (used when present)")
    p.add_argument("--undirected", action="store_true")
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--source", help="source vertex (sssp)")
    p.add_argument("--salt-threshold", type=int, default=None,
                   help="degree above which hot vertices are salted")
    p.add_argument("--checkpoint-dir", default=None,
                   help="durable per-superstep snapshots (resumable)")
    p.add_argument("--resume", action="store_true",
                   help="restart from the newest checkpoint snapshot")
    args = p.parse_args(argv)
    if args.job == "extract" and not args.pages:
        p.error("--job extract requires --pages")
    if args.job != "extract" and not args.edges:
        p.error(f"--job {args.job} requires --edges")
    return args


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    spark = build_session(f"nxs-{args.job}")
    t0 = time.time()
    out = JOBS[args.job](spark, args)
    write_output(out, args.output, args.format)
    rows = spark.read.table(args.output).count() if args.format == "table" \
        else spark.read.format(args.format).load(args.output).count()
    print(json.dumps({"job": args.job, "rows": rows,
                      "sec": round(time.time() - t0, 3),
                      "output": args.output,
                      "checkpoint_dir": args.checkpoint_dir,
                      "resumed": bool(args.resume)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric follows BASELINE.json: PageRank **edges-processed/sec
to 1e-6 convergence** on a Common-Crawl-style web graph
(``edges_per_sec`` in the JSON; ``value`` is the wall-clock seconds of that
run, per the driver's unit contract).  Scaling-efficiency evidence
(local[8] vs local[32]) is produced separately by ``scripts/scaling.py``
and reported in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from networkx_spark.session import get_spark                       # noqa: E402
from networkx_spark.graph import Graph                             # noqa: E402
from networkx_spark.generators import web_edges, synthesize_pages  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def main():
    sf = sf_of(SF_DIR)
    spark = get_spark("networkx-spark-bench", cores=CPUS,
                      shuffle_partitions=CPUS)
    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- web graph (the north-star input shape) --------------------------
    n_pages = max(20_000, int(sf * 1_000_000))
    edges = web_edges(spark, n_pages, seed=42, as_urls=False).cache()
    m = edges.count()                      # materialize generator output
    g_web = Graph.from_edges(edges)

    # headline: PageRank to 1e-6 convergence; edges/sec = m * supersteps / t
    from networkx_spark.algorithms.pagerank import pagerank
    from networkx_spark.superstep import SuperstepRunner
    runner = SuperstepRunner(None, name="bench_pagerank")
    t0 = time.time()
    ranks = pagerank(g_web, alpha=0.85, tol=1e-6, max_iter=100, runner=runner)
    ranks.select(F.sum("rank")).collect()
    t_pr = round(time.time() - t0, 3)
    supersteps = len(runner.metrics)
    queries["pagerank_web_1e6"] = t_pr
    extras["pagerank_web_edges"] = m
    extras["pagerank_web_supersteps"] = supersteps
    extras["edges_per_sec"] = round(m * supersteps / t_pr, 1)

    # connected components on the same web graph
    from networkx_spark.algorithms.components import weakly_connected_components
    _, t = timed(lambda: weakly_connected_components(g_web)
                 .select("component").distinct().count())
    queries["connected_components_web"] = t

    # weighted SSSP from page 0 (deterministic hash-derived weights)
    from networkx_spark.algorithms.sssp import sssp_distances
    g_w = Graph.from_edges(
        edges.withColumn("w", (F.lit(1) + (F.col("src") * 31 + F.col("dst") * 17) % 9)
              .cast("double")), weight="w", combine="max")
    _, t = timed(lambda: sssp_distances(g_w, 0).count())
    queries["sssp_web"] = t

    # triangle counting (undirected web graph)
    from networkx_spark.algorithms.triangles import triangles
    g_und = g_web.to_undirected()
    _, t = timed(lambda: triangles(g_und).agg(F.sum("triangles")).collect())
    queries["triangles_web"] = t

    # label propagation on a web subgraph (coloring + sweeps dominate)
    from networkx_spark.algorithms.label_propagation import label_propagation_communities
    g_small = Graph.from_edges(web_edges(spark, 2_000, seed=42, as_urls=False),
                               directed=False)
    _, t = timed(lambda: label_propagation_communities(g_small)
                 .select("label").distinct().count())
    queries["label_propagation_web2k"] = t

    # sampled betweenness on the same 2k web subgraph (k=8 sources)
    from networkx_spark.algorithms.betweenness import betweenness_centrality
    _, t = timed(lambda: betweenness_centrality(g_small, k=8, seed=1)
                 .agg(F.sum("betweenness")).collect())
    queries["betweenness_web2k_k8"] = t

    # extraction throughput: pages html -> edges (Arrow UDF path)
    from networkx_spark.extract import edges_from_pages
    pages = synthesize_pages(spark, 5_000, seed=42)
    _, t = timed(lambda: edges_from_pages(pages).count())
    queries["extract_pages5k"] = t

    # ---- derived relational graph (oracle-checked operators) -------------
    from networkx_spark.entry_queries import (q_pagerank, q_triangles,
                                              q_connected_components)
    _, t = timed(lambda: q_pagerank(spark, SF_DIR).agg(F.sum("rank")).collect())
    queries["pagerank_lineitem_fixed10"] = t
    _, t = timed(lambda: q_triangles(spark, SF_DIR).agg(F.sum("triangles")).collect())
    queries["triangles_lineitem"] = t
    _, t = timed(lambda: q_connected_components(spark, SF_DIR)
                 .select("component").distinct().count())
    queries["cc_lineitem"] = t

    # ---- documents / embeddings pipeline ---------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from networkx_spark.pipeline.dedup import near_duplicates_minhash
    _, t = timed(lambda: near_duplicates_minhash(docs, k=3, threshold=0.5).count())
    queries["minhash_dedup_docs"] = t

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from networkx_spark.pipeline.similarity import cosine_topk_numpy
    _, t = timed(lambda: cosine_topk_numpy(emb, emb.filter("vec_id < 8"), k=5).count())
    queries["cosine_topk_numpy"] = t

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "pagerank_edges_processed_per_sec_to_1e-6",
        "value": t_pr,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": CPUS,
        "total_sec": total,
        **extras,
    }))


if __name__ == "__main__":
    main()

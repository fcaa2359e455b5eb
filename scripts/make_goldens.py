#!/usr/bin/env python
"""Regenerate the committed golden parquet snapshots (tests/golden/).

Two driver queries are deterministic (seed=42) but not SQL-expressible —
HTML link extraction and label propagation — so their driver oracle is a
golden snapshot of the engine's own output, committed to the repo.  Run
this script (and review the diff!) whenever the engine's deterministic
output legitimately changes; the driver then compares the live Spark run
against the pinned snapshot.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _mst_reference(spark):
    """MSF golden computed FROM THE REFERENCE's Kruskal — an independent
    oracle for the ``mst_forest`` gate row, not a self-pin.  Distinct
    weights (asserted) make the forest unique, so the engine's Borůvka
    must reproduce it edge-for-edge."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import networkx as nx

    from networkx_spark.entry_queries import _weighted_web_graph

    rows = _weighted_web_graph(spark).edges.collect()
    assert len({r.weight for r in rows}) == len(rows), \
        "weight tie: the MSF would not be unique — change the hash modulus"
    G = nx.Graph()
    for r in rows:
        G.add_edge(r.src, r.dst, weight=r.weight)
    data = [(int(min(u, v)), int(max(u, v)), round(float(d["weight"]), 2))
            for u, v, d in nx.minimum_spanning_edges(
                G, algorithm="kruskal", data=True)]
    return spark.createDataFrame(data, "src long, dst long, weight double")


def main() -> None:
    from pyspark.sql import functions as F

    from networkx_spark.entry_queries import (GOLDEN_DIR, q_asyn_fluidc,
                                              q_asyn_lpa, q_fast_lpa,
                                              q_lpa, q_louvain,
                                              q_maximal_matching)
    from networkx_spark.generators import synthesize_pages
    from networkx_spark.session import get_spark

    spark = get_spark("make-goldens", cores=8, shuffle_partitions=8)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from networkx_spark.entry_queries import (q_lfr_louvain,
                                              q_weight_matching_approx)
    jobs = [("mst_web200", lambda: _mst_reference(spark)),
            ("weight_matching_web200",
             lambda: q_weight_matching_approx(spark, "")),
            ("lfr_louvain_200", lambda: q_lfr_louvain(spark, "")),
            ("matching_web200", lambda: q_maximal_matching(spark, "")),
            ("label_propagation_web200", lambda: q_lpa(spark, "")),
            ("asyn_lpa_web200", lambda: q_asyn_lpa(spark, "")),
            ("louvain_web200", lambda: q_louvain(spark, "")),
            ("fast_lpa_web200", lambda: q_fast_lpa(spark, "")),
            ("asyn_fluidc_karate3", lambda: q_asyn_fluidc(spark, "")),
            # INPUT snapshot, not an output golden: the extraction oracle
            # re-derives edges from this raw html independently in DuckDB
            ("web_pages_500", lambda: synthesize_pages(spark, 500, seed=42)
             .select("url", F.col("html").cast("string").alias("html")))]
    for name, fn in jobs:
        # single file, no partitioning — a stable, reviewable snapshot
        df = fn()
        cols = list(df.columns)
        pdf = df.toPandas().sort_values(by=cols).reset_index(drop=True)
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{path}: {len(pdf)} rows, cols={cols}")


if __name__ == "__main__":
    main()

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank on the graph derived from the
sf0.001 tables.  ``queries()``/``oracle_sql()`` — one entry per implemented
operator (SURVEY.md §2); definitions live in
``networkx_spark/entry_queries.py`` so they are importable and tested
locally against DuckDB (``tests/test_entry_oracle.py``) the same way the
driver compares them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank (alpha=0.85, tol=1e-6) over the edge
    table derived from /root/testdata/sf0.001, top 20 vertices."""
    from networkx_spark.algorithms.pagerank import pagerank
    from networkx_spark.entry_queries import derived_graph

    g = derived_graph(spark, "/root/testdata/sf0.001")
    ranks = pagerank(g, alpha=0.85, tol=1e-6, max_iter=100)
    return (ranks.orderBy(F.desc("rank"), F.asc("id")).limit(20)
            .select("id", F.round("rank", 6).alias("rank")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from networkx_spark.entry_queries import QUERIES, ROWS_ONLY_QUERIES

    out = {name: fn for name, (fn, _sql) in QUERIES.items()}
    out.update(ROWS_ONLY_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from networkx_spark.entry_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items()}

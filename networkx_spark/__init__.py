"""networkx_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query surface of the reference library (NetworkX 3.4rc0.dev0,
``/root/reference``) on top of an edge table ``edges(src, dst[, weight])``
instead of an in-memory adjacency dict (reference data model:
``networkx/classes/graph.py:228-232``).  Everything is declared with the
DataFrame API so Catalyst handles pushdown/pruning/join planning; iterative
algorithms (PageRank, connected components, label propagation) run as
superstep loops with plan-cutting checkpoints.

This is NOT a port: the reference tells us WHAT to compute (operator
semantics, tie-breaking, convergence rules, test goldens), the architecture
here is Spark-first (joins + aggregations + Arrow/pandas-UDF kernels over
hash-partitioned blocks).
"""

from networkx_spark.graph import Graph
from networkx_spark.session import get_spark

from networkx_spark.algorithms.pagerank import pagerank, PowerIterationFailedConvergence
from networkx_spark.algorithms.pagerank_blocked import pagerank_blocked
from networkx_spark.algorithms.components import (
    connected_components, number_connected_components, weakly_connected_components)
from networkx_spark.algorithms.triangles import triangles, clustering, transitivity, average_clustering
from networkx_spark.algorithms.label_propagation import greedy_color, label_propagation_communities
from networkx_spark.algorithms.hits import hits
from networkx_spark.algorithms.kcore import core_number, k_core
from networkx_spark.algorithms.bfs import bfs_distances, descendants

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "get_spark",
    "pagerank",
    "pagerank_blocked",
    "PowerIterationFailedConvergence",
    "connected_components",
    "weakly_connected_components",
    "number_connected_components",
    "triangles",
    "clustering",
    "transitivity",
    "average_clustering",
    "label_propagation_communities",
    "greedy_color",
    "hits",
    "core_number",
    "k_core",
    "bfs_distances",
    "descendants",
    "__version__",
]

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
from networkx_spark.algorithms.label_propagation import (
    asyn_lpa_communities, fast_label_propagation_communities, greedy_color,
    label_propagation_communities)
from networkx_spark.algorithms.hits import hits
from networkx_spark.algorithms.kcore import core_number, k_core
from networkx_spark.algorithms.bfs import (
    NodeNotFound, bfs_distances, bfs_tree, descendants, predecessor,
    single_source_shortest_path)
from networkx_spark.algorithms.sssp import (
    shortest_path, single_source_dijkstra_path,
    single_source_dijkstra_path_length, sssp_distances, sssp_predecessors)
from networkx_spark.algorithms.kcore import k_truss
from networkx_spark.algorithms.assortativity import (
    attribute_assortativity_coefficient, degree_assortativity_coefficient,
    numeric_assortativity_coefficient)
from networkx_spark.algorithms.scc import (
    condensation, is_strongly_connected,
    number_strongly_connected_components, strongly_connected_components)
from networkx_spark.attributes import (
    get_edge_attributes, get_node_attributes,
    set_edge_attributes, set_node_attributes)
from networkx_spark.readwrite import (
    read_adjlist, read_edgelist, read_gml, read_graphml, read_pajek,
    write_adjlist, write_edgelist, write_gml, write_graphml, write_pajek)
from networkx_spark.algorithms.neighbor_degree import (
    average_degree_connectivity, average_neighbor_degree)
from networkx_spark.algorithms.centrality import (
    closeness_centrality, degree_centrality, harmonic_centrality,
    in_degree_centrality, out_degree_centrality)
from networkx_spark.algorithms.richclub import rich_club_coefficient
from networkx_spark.algorithms.boundary import edge_boundary, node_boundary
from networkx_spark.algorithms.kcore import (k_corona, k_crust, k_shell,
                                             onion_layers)
from networkx_spark.algorithms.triangles import square_clustering, generalized_degree
from networkx_spark.algorithms.distance_measures import (
    center, diameter, eccentricity, periphery, radius)
from networkx_spark.algorithms.triads import triadic_census
from networkx_spark.algorithms.distance_measures import (
    average_shortest_path_length, global_efficiency, wiener_index)
from networkx_spark.algorithms.bipartite import (
    NotBipartite, bipartite_color, bipartite_sets, is_bipartite)
from networkx_spark.algorithms.mis import maximal_independent_set
from networkx_spark.algorithms.dag import (
    transitive_closure, transitive_reduction)
from networkx_spark.algorithms.scc import flow_hierarchy
from networkx_spark.algorithms.structuralholes import (
    constraint, effective_size)
from networkx_spark.algorithms.voterank import voterank
from networkx_spark.algorithms.mst import (
    maximal_matching, maximum_spanning_edges, maximum_spanning_tree,
    minimum_spanning_edges, minimum_spanning_tree)

__version__ = "0.4.0"

__all__ = [
    "Graph",
    "get_spark",
    "pagerank",
    "pagerank_blocked",
    "PowerIterationFailedConvergence",
    "connected_components",
    "weakly_connected_components",
    "number_connected_components",
    "strongly_connected_components",
    "number_strongly_connected_components",
    "is_strongly_connected",
    "condensation",
    "triangles",
    "clustering",
    "transitivity",
    "average_clustering",
    "label_propagation_communities",
    "asyn_lpa_communities",
    "fast_label_propagation_communities",
    "greedy_color",
    "hits",
    "core_number",
    "k_core",
    "bfs_distances",
    "bfs_tree",
    "predecessor",
    "single_source_shortest_path",
    "descendants",
    "NodeNotFound",
    "sssp_distances",
    "sssp_predecessors",
    "single_source_dijkstra_path_length",
    "single_source_dijkstra_path",
    "shortest_path",
    "k_truss",
    "degree_assortativity_coefficient",
    "attribute_assortativity_coefficient",
    "numeric_assortativity_coefficient",
    "get_node_attributes",
    "set_node_attributes",
    "get_edge_attributes",
    "set_edge_attributes",
    "read_edgelist",
    "write_edgelist",
    "read_adjlist",
    "write_adjlist",
    "read_graphml",
    "write_graphml",
    "read_gml",
    "write_gml",
    "average_neighbor_degree",
    "average_degree_connectivity",
    "degree_centrality",
    "in_degree_centrality",
    "out_degree_centrality",
    "closeness_centrality",
    "harmonic_centrality",
    "rich_club_coefficient",
    "edge_boundary",
    "node_boundary",
    "k_shell",
    "k_crust",
    "k_corona",
    "onion_layers",
    "square_clustering",
    "generalized_degree",
    "eccentricity",
    "diameter",
    "radius",
    "center",
    "periphery",
    "triadic_census",
    "wiener_index",
    "average_shortest_path_length",
    "global_efficiency",
    "is_bipartite",
    "bipartite_color",
    "bipartite_sets",
    "NotBipartite",
    "maximal_independent_set",
    "transitive_closure",
    "transitive_reduction",
    "flow_hierarchy",
    "effective_size",
    "constraint",
    "voterank",
    "minimum_spanning_edges",
    "minimum_spanning_tree",
    "maximum_spanning_edges",
    "maximum_spanning_tree",
    "maximal_matching",
    "__version__",
]

# round-4 additions (second batch)
from networkx_spark.algorithms.bridges import (
    bfs_forest, bridge_labels, bridges, has_bridges,
    two_edge_connected_components)
from networkx_spark.algorithms.graph_hashing import (
    weisfeiler_lehman_graph_hash, weisfeiler_lehman_subgraph_hashes,
    wl_colors)
from networkx_spark.algorithms.walks import random_walks
from networkx_spark.algorithms.bipartite import (
    projected_graph, projection_weights, weighted_projected_graph)
from networkx_spark.algorithms.spectral import (
    algebraic_connectivity, fiedler_vector, spectral_bisection)
from networkx_spark.algorithms.trees import (
    dag_longest_path_dists, dag_longest_path_length, is_arborescence,
    is_branching, is_forest, is_graphical, is_tree)
from networkx_spark.algorithms.node_classification import (
    harmonic_function, local_and_global_consistency)
from networkx_spark.algorithms.summarization import (
    dedensify, moral_graph, snap_aggregation)
from networkx_spark.algorithms.euler import (
    has_eulerian_path, is_eulerian, is_tournament)
from networkx_spark.algorithms.cycles import (
    all_simple_paths, cycle_basis, has_cycle)
from networkx_spark.algorithms.cuts import (
    conductance, cut_size, edge_expansion, normalized_cut_size,
    partition_quality, volume)
from networkx_spark.algorithms.link_prediction import (
    adamic_adar_index, cn_soundarajan_hopcroft, jaccard_coefficient,
    preferential_attachment, resource_allocation_index,
    within_inter_cluster)
from networkx_spark.algorithms.mst import min_vertex_cover_approx
from networkx_spark.algorithms.bfs import ego_graph
from networkx_spark.pipeline.curation import (
    decontaminate, hash_sample, ngram_vocabulary, redact_pii,
    remove_duplicate_segments, segment_document_frequency, word_ngrams)
from networkx_spark.pipeline.sessions import session_stats, sessionize
from networkx_spark.extract import (
    anchor_text_per_target, anchors_from_pages, extract_anchors)
from networkx_spark.readwrite import from_graph6_bytes, to_graph6_bytes

# round-4 additions (third batch)
from networkx_spark.algorithms.betweenness import (
    betweenness_centrality, edge_betweenness_centrality)
from networkx_spark.algorithms.girvan_newman import girvan_newman
from networkx_spark.algorithms.simrank import (
    ExceededMaxIterations, simrank_similarity)
from networkx_spark.algorithms.distance_measures import (
    closeness_vitality, efficiency, local_efficiency)
from networkx_spark.algorithms.modularity_max import (
    greedy_modularity_communities)
from networkx_spark.algorithms.voronoi import voronoi_cells
from networkx_spark.algorithms.girvan_newman import edge_betweenness_partition
from networkx_spark.algorithms.regular import is_k_regular, is_regular
from networkx_spark.algorithms.trophic import (
    trophic_differences, trophic_incoherence_parameter, trophic_levels)
from networkx_spark.algorithms.cliques import (
    find_cliques, k_clique_communities)
from networkx_spark.algorithms.fluid import asyn_fluidc
from networkx_spark.algorithms.lca import (
    all_pairs_lowest_common_ancestor, lowest_common_ancestor)
from networkx_spark.algorithms.walk_counts import number_of_walks
from networkx_spark.algorithms.dfs import (
    dfs_edges, dfs_postorder_nodes, dfs_preorder_nodes, dfs_tree)
from networkx_spark.algorithms.dispersion import dispersion
from networkx_spark.algorithms.distance_measures import (
    degree_distance_indices, gutman_index, schultz_index)
from networkx_spark.algorithms.kernighan_lin import kernighan_lin_bisection
from networkx_spark.algorithms.percolation import percolation_centrality
from networkx_spark.algorithms.group import (
    group_closeness_centrality, group_degree_centrality,
    group_in_degree_centrality, group_out_degree_centrality)
from networkx_spark.algorithms.swap import double_edge_swap
from networkx_spark.algorithms.d_separation import d_separated, is_d_separator
from networkx_spark.operators.minors import (
    contracted_edge, contracted_nodes, identified_nodes, quotient_graph)
from networkx_spark.algorithms.tree_coding import (
    from_prufer_sequence, to_prufer_sequence)

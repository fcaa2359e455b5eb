"""Graph products vs the reference (``product.py:128,184,236,289``).

Reference product vertices are tuples ``(u, x)``; the engine flattens to
``f"{u}|{x}"`` — the comparison maps the reference output through the
same encoding.
"""
import networkx as nx
import pytest

from networkx_spark.graph import Graph
from networkx_spark.operators.products import (
    cartesian_product, lexicographic_product, strong_product, tensor_product)

G_EDGES = [(0, 1), (1, 2), (2, 0), (2, 3)]
H_EDGES = [("a", "b"), ("b", "c")]
G_NODES = [0, 1, 2, 3, 4]          # 4 is isolated
H_NODES = ["a", "b", "c"]


def _spark_pair(spark, directed):
    a = Graph.from_edge_list(spark, G_EDGES, directed=directed, nodes=G_NODES)
    b = Graph.from_edge_list(spark, H_EDGES, directed=directed, nodes=H_NODES)
    return a, b


def _nx_pair(directed):
    t = nx.DiGraph if directed else nx.Graph
    A, B = t(), t()
    A.add_nodes_from(G_NODES)
    A.add_edges_from(G_EDGES)
    B.add_nodes_from(H_NODES)
    B.add_edges_from(H_EDGES)
    return A, B


def _flat(node):
    return f"{node[0]}|{node[1]}"


def _ref_sets(P, directed):
    nodes = {_flat(n) for n in P.nodes}
    if directed:
        edges = {(_flat(u), _flat(v)) for u, v in P.edges}
    else:
        edges = {frozenset((_flat(u), _flat(v))) for u, v in P.edges}
    return nodes, edges


def _eng_sets(p, directed):
    nodes = {r["id"] for r in p.vertices().collect()}
    rows = [(r["src"], r["dst"]) for r in p.edges.collect()]
    edges = set(rows) if directed else {frozenset(t) for t in rows}
    return nodes, edges


PRODUCTS = [
    (tensor_product, nx.tensor_product),
    (cartesian_product, nx.cartesian_product),
    (strong_product, nx.strong_product),
    (lexicographic_product, nx.lexicographic_product),
]


@pytest.mark.parametrize("eng,ref", PRODUCTS,
                         ids=[f.__name__ for f, _ in PRODUCTS])
@pytest.mark.parametrize("directed", [False, True])
def test_product_matches_reference(spark, eng, ref, directed):
    a, b = _spark_pair(spark, directed)
    A, B = _nx_pair(directed)
    got_nodes, got_edges = _eng_sets(eng(a, b), directed)
    want_nodes, want_edges = _ref_sets(ref(A, B), directed)
    assert got_nodes == want_nodes
    assert got_edges == want_edges


def test_mixed_directedness_raises(spark):
    a = Graph.from_edge_list(spark, G_EDGES, directed=True)
    b = Graph.from_edge_list(spark, H_EDGES, directed=False)
    with pytest.raises(ValueError):
        tensor_product(a, b)


def test_tensor_weights_multiply(spark):
    a = Graph.from_edge_list(spark, [(0, 1, 2.0)], directed=True)
    b = Graph.from_edge_list(spark, [("x", "y", 3.0)], directed=True)
    rows = tensor_product(a, b).edges.collect()
    assert [(r["src"], r["dst"], r["weight"]) for r in rows] \
        == [("0|x", "1|y", 6.0)]


def test_lexicographic_guard(spark):
    a, b = _spark_pair(spark, False)
    with pytest.raises(ValueError):
        lexicographic_product(a, b, max_h_vertices=2)


# ------------------------------------------------------- power / rooted
from networkx_spark.operators.products import power, rooted_product


@pytest.mark.parametrize("k", [1, 2, 3])
def test_power_matches_reference(spark, k):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    G = nx.Graph(edges)
    got = {frozenset((r["src"], r["dst"])) for r in power(g, k).edges.collect()}
    # from_edge_list canonicalizes fixture ids to strings
    want = {frozenset((str(u), str(v))) for u, v in nx.power(G, k).edges}
    assert got == want


def test_power_guards(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        power(g, 0)
    with pytest.raises(ValueError):
        power(Graph.from_edge_list(spark, [(0, 1)], directed=True), 2)
    with pytest.raises(ValueError):
        power(Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)],
                                   directed=False), 2, max_edges=3)


def test_rooted_product_matches_reference(spark):
    g = Graph.from_edge_list(spark, G_EDGES, directed=False, nodes=G_NODES)
    h = Graph.from_edge_list(spark, H_EDGES, directed=False, nodes=H_NODES)
    A, B = _nx_pair(False)
    got_nodes, got_edges = _eng_sets(rooted_product(g, h, "a"), False)
    want_nodes, want_edges = _ref_sets(nx.rooted_product(A, B, "a"), False)
    assert got_nodes == want_nodes
    assert got_edges == want_edges


def test_rooted_product_root_missing(spark):
    g = Graph.from_edge_list(spark, G_EDGES, directed=False)
    h = Graph.from_edge_list(spark, H_EDGES, directed=False)
    with pytest.raises(ValueError):
        rooted_product(g, h, "zzz")

"""Tree recognition + DAG longest path vs the reference."""

import networkx as nx
import pytest

from networkx_spark.algorithms.trees import (
    dag_longest_path_dists, dag_longest_path_length, is_arborescence,
    is_branching, is_forest, is_tree)
from networkx_spark.graph import Graph


def _graph(spark, nxg):
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"),
                            directed=nxg.is_directed())


RECOG = [
    (nx.path_graph(5), True, True),
    (nx.cycle_graph(4), False, False),
    (nx.Graph([(0, 1), (2, 3)]), False, True),      # forest, 2 components
    (nx.karate_club_graph(), False, False),
]


@pytest.mark.parametrize("nxg,tree,forest", RECOG,
                         ids=["path", "cycle", "forest2", "karate"])
def test_recognition_undirected(spark, nxg, tree, forest):
    g = _graph(spark, nxg)
    assert is_tree(g) == tree == nx.is_tree(nxg)
    assert is_forest(g) == forest == nx.is_forest(nxg)


def test_recognition_directed(spark):
    arb = nx.DiGraph([(0, 1), (0, 2), (1, 3)])
    g = _graph(spark, arb)
    assert is_arborescence(g) == nx.is_arborescence(arb) is True
    assert is_branching(g) == nx.is_branching(arb) is True
    two_in = nx.DiGraph([(0, 2), (1, 2)])     # in-degree 2: not a branching
    g2 = _graph(spark, two_in)
    assert is_branching(g2) == nx.is_branching(two_in) is False
    assert is_arborescence(g2) is False


def test_dag_longest_path_length(spark):
    dag = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (2, 5)])
    g = _graph(spark, dag)
    assert dag_longest_path_length(g) == nx.dag_longest_path_length(dag)


def test_dag_longest_path_dists_and_preds(spark):
    dag = nx.gnr_graph(30, 0.2, seed=4).reverse()   # random DAG
    g = _graph(spark, dag)
    rows = {r.id: r for r in dag_longest_path_dists(g).collect()}
    # per-vertex DP values vs reference recurrence
    order = list(nx.topological_sort(dag))
    want = {}
    for v in order:
        preds = list(dag.predecessors(v))
        want[v] = max((want[u] + 1 for u in preds), default=0)
    assert {v: int(r.dist) for v, r in rows.items()} == want
    for v, r in rows.items():
        if r.pred is not None:      # pred realizes the max
            assert want[r.pred] + 1 == want[v]
            assert dag.has_edge(r.pred, v)


def test_empty_graph_raises(spark):
    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="no nodes"):
        is_tree(Graph.from_edges(e, directed=False))


def test_is_graphical_matches_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.trees import is_graphical
    seqs = [
        [3, 3, 3, 3],            # K4: graphical
        [4, 3, 2, 1],            # odd sum: not
        [5, 3, 3, 3, 3, 3],      # graphical
        [6, 6, 6, 1, 1, 1, 1],   # violates EG: not
        [0, 0, 0],               # empty graph: graphical
        list(dict(nx.karate_club_graph().degree()).values()),
    ]
    for seq in seqs:
        df = spark.createDataFrame([(int(x),) for x in seq], "d long")
        assert is_graphical(df) == nx.is_graphical(seq), seq


def test_ego_graph_matches_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.bfs import ego_graph
    from networkx_spark.graph import Graph
    nxg = nx.karate_club_graph()
    g = Graph.from_edges(
        spark.createDataFrame(list(nxg.edges()), "src long, dst long"),
        directed=False)
    for radius, center in [(1, True), (2, True), (1, False)]:
        eg = ego_graph(g, 5, radius=radius, center=center)
        ref = nx.ego_graph(nxg, 5, radius=radius, center=center)
        got_v = {r.id for r in eg.vertices().collect()}
        assert got_v == set(ref.nodes())
        got_e = {tuple(sorted((r.src, r.dst)))
                 for r in eg.edges.select("src", "dst").collect()}
        assert got_e == {tuple(sorted(e)) for e in ref.edges()}

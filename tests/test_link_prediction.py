"""Link-prediction indices vs the reference oracle (link_prediction.py)."""

import networkx as nx
import pytest

from networkx_spark import Graph
from networkx_spark.algorithms.link_prediction import (
    adamic_adar_index,
    candidate_pairs,
    jaccard_coefficient,
    preferential_attachment,
    resource_allocation_index,
)
from networkx_spark.generators import KARATE_EDGES


def _karate(spark):
    return Graph.from_edge_list(spark, KARATE_EDGES, directed=False)


def _ref():
    G = nx.Graph()
    G.add_edges_from(KARATE_EDGES)
    return G


def _scores(df):
    return {(r["u"], r["v"]): pytest.approx(r["score"], rel=1e-12)
            for r in df.collect()}


def _ref_scores(gen, nonzero_only=True):
    out = {}
    for u, v, s in gen:
        a, b = (str(u), str(v)) if str(u) < str(v) else (str(v), str(u))
        if s or not nonzero_only:
            out[(a, b)] = s
    return out


def _ordered_pairs(spark, g):
    """All candidate pairs, normalized to string-id lexicographic order to
    match the engine's u<v wedge orientation."""
    return candidate_pairs(g)


def test_candidate_pairs_are_nonedges_with_common_neighbor(spark):
    g = _karate(spark)
    G = _ref()
    got = {(r["u"], r["v"]) for r in candidate_pairs(g).collect()}
    want = {tuple(sorted((str(u), str(v))))
            for u, v in nx.non_edges(G)
            if len(list(nx.common_neighbors(G, u, v))) > 0}
    assert got == want


@pytest.mark.parametrize("engine_fn,ref_fn", [
    (resource_allocation_index, nx.resource_allocation_index),
    (jaccard_coefficient, nx.jaccard_coefficient),
    (adamic_adar_index, nx.adamic_adar_index),
])
def test_index_matches_reference_on_candidates(spark, engine_fn, ref_fn):
    g = _karate(spark)
    got = _scores(engine_fn(g))
    want = _ref_scores(ref_fn(_ref()))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]


def test_explicit_pairs_including_existing_edges(spark):
    # the reference scores any ebunch, edges included
    g = _karate(spark)
    pairs = spark.createDataFrame([("0", "1"), ("0", "33")], ["u", "v"])
    got = _scores(jaccard_coefficient(g, pairs))
    want = _ref_scores(nx.jaccard_coefficient(_ref(), [(0, 1), (0, 33)]),
                       nonzero_only=False)
    assert got == want


def test_preferential_attachment_matches_reference(spark):
    g = _karate(spark)
    pairs = spark.createDataFrame(
        [("0", "5"), ("2", "33"), ("12", "21")], ["u", "v"])
    got = _scores(preferential_attachment(g, pairs))
    want = {}
    for u, v, s in nx.preferential_attachment(_ref(), [(0, 5), (2, 33), (12, 21)]):
        want[(str(u), str(v))] = float(s)
    assert got == want


def test_directed_raises(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=True)
    with pytest.raises(ValueError, match="directed"):
        jaccard_coefficient(g)


def test_cn_soundarajan_hopcroft_matches_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.link_prediction import cn_soundarajan_hopcroft
    from networkx_spark.graph import Graph
    nxg = nx.karate_club_graph()
    for v in nxg:
        nxg.nodes[v]["community"] = 0 if v < 17 else 1
    g = Graph.from_edges(
        spark.createDataFrame(list(nxg.edges()), "src long, dst long"),
        directed=False)
    com = spark.createDataFrame([(v, 0 if v < 17 else 1) for v in nxg],
                                "id long, community int")
    pairs = [(0, 33), (2, 8), (5, 16), (1, 12)]
    pdf = spark.createDataFrame(pairs, "u long, v long")
    got = {(r.u, r.v): r.score
           for r in cn_soundarajan_hopcroft(g, com, pdf).collect()}
    want = {(u, v): s for u, v, s in
            nx.cn_soundarajan_hopcroft(nxg, pairs, community="community")}
    assert got == want


def test_within_inter_cluster_matches_reference(spark):
    import networkx as nx
    from networkx_spark.algorithms.link_prediction import within_inter_cluster
    from networkx_spark.graph import Graph
    import pytest as _pt
    nxg = nx.karate_club_graph()
    for v in nxg:
        nxg.nodes[v]["community"] = 0 if v < 17 else 1
    g = Graph.from_edges(
        spark.createDataFrame(list(nxg.edges()), "src long, dst long"),
        directed=False)
    com = spark.createDataFrame([(v, 0 if v < 17 else 1) for v in nxg],
                                "id long, community int")
    pairs = [(0, 7), (2, 8), (25, 31), (0, 33)]
    pdf = spark.createDataFrame(pairs, "u long, v long")
    got = {(r.u, r.v): r.score
           for r in within_inter_cluster(g, com, pairs=pdf).collect()}
    want = {(u, v): s for u, v, s in
            nx.within_inter_cluster(nxg, pairs, community="community")}
    for k in want:
        assert got[k] == _pt.approx(want[k], abs=1e-6)
    with _pt.raises(ValueError):
        within_inter_cluster(g, com, delta=0.0, pairs=pdf)

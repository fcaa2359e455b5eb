"""The spark-submit entrypoint (``scripts/run_job.py``) end-to-end in
local mode: ``main()`` reuses the active test session via ``getOrCreate``
— on a cluster the same code inherits the spark-submit master instead."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import run_job  # noqa: E402

from tests.conftest import as_dict  # noqa: E402


@pytest.fixture
def edges_path(spark, tmp_path):
    p = str(tmp_path / "edges")
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")],
        "src string, dst string").write.parquet(p)
    return p


def test_pagerank_job(spark, edges_path, tmp_path, capsys):
    out = str(tmp_path / "pr")
    # tol=1e-8 needs ~105 power iterations on this cycle (rate ~alpha);
    # the reference's own default max_iter=100 would raise too, so raise it
    rc = run_job.main(["--job", "pagerank", "--edges", edges_path,
                       "--output", out, "--tol", "1e-8", "--max-iter", "200"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["job"] == "pagerank" and metrics["rows"] == 4
    import networkx as nx
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
    want = _pagerank_python(nx.DiGraph([("a", "b"), ("b", "c"), ("c", "a"),
                                        ("d", "a")]), tol=1e-8, max_iter=200)
    got = as_dict(spark.read.parquet(out), "id", "rank")
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_cc_and_triangles_jobs(spark, edges_path, tmp_path, capsys):
    out_cc = str(tmp_path / "cc")
    assert run_job.main(["--job", "cc", "--edges", edges_path,
                         "--undirected", "--output", out_cc]) == 0
    comp = as_dict(spark.read.parquet(out_cc), "id", "component")
    assert len(set(comp.values())) == 1 and len(comp) == 4

    out_tri = str(tmp_path / "tri")
    assert run_job.main(["--job", "triangles", "--edges", edges_path,
                         "--undirected", "--output", out_tri]) == 0
    tri = as_dict(spark.read.parquet(out_tri), "id", "triangles")
    assert tri == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_sssp_job_requires_source(spark, edges_path, tmp_path):
    with pytest.raises(SystemExit):
        run_job.main(["--job", "sssp", "--edges", edges_path,
                      "--output", str(tmp_path / "x")])


def test_extract_job(spark, tmp_path, capsys):
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "web_pages_500.parquet")
    out = str(tmp_path / "edges_out")
    assert run_job.main(["--job", "extract", "--pages", golden,
                         "--output", out]) == 0
    e = spark.read.parquet(out)
    assert {"src", "dst"} <= set(e.columns)
    assert e.count() > 0

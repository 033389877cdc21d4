"""The spark-submit job driver (jobs/pagerank.py) — the engine's CLI
lifecycle (SURVEY.md §3.1 analog) driven in-process."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_TOY7, edges_df


@pytest.fixture()
def edges_parquet(spark, tmp_path):
    path = str(tmp_path / "edges.parquet")
    edges_df(spark, G_TOY7).write.parquet(path)
    return path


def _run_job(args):
    import importlib

    mod = importlib.import_module("pagerank")
    # jobs module resolves the active test session via getActiveSession
    return mod.main(args)


def test_job_pagerank_writes_ranked_output_and_manifest(spark, edges_parquet, tmp_path, capsys):
    out = str(tmp_path / "pr_out")
    manifest_path = str(tmp_path / "manifest.json")
    rc = _run_job(
        [
            "--edges", edges_parquet,
            "--algorithm", "pagerank",
            "--threshold", "0.001",
            "--max-iter", "50",
            "--out", out,
            "--manifest", manifest_path,
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.columns == ["v", "rank"]
    assert got.count() == 7
    manifest = json.loads(open(manifest_path).read())
    assert manifest["converged"] is True
    assert manifest["algorithm"] == "pagerank"
    assert manifest["edges"] > 0 and manifest["search_depth"] > 0
    # manifest JSON is also printed as one line (driver contract)
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert line and json.loads(line[-1])["converged"] is True


def test_job_cc_matches_library(spark, edges_parquet, tmp_path):
    from gunrock_spark.algorithms.components import connected_components

    out = str(tmp_path / "cc_out")
    rc = _run_job(["--edges", edges_parquet, "--algorithm", "cc", "--out", out])
    assert rc == 0
    got = {r["v"]: r["label"] for r in spark.read.parquet(out).collect()}
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    want = {r["v"]: r["label"] for r in connected_components(g).state.collect()}
    assert got == want


def test_job_pages_generate_round_trips(spark, tmp_path):
    out = str(tmp_path / "pr_pages")
    rc = _run_job(
        ["--pages-generate", "64", "--algorithm", "pagerank", "--out", out]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_job_pagerank_warm_start_from_previous_out(spark, edges_parquet, tmp_path):
    out1 = str(tmp_path / "pr_run1")
    rc = _run_job(["--edges", edges_parquet, "--threshold", "1e-7",
                   "--max-iter", "200", "--out", out1])
    assert rc == 0
    # second crawl warm-starts from the first run's ranked output
    out2 = str(tmp_path / "pr_run2")
    manifest_path = str(tmp_path / "m2.json")
    rc = _run_job(["--edges", edges_parquet, "--threshold", "1e-7",
                   "--max-iter", "200", "--init-ranks", out1,
                   "--out", out2, "--manifest", manifest_path])
    assert rc == 0
    import json as _json

    manifest = _json.loads(open(manifest_path).read())
    assert manifest["search_depth"] <= 2  # already at the fixed point
    r1 = {r["v"]: r["rank"] for r in spark.read.parquet(out1).collect()}
    r2 = {r["v"]: r["rank"] for r in spark.read.parquet(out2).collect()}
    assert all(abs(r1[v] - r2[v]) < 1e-6 for v in r1)


def test_job_cc_warm_start_from_previous_labels(spark, edges_parquet, tmp_path):
    out1 = str(tmp_path / "cc_run1")
    rc = _run_job(["--edges", edges_parquet, "--algorithm", "cc", "--out", out1])
    assert rc == 0
    out2 = str(tmp_path / "cc_run2")
    manifest_path = str(tmp_path / "mcc.json")
    rc = _run_job(["--edges", edges_parquet, "--algorithm", "cc",
                   "--init-labels", out1, "--out", out2,
                   "--manifest", manifest_path])
    assert rc == 0
    import json as _json

    assert _json.loads(open(manifest_path).read())["search_depth"] == 1
    l1 = {(r["v"], r["label"]) for r in spark.read.parquet(out1).collect()}
    l2 = {(r["v"], r["label"]) for r in spark.read.parquet(out2).collect()}
    assert l1 == l2


def test_job_host_level_pagerank(spark, tmp_path):
    """--host-level rolls page links up to the host graph (2048 pages
    span 3 url_for hosts) and writes the host dictionary."""
    out = str(tmp_path / "hostpr")
    rc = _run_job(["--pages-generate", "2048", "--host-level",
                   "--algorithm", "pagerank", "--out", out])
    assert rc == 0
    hosts = spark.read.parquet(out + "_hosts")
    assert hosts.count() >= 2
    ranks = spark.read.parquet(out)
    assert ranks.count() == hosts.count()


def test_job_host_level_weighted_pagerank(spark, tmp_path):
    out = str(tmp_path / "hostprw")
    rc = _run_job(["--pages-generate", "2048", "--host-level", "--weighted",
                   "--algorithm", "pagerank", "--out", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.columns == ["v", "rank"] and got.count() > 0


def test_job_weighted_requires_weight_column(spark, edges_parquet, tmp_path):
    rc = _run_job(["--edges", edges_parquet, "--weighted",
                   "--algorithm", "pagerank", "--out", str(tmp_path / "w")])
    assert rc == 2


def test_job_host_level_requires_pages(spark, edges_parquet, tmp_path):
    with pytest.raises(SystemExit):
        _run_job(["--edges", edges_parquet, "--host-level",
                  "--out", str(tmp_path / "x")])


def test_job_rejects_mismatched_warm_start_flags(spark, edges_parquet, tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _run_job(["--edges", edges_parquet, "--algorithm", "cc",
                  "--init-ranks", "whatever", "--out", str(tmp_path / "x")])
    with _pytest.raises(SystemExit):
        _run_job(["--edges", edges_parquet, "--algorithm", "pagerank",
                  "--init-labels", "whatever", "--out", str(tmp_path / "y")])


def test_job_pages_generate_zero_is_clear_argparse_error(spark, tmp_path, capsys):
    """'--pages-generate 0' used to pass the mutually-exclusive group,
    fail both truthiness dispatch branches, and crash with NameError;
    it must be a clean argparse error."""
    with pytest.raises(SystemExit) as exc:
        _run_job(["--pages-generate", "0", "--out", str(tmp_path / "o")])
    assert exc.value.code == 2
    assert "must be positive" in capsys.readouterr().err


@pytest.mark.parametrize(
    "algo,extra",
    [
        ("bfs", ["--mark-pred"]),
        ("sssp", []),
        ("widest", []),
        ("bc", ["--num-sources", "2"]),
        ("hits", ["--max-iter", "3"]),
        ("salsa", ["--max-iter", "3"]),
        ("wtf", ["--max-iter", "5"]),
        ("topk", ["--k", "3"]),
        ("kcore", ["--k", "1"]),
        ("ktruss", ["--k", "3"]),
        ("trussness", ["--k", "4"]),
        ("msf", []),
        ("mis", []),
        ("corenums", []),
        ("walks", ["--walk-length", "3", "--walks-per-vertex", "2"]),
        ("node2vec", ["--walk-length", "3", "--p", "2", "--q", "3"]),
        ("khop", ["--fanouts", "3", "2"]),
        ("daglevels", ["--max-iter", "4"]),
        ("fiedler", ["--max-iter", "4"]),
        ("wwalks", ["--walk-length", "3", "--walks-per-vertex", "2"]),
        ("simrank", ["--walk-length", "3", "--walks-per-vertex", "4",
                     "--num-sources", "3"]),
        ("scc", []),
        ("bowtie", []),
        ("anf", ["--max-iter", "3"]),
        ("disthist", ["--max-iter", "3"]),
        ("effdiam", ["--max-iter", "3"]),
        ("icspread", ["--num-sources", "2", "--ic-p-milli", "600"]),
        ("percolation", []),
        ("ddseeds", ["--k", "3", "--ic-p-milli", "300"]),
        ("attack", ["--k", "4"]),
        ("harmonic", ["--max-iter", "3"]),
        ("closeness", ["--max-iter", "3"]),
        ("linkpred", ["--k", "10"]),
        ("color", ["--impl", "minmax"]),
        ("katz", ["--max-iter", "4"]),
        ("eigenvector", ["--max-iter", "4"]),
        ("matching", []),
        ("trustrank", ["--num-sources", "2", "--max-iter", "4"]),
        ("absorption", ["--num-sources", "2", "--max-iter", "3"]),
        ("squares", []),
        ("densest", ["--max-iter", "20"]),
        ("landmarks", ["--k", "2"]),
        ("conductance", ["--max-iter", "2"]),
    ],
)
def test_job_full_reference_cli_surface(spark, edges_parquet, tmp_path, capsys, algo, extra):
    """Every reference CLI binary (tests/{bfs,sssp,bc,hits,salsa,wtf,
    topk}) has a jobs-driver analog that runs end-to-end and writes
    non-empty parquet."""
    out = str(tmp_path / f"out_{algo}")
    rc = _run_job(
        ["--edges", edges_parquet, "--algorithm", algo, "--out", out] + extra
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["algorithm"] == algo


def test_job_walks_skipgram_window(spark, edges_parquet, tmp_path, capsys):
    out = str(tmp_path / "out_sg")
    rc = _run_job(["--edges", edges_parquet, "--algorithm", "walks",
                   "--walk-length", "3", "--walks-per-vertex", "2",
                   "--skipgram-window", "2", "--out", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"center", "context", "n"}
    assert got.count() > 0


def test_job_tcdoulion_matches_library(spark, edges_parquet, tmp_path):
    from gunrock_spark.algorithms.triangles import triangle_count_doulion

    out = str(tmp_path / "tcd_out")
    rc = _run_job(["--edges", edges_parquet, "--algorithm", "tcdoulion",
                   "--doulion-num", "1", "--doulion-den", "1", "--out", out])
    assert rc == 0
    got = spark.read.parquet(out).collect()[0]
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    want = triangle_count_doulion(g, num=1, den=1).collect()[0]
    assert got["sampled_triangles"] == want["sampled_triangles"]
    assert got["est_triangles"] == want["est_triangles"]

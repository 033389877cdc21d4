"""Katz + eigenvector centrality vs pure-Python/numpy replicas."""

import pytest

from gunrock_spark.algorithms.katz import eigenvector_centrality, katz_centrality
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_PR4, G_TOY7, edges_df, rmat_edges


def _py_katz(edges, alpha, beta, iters):
    verts = sorted({v for e in edges for v in e})
    x = {v: beta for v in verts}
    for _ in range(iters):
        msg = {v: 0.0 for v in verts}
        for s, d in edges:
            msg[d] += x[s]
        x = {v: beta + alpha * msg[v] for v in verts}
    return x


def _py_eigen(edges, iters):
    verts = sorted({v for e in edges for v in e})
    x = {v: 1.0 / len(verts) for v in verts}
    for _ in range(iters):
        msg = {v: 0.0 for v in verts}
        for s, d in edges:
            msg[d] += x[s]
        tot = sum(msg.values())
        if tot <= 0.0:
            x = {v: 0.0 for v in verts}
        else:
            x = {v: msg[v] / tot for v in verts}
    return x


def _clean(edges):
    return sorted({(s, d) for s, d in edges if s != d})


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7])
def test_katz_matches_python(spark, edge_list):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = katz_centrality(g, alpha=0.1, beta=1.0, max_iter=6)
    got = {r["v"]: r["score"] for r in res.state.collect()}
    want = _py_katz(_clean(edge_list), 0.1, 1.0, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert res.iterations == 6


def test_katz_rmat_skew_auto_matches_python(spark):
    edge_list = [(int(s), int(d)) for s, d in rmat_edges(scale=7, edge_factor=4, seed=3)]
    # bolt a mega-hub on so the hot tier actually engages
    edge_list = edge_list + [(0, d) for d in range(1, 100)]
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = katz_centrality(g, alpha=0.05, beta=1.0, max_iter=4, skew="auto")
    got = {r["v"]: r["score"] for r in res.state.collect()}
    want = _py_katz(_clean(edge_list), 0.05, 1.0, 4)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_katz_early_stop_tolerance(spark):
    # alpha small: geometric decay of deltas -> early stop well
    # before max_iter
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    res = katz_centrality(g, alpha=0.01, beta=1.0, max_iter=50, tol=1e-9)
    assert res.converged
    assert res.iterations < 50


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7])
def test_eigenvector_matches_python(spark, edge_list):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = eigenvector_centrality(g, max_iter=5)
    got = {r["v"]: r["score"] for r in res.state.collect()}
    want = _py_eigen(_clean(edge_list), 5)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_eigenvector_l1_norm_and_sink_graph(spark):
    # chain into a sink: mass collapses onto the tail but every
    # iteration stays L1-normalized
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    res = eigenvector_centrality(g, max_iter=2)
    rows = {r["v"]: r["score"] for r in res.state.collect()}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-12)
    want = _py_eigen([(0, 1), (1, 2), (2, 3)], 2)
    for v in want:
        assert rows[v] == pytest.approx(want[v], abs=1e-12)


def test_eigenvector_zero_in_mass_fixpoint(spark):
    # after 4 steps on a length-3 chain every vertex's in-mass is 0 ->
    # the zero vector, and further iterations keep it
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    res = eigenvector_centrality(g, max_iter=6)
    assert all(r["score"] == 0.0 for r in res.state.collect())


def test_katz_checkpoint_resume_bit_identical(spark, tmp_path):
    from pyspark.sql import functions as F

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    ckpt = str(tmp_path / "katz_ckpt")
    # full run (checkpoints at iteration 5 of 8)
    full = katz_centrality(g, alpha=0.1, max_iter=8, checkpoint_dir=ckpt,
                           checkpoint_interval=5)
    # resumed run continues from the snapshot and lands on the
    # identical truncated series
    resumed = katz_centrality(g, alpha=0.1, max_iter=8, checkpoint_dir=ckpt,
                              checkpoint_interval=5, resume=True)
    diff = (
        full.state.alias("a")
        .join(resumed.state.alias("b"), "v")
        .agg(F.max(F.abs(F.col("a.score") - F.col("b.score"))).alias("d"))
        .collect()[0]["d"]
    )
    assert diff == 0.0
    assert resumed.iterations == 8

import numpy as np
import pytest

from gunrock_spark.algorithms.pagerank import pagerank, ranked
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_PR4, G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges, pagerank_ref


def _run(spark, edge_list, n=None, **kw):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = pagerank(g, **kw)
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    n = n or (max(max(e) for e in edge_list) + 1)
    return np.array([got[v] for v in range(n)]), res


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7], ids=["g_pr4", "g_toy7"])
def test_pagerank_matches_reference_default_threshold(spark, edge_list):
    got, res = _run(spark, edge_list)
    ref = pagerank_ref(edge_list)
    assert np.allclose(got, ref, atol=1e-6, rtol=0)
    assert res.converged


def test_pagerank_strict_threshold_1e6(spark):
    got, res = _run(spark, G_TOY7, threshold=1e-9, max_iter=200)
    ref = pagerank_ref(G_TOY7, error=1e-9, max_iteration=200)
    assert np.allclose(got, ref, atol=1e-6, rtol=0)
    # true PageRank property: ranks sum to ~1 on a graph with no danglers
    assert abs(got.sum() - 1.0) < 1e-6


def test_pagerank_dangling_compensate(spark):
    # G_PR4 has no dangling vertex; add one (vertex 4 with only in-edges)
    edge_list = G_PR4 + [(0, 4)]
    got, res = _run(spark, edge_list, compensate=True)
    ref = pagerank_ref(edge_list, compensate=True)
    assert np.allclose(got, ref, atol=1e-6, rtol=0)


def test_pagerank_without_compensate_loses_dangling_mass(spark):
    edge_list = G_PR4 + [(0, 4)]
    got, _ = _run(spark, edge_list)
    ref = pagerank_ref(edge_list)
    assert np.allclose(got, ref, atol=1e-6, rtol=0)
    assert got.sum() < 1.0  # mass lost through the dangler, by design


def test_pagerank_scaled_mode(spark):
    # unnormalized (scaled) mode — reference requires undirected input
    sym = G_TOY7  # toy7 is symmetric already
    got, _ = _run(spark, sym, normalized=False)
    ref = pagerank_ref(sym, scaled=True)
    assert np.allclose(got, ref, atol=1e-6, rtol=0)


def test_pagerank_rmat_power_law(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=3)]
    edge_list = clean_edges(raw)
    vs = sorted({v for e in edge_list for v in e})
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = pagerank(g, threshold=1e-10, max_iter=100)
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    # oracle over the same vertex set: relabel to dense ids
    idx = {v: i for i, v in enumerate(vs)}
    dense = [(idx[s], idx[d]) for s, d in edge_list]
    ref = pagerank_ref(dense, n=len(vs), error=1e-10, max_iteration=100)
    got_arr = np.array([got[v] for v in vs])
    assert np.allclose(got_arr, ref, atol=1e-6, rtol=0)


def test_ranked_output_stable_order(spark):
    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    res = pagerank(g)
    rows = ranked(res.state).collect()
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # metrics manifest contract
    m = res.manifest(algorithm="pagerank")
    assert m["search_depth"] == res.iterations
    assert len(m["per_iteration"]) == res.iterations


def test_pagerank_blocks_impl_matches_join_impl(spark):
    """The CSR-block gather-scatter path (engine/csr_blocks.py) is an
    alternative physical plan for the same logical advance — results
    must match the join path to summation-order ULP noise."""
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=9)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    join_res = pagerank(g, threshold=0.0, max_iter=8, impl="join")
    blocks_res = pagerank(g, threshold=0.0, max_iter=8, impl="blocks")
    a = {r["v"]: r["rank"] for r in join_res.state.collect()}
    b = {r["v"]: r["rank"] for r in blocks_res.state.collect()}
    assert set(a) == set(b)
    assert all(abs(a[v] - b[v]) < 1e-12 for v in a)


def test_pagerank_blocks_impl_dangling_compensate(spark):
    edge_list = [(0, 1), (1, 2), (2, 0), (0, 3), (2, 3)]  # 3 is dangling
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    join_res = pagerank(g, compensate=True, threshold=1e-9, max_iter=100, impl="join")
    blocks_res = pagerank(g, compensate=True, threshold=1e-9, max_iter=100, impl="blocks")
    a = {r["v"]: r["rank"] for r in join_res.state.collect()}
    b = {r["v"]: r["rank"] for r in blocks_res.state.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[v] - b[v]) < 1e-12 for v in a)


def test_pagerank_blocks_impl_unknown_rejected(spark):
    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    with pytest.raises(ValueError):
        pagerank(g, impl="nope")


def test_warm_start_same_fixed_point_fewer_iterations(spark):
    """init_ranks warm start: unique fixed point => same converged
    values; on an unchanged graph a warm start from converged ranks
    stops immediately, and after an incremental edge update it
    re-converges faster than cold."""
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    cold = pagerank(g, threshold=1e-7, max_iter=200)

    # unchanged graph: already at the fixed point -> 1 iteration
    rewarm = pagerank(
        g, threshold=1e-7, max_iter=200, init_ranks=cold.state.select("v", "rank")
    )
    assert rewarm.iterations <= 2
    got_cold = {r["v"]: r["rank"] for r in cold.state.collect()}
    got_warm = {r["v"]: r["rank"] for r in rewarm.state.collect()}
    assert all(abs(got_warm[v] - got_cold[v]) < 1e-6 for v in got_cold)

    # incremental update: add edges, warm-start from the stale ranks
    g2 = EdgeTable.from_df(edges_df(spark, G_TOY7 + [(0, 6), (6, 0)]))
    cold2 = pagerank(g2, threshold=1e-9, max_iter=200)
    warm2 = pagerank(
        g2, threshold=1e-9, max_iter=200, init_ranks=cold.state.select("v", "rank")
    )
    c2 = {r["v"]: r["rank"] for r in cold2.state.collect()}
    w2 = {r["v"]: r["rank"] for r in warm2.state.collect()}
    assert all(abs(w2[v] - c2[v]) < 1e-6 for v in c2)
    assert warm2.iterations <= cold2.iterations


def test_pagerank_blocks_env_store_uri_and_fresh_graph(spark, tmp_path, monkeypatch):
    """Two ADVICE regressions on the block-store path:
    (a) a scheme'd SPARK_GRAFT_BLOCK_STORE (file:// URI) must be READ
        by the workers through pyarrow.fs — previously every block hit
        the missing-local-dir branch and PR silently converged to the
        reset vector;
    (b) a second pagerank(impl='blocks') run on a DIFFERENT graph in
        the same application must not serve stale worker-cached CSR
        slices (per-build uuid subdirectory)."""
    monkeypatch.setenv(
        "SPARK_GRAFT_BLOCK_STORE", "file://" + str(tmp_path / "shared_store")
    )
    g1 = EdgeTable.from_df(edges_df(spark, G_PR4))
    a = {r["v"]: r["rank"] for r in pagerank(g1, threshold=0.0, max_iter=6, impl="blocks").state.collect()}
    ref = {r["v"]: r["rank"] for r in pagerank(g1, threshold=0.0, max_iter=6, impl="join").state.collect()}
    assert a.keys() == ref.keys()
    assert all(abs(a[v] - ref[v]) < 1e-12 for v in a)
    # same application, updated graph — the stale-cache hazard
    g2 = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 0), (3, 0), (0, 3)]))
    b = {r["v"]: r["rank"] for r in pagerank(g2, threshold=0.0, max_iter=6, impl="blocks").state.collect()}
    ref2 = {r["v"]: r["rank"] for r in pagerank(g2, threshold=0.0, max_iter=6, impl="join").state.collect()}
    assert b.keys() == ref2.keys()
    assert all(abs(b[v] - ref2[v]) < 1e-12 for v in b)


def test_block_store_unsupported_scheme_fails_fast():
    """An unreadable store URI must raise at build time, never return
    empty frames (silent-wrong-results hazard)."""
    from gunrock_spark.engine.csr_blocks import _resolve_fs

    with pytest.raises(RuntimeError, match="URI scheme"):
        _resolve_fs("alluxio://nope/store")


def _py_trustrank(edges, seeds, d, iters):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    outd = {v: 0 for v in verts}
    clean = sorted({(s, t) for s, t in edges if s != t})
    for s, _ in clean:
        outd[s] += 1
    x = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        msg = {v: 0.0 for v in verts}
        for s, t in clean:
            msg[t] += x[s] / outd[s]
        x = {
            v: ((1.0 - d) / len(seeds) if v in seeds else 0.0) + d * msg[v]
            for v in verts
        }
    return x


def test_trustrank_matches_python(spark):
    from gunrock_spark.algorithms.pagerank import trustrank

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    seeds = [0, 2]
    res = trustrank(g, seeds, delta=0.85, threshold=0.0, max_iter=6)
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    want = _py_trustrank(G_TOY7, set(seeds), 0.85, 6)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_trustrank_mass_concentrates_at_seeds(spark):
    from gunrock_spark.algorithms.pagerank import trustrank

    # star out of seed 0: non-seed leaves only get flow-through trust
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (0, 2), (1, 0), (2, 0)]))
    res = trustrank(g, [0], threshold=0.0, max_iter=20)
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    assert got[0] > got[1] == got[2] > 0


def test_spam_mass_matches_python(spark):
    from gunrock_spark.algorithms.pagerank import spam_mass

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    seeds = [0, 2]
    got = {r["v"]: (r["pr"], r["rel_mass"]) for r in spam_mass(g, seeds, max_iter=6).collect()}
    # python reference: same two fixed-depth iterations, combined
    verts = sorted({v for e in G_TOY7 for v in e})
    n = len(verts)
    clean = sorted({(s, t) for s, t in G_TOY7 if s != t})
    outd = {v: 0 for v in verts}
    for s, _ in clean:
        outd[s] += 1
    pr = {v: 1.0 / n for v in verts}
    for _ in range(6):
        msg = {v: 0.0 for v in verts}
        for s, t in clean:
            msg[t] += pr[s] / outd[s]
        pr = {v: 0.15 / n + 0.85 * msg[v] for v in verts}
    tr = _py_trustrank(G_TOY7, set(seeds), 0.85, 6)
    scale = len(seeds) / n
    for v in verts:
        want = (pr[v] - scale * tr[v]) / pr[v]
        assert got[v][0] == pytest.approx(pr[v], abs=1e-12)
        assert got[v][1] == pytest.approx(want, abs=1e-9)


def test_spam_mass_spam_farm_scores_high(spark):
    from gunrock_spark.algorithms.pagerank import spam_mass

    # seed community {0,1} tightly linked; spam farm {3,4,5} boosts 2
    # with no in-links from the good side — 2's rank is almost all
    # non-core mass, so its rel_mass must exceed the good pages'.
    edges = [(0, 1), (1, 0), (3, 2), (4, 2), (5, 2), (2, 3), (2, 4), (2, 5)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    got = {r["v"]: r["rel_mass"] for r in spam_mass(g, [0, 1], max_iter=20).collect()}
    assert got[2] > 0.9
    assert got[0] < 0.5 and got[1] < 0.5


def test_trustrank_validation(spark):
    from gunrock_spark.algorithms.pagerank import pagerank, trustrank

    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    with pytest.raises(ValueError):
        trustrank(g, [])
    with pytest.raises(ValueError):
        pagerank(g, src=0, seed_set=[1])


def test_pagerank_compensate_one_action_per_iteration(spark):
    """Compensate mode keeps the sink scalar in driver loop state
    (refreshed by each iteration's single metrics aggregate) instead
    of a 1-row collect job per iteration (VERDICT r4 #9)."""
    raw = [(int(s), int(d)) for s, d in rmat_edges(8, 4, seed=21)]
    edge_list = clean_edges(raw)
    # ensure dangling vertices exist (in-edges only)
    top = max(max(e) for e in edge_list)
    edge_list = edge_list + [(0, top + 1), (1, top + 2)]
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    g.num_edges()
    g.num_vertices()
    g.degrees.count()

    sc = spark.sparkContext
    group = "pr-compensate-jobcount"
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup(group, "pr compensate job-count pin")
    try:
        res = pagerank(g, compensate=True, skew=False)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    # The loop's baseline is <=2 jobs/iteration (the metrics action
    # plus the lazy localCheckpoint's cache-materialization job — the
    # same shape as PLAIN pagerank). Compensate must add ZERO jobs on
    # top: the sink scalar rides the metrics aggregate, not a
    # dedicated 1-row collect (the old shape was ~3 jobs/iteration).
    assert len(jobs) <= 2 * res.iterations + 3, (len(jobs), res.iterations)
    assert res.iterations >= 3

    # oracle unchanged
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    vs = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(vs)}
    ref = pagerank_ref([(idx[s], idx[d]) for s, d in edge_list], compensate=True)
    import numpy as _np

    assert _np.allclose(
        _np.array([got[v] for v in vs]), ref, atol=1e-6, rtol=0
    )

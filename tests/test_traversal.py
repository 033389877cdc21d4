"""BFS / SSSP / BC against numpy oracles (reference CPU-check style,
SURVEY.md §5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.bc import bc_single_source
from gunrock_spark.algorithms.bfs import bfs
from gunrock_spark.algorithms.sssp import sssp
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_CC11, G_PR4, G_TOY7, edges_df, rmat_edges
from tests.oracles import bc_ref, bfs_ref, clean_edges, sssp_ref


def _graph(spark, edge_list):
    return EdgeTable.from_df(edges_df(spark, edge_list))


def _wgraph(spark, edge_list):
    # deterministic weights — same formula as sources.weighted_edges_df
    rows = [
        (s, d, float((s * 7 + d * 13) % 19 + 1)) for s, d in clean_edges(edge_list)
    ]
    df = spark.createDataFrame(rows, schema="src long, dst long, weight double")
    return EdgeTable.from_df(df, weight="weight")


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7, G_CC11], ids=["pr4", "toy7", "cc11"])
def test_bfs_depths_and_preds(spark, edge_list):
    res = bfs(_graph(spark, edge_list), source=0, mark_predecessors=True)
    got = {r["v"]: (r["depth"], r["pred"]) for r in res.state.collect()}
    ref = bfs_ref(edge_list, source=0)
    assert got == ref
    assert res.converged


def test_bfs_rmat(spark):
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(7, 8, seed=5)])
    res = bfs(_graph(spark, edge_list), source=0)
    got = {r["v"]: r["depth"] for r in res.state.collect()}
    ref = {v: d for v, (d, _) in bfs_ref(edge_list, source=0).items()}
    assert got == ref


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7, G_CC11], ids=["pr4", "toy7", "cc11"])
def test_sssp_distances(spark, edge_list):
    g = _wgraph(spark, edge_list)
    res = sssp(g, source=0)
    got = {
        r["v"]: r["dist"]
        for r in res.state.where(F.col("dist") != float("inf")).collect()
    }
    ref = sssp_ref(
        [(s, d, float((s * 7 + d * 13) % 19 + 1)) for s, d in clean_edges(edge_list)],
        source=0,
    )
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-9)
    assert res.converged


def test_sssp_delta_stepping_matches_plain(spark):
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(6, 8, seed=9)])
    g = _wgraph(spark, edge_list)
    plain = {
        r["v"]: r["dist"]
        for r in sssp(g, source=0).state.where(F.col("dist") != float("inf")).collect()
    }
    ds = {
        r["v"]: r["dist"]
        for r in sssp(g, source=0, delta=8.0)
        .state.where(F.col("dist") != float("inf"))
        .collect()
    }
    assert plain == ds


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7], ids=["pr4", "toy7"])
def test_bc_single_source(spark, edge_list):
    got_df = bc_single_source(_graph(spark, edge_list), source=0)
    got = {r["v"]: r["bc"] for r in got_df.collect()}
    ref = bc_ref(edge_list, source=0)
    n = max(max(e) for e in edge_list) + 1
    for v in range(n):
        assert got.get(v, 0.0) == pytest.approx(ref[v], abs=1e-6)


def test_bfs_pull_regime_matches_push_and_oracle(spark):
    """Direction-optimized BFS: forcing the pull (backward/CSC) regime
    from iteration 1 onward must give bit-identical depths AND
    predecessors to pure push and to the numpy oracle — pull's
    min(in-neighbor-in-frontier) is the same set as push's
    min(discovering src)."""
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=11)])
    g = _graph(spark, edge_list)
    push = bfs(g, source=0, mark_predecessors=True, direction_optimized=False)
    pull = bfs(g, source=0, mark_predecessors=True, pull_alpha=1e-9)
    a = {r["v"]: (r["depth"], r["pred"]) for r in push.state.collect()}
    b = {r["v"]: (r["depth"], r["pred"]) for r in pull.state.collect()}
    assert a == b
    assert a == bfs_ref(edge_list, source=0)
    regimes = [m["regime"] for m in pull.metrics]
    assert set(regimes) == {"pull"}  # alpha=1e-9 forces pull throughout


def test_bfs_selects_pull_on_huge_frontier(spark):
    """The default heuristic (frontier > unvisited) must pick pull on
    a web-ish level structure: one hub reaching most of |V| at level
    1, a small tail at level 2."""
    hub = [(0, v) for v in range(1, 81)]
    tail = [(v, 80 + (v % 20)) for v in range(1, 81) if 80 + (v % 20) > 80]
    g = _graph(spark, hub + tail)
    res = bfs(g, source=0, mark_predecessors=True)
    regimes = [m["regime"] for m in res.metrics]
    assert "pull" in regimes, regimes
    got = {r["v"]: (r["depth"], r["pred"]) for r in res.state.collect()}
    assert got == bfs_ref(clean_edges(hub + tail), source=0)


def test_bc_batched_multi_source_matches_numpy_sum(spark):
    """k sources in ONE forward/backward DataFrame pass must equal the
    per-source numpy Brandes oracle summed — and never collect vertex
    ids to the driver (VERDICT r1 #3)."""
    from gunrock_spark.algorithms.bc import betweenness_centrality, sample_sources

    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(6, 8, seed=3)])
    g = _graph(spark, edge_list)
    srcs = [r["source"] for r in sample_sources(g, 4).collect()]
    got_df = betweenness_centrality(g, sources=srcs)
    got = {r["v"]: r["bc"] for r in got_df.collect()}
    n = max(max(s, d) for s, d in edge_list) + 1
    ref = np.zeros(n)
    for s in srcs:
        ref += bc_ref(edge_list, source=s, n=n)
    for v, bc in got.items():
        assert bc == pytest.approx(ref[v], abs=1e-9)
    # default seeded sample path runs end-to-end too
    approx = betweenness_centrality(g, num_sources=3)
    assert approx.count() == g.num_vertices()


def test_bc_forward_one_job_per_level(spark):
    """VERDICT r2 #5: the forward sigma-BFS pays exactly ONE Spark job
    per level — the full new-level count doubles as both the stop
    probe and the action that materializes the lazily-checkpointed
    state (no separate limit(1) probe, no recompute)."""
    from gunrock_spark.algorithms.bc import _forward_batched

    edge_list = clean_edges(rmat_edges(9, 6, seed=11))
    g = _graph(spark, edge_list)
    g.edges.count()  # edge-table build jobs outside the counted group
    g.vertices.count()
    sources = spark.createDataFrame([(0,), (1,)], schema="source long")

    sc = spark.sparkContext
    group = "bc-fwd-jobcount"
    # AQE splits one action into one job per materialized stage, and a
    # broadcast-hash join runs an extra job to build each broadcast —
    # turn both off so job count == action count for the assertion
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup(group, "bc forward job-count pin")
    try:
        dag, max_depth = _forward_batched(g, sources)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    # 1 eager init checkpoint + one count per probed level
    # (levels 1 .. max_depth+1, the last one returning 0)
    assert len(jobs) <= max_depth + 2, (len(jobs), max_depth)
    assert max_depth > 2  # non-trivial BFS: the bound actually binds


def _py_seeded_lp(edges, seeds, iters, directed=False):
    verts = sorted({v for e in edges for v in e})
    adj = {}
    clean = {(s, d) for s, d in edges if s != d}
    if not directed:
        clean |= {(d, s) for s, d in clean}
    lab = {v: seeds.get(v) for v in verts}
    for _ in range(iters):
        from collections import Counter

        incoming = {v: Counter() for v in verts}
        for s, d in clean:
            if lab[s] is not None:
                incoming[d][lab[s]] += 1
        new = {}
        changed = False
        for v in verts:
            if v in seeds:
                new[v] = seeds[v]
            elif incoming[v]:
                best = sorted(incoming[v].items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                new[v] = best
            else:
                new[v] = lab[v]
            if new[v] != lab[v]:
                changed = True
        lab = new
        if not changed:
            break
    return lab


def test_seeded_lp_matches_python(spark):
    from gunrock_spark.algorithms.label_propagation import seeded_label_propagation
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import G_TOY7, edges_df

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    seeds = {0: 100, 5: 200}
    sdf = spark.createDataFrame(list(seeds.items()), schema="v long, label long")
    res = seeded_label_propagation(g, sdf, max_iter=10)
    got = {r.v: r.label for r in res.state.collect()}
    want = _py_seeded_lp(G_TOY7, seeds, 10)
    assert got == want
    # seeds stayed clamped
    assert got[0] == 100 and got[5] == 200


def test_seeded_lp_unreachable_stays_null(spark):
    from gunrock_spark.algorithms.label_propagation import seeded_label_propagation
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import edges_df

    # two components; seed only in the first
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (10, 11)]))
    sdf = spark.createDataFrame([(0, 7)], schema="v long, label long")
    res = seeded_label_propagation(g, sdf, max_iter=10)
    got = {r.v: r.label for r in res.state.collect()}
    assert got[0] == got[1] == got[2] == 7
    assert got[10] is None and got[11] is None
    assert res.converged


def test_reversed_bfs_k_hop_in_neighborhood(spark):
    from gunrock_spark.algorithms.bfs import bfs
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import edges_df

    # chain 3->2->1->0 plus a far link 9->3; 3-hop in-neighborhood of 0
    g = EdgeTable.from_df(edges_df(spark, [(3, 2), (2, 1), (1, 0), (9, 3)]))
    res = bfs(g.reversed(), 0, max_depth=3)
    got = {r.v: r.depth for r in res.state.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 9 is 4 hops away, cut off

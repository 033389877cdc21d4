import numpy as np

from gunrock_spark.algorithms.components import component_sizes, connected_components
from gunrock_spark.algorithms.label_propagation import label_propagation
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_CC11, G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges, connected_components_ref, label_propagation_mode_ref


def _labels(spark, edge_list, **kw):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = connected_components(g, **kw)
    return {r["v"]: r["label"] for r in res.state.collect()}, res


def test_cc_two_components_golden(spark):
    labels, res = _labels(spark, G_CC11)
    expect = connected_components_ref(G_CC11)
    assert labels == {v: int(expect[v]) for v in range(11)}
    assert res.converged
    sizes = {r["label"]: r["n_vertices"] for r in component_sizes(
        EdgeTable.from_df(edges_df(spark, G_CC11)).vertices.sparkSession.createDataFrame(
            list(labels.items()), "v long, label long"
        )
    ).collect()}
    assert sizes == {0: 7, 7: 4}


def test_cc_single_component(spark):
    labels, _ = _labels(spark, G_TOY7)
    assert set(labels.values()) == {0}


def test_cc_long_chain_pointer_jumping(spark):
    # a 64-vertex path: diameter 63; pointer jumping must converge in
    # O(log n) rounds, not 63
    chain = [(i, i + 1) for i in range(63)]
    labels, res = _labels(spark, chain)
    assert set(labels.values()) == {0}
    assert res.iterations <= 12


def test_cc_rmat(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 4, seed=11)]
    edge_list = clean_edges(raw)
    vs = sorted({v for e in edge_list for v in e})
    labels, _ = _labels(spark, edge_list)
    idx = {v: i for i, v in enumerate(vs)}
    dense = [(idx[s], idx[d]) for s, d in edge_list]
    ref = connected_components_ref(dense, n=len(vs))
    back = {i: v for v, i in idx.items()}
    expect = {back[i]: back[int(ref[i])] for i in range(len(vs))}
    assert labels == expect


def test_label_propagation_min_equals_cc(spark):
    g = EdgeTable.from_df(edges_df(spark, G_CC11))
    res = label_propagation(g, mode="min")
    labels = {r["v"]: r["label"] for r in res.state.collect()}
    expect = connected_components_ref(G_CC11)
    assert labels == {v: int(expect[v]) for v in range(11)}


def test_label_propagation_min_with_seeds(spark):
    # seed labels propagate: smallest seed wins per component
    g = EdgeTable.from_df(edges_df(spark, G_CC11))
    seeds = g.edges.sparkSession.createDataFrame(
        [(3, -5), (9, -9)], "v long, label long"
    )
    res = label_propagation(g, initial_labels=seeds, mode="min")
    labels = {r["v"]: r["label"] for r in res.state.collect()}
    assert all(labels[v] == -5 for v in range(7))
    assert all(labels[v] == -9 for v in range(7, 11))


def test_label_propagation_mode_matches_oracle(spark):
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    res = label_propagation(g, mode="mode", max_iter=4)
    labels = {r["v"]: r["label"] for r in res.state.collect()}
    ref = label_propagation_mode_ref(G_TOY7, n=7, max_iter=4)
    assert labels == {v: int(ref[v]) for v in range(7)}


def test_cc_warm_start_after_additive_update(spark):
    """init_labels warm start after adding edges: same labels as a
    cold run (upper-bound labeling converges to the same minimum),
    converges at least as fast, and a no-op update stops in 1 round."""
    g1 = EdgeTable.from_df(edges_df(spark, G_CC11))
    run1 = connected_components(g1)

    # unchanged graph -> already converged, one confirming round
    again = connected_components(
        g1, init_labels=run1.state.select("v", "label")
    )
    assert again.iterations == 1
    assert {(r["v"], r["label"]) for r in again.state.select("v", "label").collect()} == {
        (r["v"], r["label"]) for r in run1.state.select("v", "label").collect()
    }

    # additive update: bridge two components + a brand-new vertex
    bridged = G_CC11 + [(0, 7), (20, 0)]
    g2 = EdgeTable.from_df(edges_df(spark, bridged))
    cold = connected_components(g2)
    warm = connected_components(
        g2, init_labels=run1.state.select("v", "label")
    )
    want = {(r["v"], r["label"]) for r in cold.state.select("v", "label").collect()}
    got = {(r["v"], r["label"]) for r in warm.state.select("v", "label").collect()}
    assert got == want
    assert warm.iterations <= cold.iterations


def test_mis_independent_maximal_and_deterministic(spark):
    import hashlib

    from gunrock_spark.algorithms.mis import maximal_independent_set
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import rmat_edges_df

    g = EdgeTable.from_df(rmat_edges_df(spark, 9, 8, seed=3), num_partitions=4)
    res = maximal_independent_set(g)
    assert res.converged
    got = {r["v"]: r["in_mis"] for r in res.state.collect()}
    mis = {v for v, m in got.items() if m}

    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    adj: dict = {}
    verts = set()
    for s, d in edges:
        verts.add(s)
        verts.add(d)
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # independence + maximality
    assert all(not (a in mis and b in mis) for a, b in edges)
    assert all(v in mis or adj.get(v, set()) & mis for v in verts)
    assert set(got) == verts

    # exact match vs the python Luby oracle with identical h60 draws
    def h60(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:15], 16)

    alive, want, i = set(verts), set(), 0
    while alive:
        p = {v: h60(f"{v}:{i}") for v in alive}
        sel = {
            v
            for v in alive
            if all(p[v] < p[u] for u in adj.get(v, ()) if u in alive)
        }
        want |= sel
        dead = set()
        for v in sel:
            dead |= adj.get(v, set()) & alive
        alive -= sel | dead
        i += 1
    assert mis == want
    assert res.iterations == i


def test_induced_subgraph_filters_both_endpoints(spark):
    from gunrock_spark.algorithms.components import induced_subgraph
    from gunrock_spark.graph.generators import edges_df

    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 9)]))
    verts = spark.createDataFrame([(0,), (1,), (2,)], schema="v long")
    sub = induced_subgraph(g, verts)
    got = sorted((r.src, r.dst) for r in sub.edges.collect())
    assert got == [(0, 1), (1, 2)]


def test_giant_component_summary_two_blobs(spark):
    from gunrock_spark.algorithms.components import giant_component_summary
    from gunrock_spark.graph.generators import edges_df

    # blob A: 4 vertices / 4 directed edges; blob B: 3 vertices / 2
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    row = giant_component_summary(g).collect()[0]
    assert (row.label, row.n_vertices, row.n_edges) == (0, 4, 4)


def test_giant_component_tie_breaks_smallest_label(spark):
    from gunrock_spark.algorithms.components import giant_component
    from gunrock_spark.graph.generators import edges_df

    g = EdgeTable.from_df(edges_df(spark, [(5, 6), (1, 2)]))
    label, verts = giant_component(g)
    assert label == 1
    assert sorted(r.v for r in verts.collect()) == [1, 2]


def test_cc_one_action_per_iteration(spark):
    """The pointer-doubling mid-step is a lazy persist shared by both
    jump references, so each CC iteration costs exactly ONE Spark
    action (VERDICT r4 #3: fold the mid-step snapshot into the
    iteration's single materialization)."""
    raw = [(int(s), int(d)) for s, d in rmat_edges(9, 6, seed=13)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    g.num_edges()  # edge-table build/count jobs outside the counted group
    g.num_vertices()

    sc = spark.sparkContext
    group = "cc-jobcount"
    # AQE splits one action into one job per materialized stage, and a
    # broadcast-hash join runs an extra job per broadcast — turn both
    # off so job count == action count for the assertion
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup(group, "cc job-count pin")
    try:
        res = connected_components(g, skew=False)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    # 1 eager init localCheckpoint + exactly one action per iteration
    assert len(jobs) <= res.iterations + 1, (len(jobs), res.iterations)
    assert res.converged and res.iterations >= 3  # the bound binds

    # and the labels are still exact
    vs = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(vs)}
    ref = connected_components_ref(
        [(idx[s], idx[d]) for s, d in edge_list], n=len(vs)
    )
    back = {i: v for v, i in idx.items()}
    got = {r["v"]: r["label"] for r in res.state.collect()}
    assert got == {back[i]: back[int(ref[i])] for i in range(len(vs))}

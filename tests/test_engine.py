"""Engine-level tests: iterate driver, checkpoint/resume lifecycle,
skew helpers."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.engine.checkpoint import CheckpointManager
from gunrock_spark.engine.skew import hot_keys, repartition_by_degree, salted_sum
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_TOY7, edges_df, rmat_edges


def _graph(spark, edge_list):
    return EdgeTable.from_df(edges_df(spark, edge_list))


def _ranks(state):
    return {r["v"]: r["rank"] for r in state.collect()}


def test_resume_mid_run_bit_identical(spark, tmp_path):
    """Kill at iteration k (simulated by max_iter), resume from the
    snapshot, final state identical to an uninterrupted run."""
    g = _graph(spark, G_TOY7)
    full = pagerank(g, threshold=1e-9, max_iter=12)
    ck = str(tmp_path / "ck")
    # phase 1: run only 5 iterations, checkpointing every 2
    partial = pagerank(
        g, threshold=1e-9, max_iter=5, checkpoint_dir=ck, checkpoint_interval=2
    )
    assert CheckpointManager(ck).latest_iteration() is not None
    # phase 2: resume and run to 12
    resumed = pagerank(
        g,
        threshold=1e-9,
        max_iter=12,
        checkpoint_dir=ck,
        checkpoint_interval=2,
        resume=True,
    )
    a, b = _ranks(full.state), _ranks(resumed.state)
    assert a.keys() == b.keys()
    for v in a:
        # resume reloads state from parquet -> different partitioning
        # -> float sums accumulate in a different order; equality is
        # to ULP-level (1e-12 rel), far inside the 1e-6 requirement.
        # (Bit-identity DOES hold when resuming a converged run —
        # test below — because no further arithmetic happens.)
        assert b[v] == pytest.approx(a[v], rel=1e-12, abs=1e-15)
    assert resumed.iterations == full.iterations
    # metrics lineage covers all 12 iterations with no gaps
    its = [m["iteration"] for m in resumed.metrics]
    assert its == list(range(12))


def test_resume_config_mismatch_refused(spark, tmp_path):
    g = _graph(spark, G_TOY7)
    ck = str(tmp_path / "ck2")
    pagerank(g, threshold=0.01, max_iter=3, checkpoint_dir=ck, checkpoint_interval=1)
    with pytest.raises(ValueError, match="config mismatch"):
        pagerank(
            g, threshold=0.05, max_iter=3, checkpoint_dir=ck, checkpoint_interval=1,
            resume=True,
        )


def test_resume_from_converged_snapshot_no_extra_step(spark, tmp_path):
    g = _graph(spark, G_TOY7)
    ck = str(tmp_path / "ck3")
    first = pagerank(g, checkpoint_dir=ck, checkpoint_interval=1)
    assert first.converged
    again = pagerank(g, checkpoint_dir=ck, checkpoint_interval=1, resume=True)
    assert again.converged
    assert again.iterations == first.iterations
    a, b = _ranks(first.state), _ranks(again.state)
    for v in a:
        assert a[v] == b[v]


def test_salted_sum_equals_plain_sum(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=21)]
    df = spark.createDataFrame(
        [(d, 1.0 / (1 + s % 7)) for s, d in raw], schema="k long, x double"
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("x").alias("s")).collect()}
    salted = {r["k"]: r["sum_x"] for r in salted_sum(df, "k", "x", salt_factor=8).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_hot_keys_and_degree_repartition(spark):
    # R-MAT is power-law: quadrant-a bias makes low ids hot
    raw = [(int(s), int(d)) for s, d in rmat_edges(8, 16, seed=4)]
    g = EdgeTable.from_df(edges_df(spark, raw))
    mean_in = g.degrees.agg(F.avg("in_degree")).collect()[0][0]
    hk = {
        r["v"]
        for r in hot_keys(g.degrees, "in_degree", threshold=int(3 * mean_in)).collect()
    }
    assert hk  # a skewed graph has hot keys
    top = g.degrees.orderBy(F.desc("in_degree")).first()
    assert top["v"] in hk
    rep = repartition_by_degree(g.edges, g.degrees, num_partitions=8)
    assert rep.count() == g.num_edges()  # pure repartition, no row change
    assert set(rep.columns) == {"src", "dst"}


def test_checkpoint_manager_hadoop_fs_path(spark, tmp_path):
    """Scheme'd checkpoint roots (hdfs://, s3a://) route manifest and
    pointer I/O through the Hadoop FileSystem API — exercised here via
    Hadoop's LocalFileSystem on a file:// root with the remote path
    forced, so the py4j plumbing is what's under test."""
    root = "file://" + str(tmp_path / "ck_remote")
    mgr = CheckpointManager(root, config={"algorithm": "t"})
    mgr._remote = True  # file:// normally takes the os-path fast lane

    state = spark.createDataFrame([(1, 0.5), (2, 0.25)], "v long, rank double")
    reread = mgr.save(state, 3, [{"iteration": 2}, {"iteration": 3}])
    assert reread.count() == 2
    assert mgr.latest_iteration(spark) == 3

    loaded = CheckpointManager(root, config={"algorithm": "t"})
    loaded._remote = True
    df, it, metrics = loaded.load_latest(spark)
    assert it == 3 and len(metrics) == 2
    assert {r["v"]: r["rank"] for r in df.collect()} == {1: 0.5, 2: 0.25}

    # pointer flip overwrites atomically-by-ordering
    mgr.save(state, 5, [{"iteration": 5}])
    assert loaded.latest_iteration(spark) == 5

    # config mismatch refuses the snapshot
    import pytest as _pytest

    wrong = CheckpointManager(root, config={"algorithm": "other"})
    wrong._remote = True
    with _pytest.raises(ValueError):
        wrong.load_latest(spark)


def test_checkpoint_pointer_loss_heals_via_manifest_scan(spark, tmp_path):
    """The crash-safety contract: any manifest references a complete
    snapshot, so a missing or torn _LATEST pointer falls back to the
    newest manifest instead of silently restarting from iteration 0."""
    root = str(tmp_path / "ck_heal")
    mgr = CheckpointManager(root, config={"algorithm": "t"})
    state = spark.createDataFrame([(1, 0.5)], "v long, rank double")
    mgr.save(state, 2, [{"iteration": 2}])
    mgr.save(state, 4, [{"iteration": 2}, {"iteration": 4}])

    import os as _os

    # pointer deleted (retention cleanup / partial copy)
    _os.remove(_os.path.join(root, "_LATEST"))
    assert mgr.latest_iteration() == 4
    _, it, metrics = mgr.load_latest(spark)
    assert it == 4 and len(metrics) == 2

    # torn pointer write (garbage content)
    with open(_os.path.join(root, "_LATEST"), "w") as f:
        f.write("garb")
    assert mgr.latest_iteration() == 4

    # pointer names an iteration whose manifest is gone -> newest real one
    with open(_os.path.join(root, "_LATEST"), "w") as f:
        f.write("9")
    _, it, _ = mgr.load_latest(spark)
    assert it == 4


def test_cc_resume_refuses_changed_graph(spark, tmp_path):
    """Continuous-crawl trap: --resume with a checkpoint written for a
    DIFFERENT (smaller) graph must be refused via the config hash, not
    silently returned as converged."""
    import pytest as _pytest

    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import G_CC11, edges_df

    ck = str(tmp_path / "cc_ck")
    g1 = EdgeTable.from_df(edges_df(spark, G_CC11))
    connected_components(g1, checkpoint_dir=ck, checkpoint_interval=1)

    g2 = EdgeTable.from_df(edges_df(spark, G_CC11 + [(0, 7)]))
    with _pytest.raises(ValueError, match="config mismatch"):
        connected_components(g2, checkpoint_dir=ck, resume=True)


def test_manifest_scan_sees_seven_digit_iterations(spark, tmp_path):
    """The healing scan's regex must match manifests past iteration
    999,999 — the :06d zero-padding is unbounded."""
    root = str(tmp_path / "ckpt7")
    cm = CheckpointManager(root, config={"a": 1})
    import json as _json
    import os as _os

    for it in (5, 1_000_000):
        with open(_os.path.join(root, f"manifest_iter_{it:06d}.json"), "w") as f:
            f.write(_json.dumps({"iteration": it}))
    assert cm._manifest_iterations(spark) == [5, 1_000_000]


def test_resume_with_zero_steps_does_not_overwrite_snapshot(spark, tmp_path):
    """Resuming when the loaded iteration already equals max_iter runs
    ZERO steps; the tail save must be skipped — state IS the loaded
    snapshot, and overwriting that parquet while reading from it
    corrupts the read (found by the verify flow)."""
    g = _graph(spark, G_TOY7)
    ck = str(tmp_path / "ck_zero")
    r1 = pagerank(g, threshold=0.0, max_iter=5, checkpoint_dir=ck, checkpoint_interval=2)
    r2 = pagerank(
        g, threshold=0.0, max_iter=5, checkpoint_dir=ck, checkpoint_interval=2, resume=True
    )
    assert _ranks(r2.state) == _ranks(r1.state)


def _hub_graph(spark, n=300, seed=13):
    """Random sparse graph + vertex 0 as a deliberate hub with an
    out-edge to every other vertex (max/mean degree ratio >> 64)."""
    import random

    rng = random.Random(seed)
    es = {(rng.randrange(1, n), rng.randrange(1, n)) for _ in range(n)}
    es |= {(0, d) for d in range(1, n)}
    rows = sorted((s, d) for s, d in es if s != d)
    return EdgeTable.from_df(spark.createDataFrame(rows, "src long, dst long"))


def test_detect_hot_vertices_gates_on_ratio(spark):
    from gunrock_spark.engine.skew import detect_hot_vertices

    g = _hub_graph(spark)
    hot = detect_hot_vertices(g.degrees, "out_degree", ratio=16.0)
    assert 0 in hot
    # a uniform toy graph has no hubs
    uni = EdgeTable.from_df(edges_df(spark, G_TOY7))
    assert detect_hot_vertices(uni.degrees, "out_degree") == []


def test_pagerank_skew_split_matches_plain_join(spark):
    g = _hub_graph(spark)
    plain = pagerank(g, max_iter=6, threshold=0.0, skew=False)
    forced = pagerank(g, max_iter=6, threshold=0.0, skew=[0])
    auto = pagerank(g, max_iter=6, threshold=0.0, skew="auto")
    base = {r["v"]: r["rank"] for r in plain.state.collect()}
    for variant in (forced, auto):
        got = {r["v"]: r["rank"] for r in variant.state.collect()}
        assert got.keys() == base.keys()
        # only the physical join strategy changes; FP sum order may
        # differ at the ULP level
        assert all(abs(got[v] - base[v]) < 1e-12 for v in base)


def test_cc_skew_split_matches_plain_join(spark):
    from gunrock_spark.algorithms.components import connected_components

    g = _hub_graph(spark)
    plain = {
        r["v"]: r["label"]
        for r in connected_components(g, skew=False).state.collect()
    }
    for sk in ([0], "auto"):
        got = {
            r["v"]: r["label"]
            for r in connected_components(g, skew=sk).state.collect()
        }
        assert got == plain  # integer min: exact

"""Incremental (Structured Streaming) link ingestion tests."""

import os

from gunrock_spark.graph.generators import pages_table
from gunrock_spark.streaming.incremental import (
    current_edges,
    incremental_link_ingestion,
    merge_dictionary,
)


def _write_pages_batch(spark, pages_df, pages_dir, name):
    pages_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(pages_dir, name)
    )


def test_merge_dictionary_stable_ids(spark):
    urls1 = spark.createDataFrame([("a",), ("c",), ("b",)], schema="url string")
    d1 = merge_dictionary(None, urls1)
    m1 = {r["url"]: r["v"] for r in d1.collect()}
    assert m1 == {"a": 0, "b": 1, "c": 2}
    urls2 = spark.createDataFrame([("b",), ("d",), ("aa",)], schema="url string")
    d2 = merge_dictionary(d1, urls2)
    m2 = {r["url"]: r["v"] for r in d2.collect()}
    # existing ids unchanged; new urls appended after old max, sorted
    assert m2["a"] == 0 and m2["b"] == 1 and m2["c"] == 2
    assert m2["aa"] == 3 and m2["d"] == 4


def test_incremental_ingestion_two_batches(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    os.makedirs(pages_dir)

    # batch 1: first 32 pages of the seeded corpus
    pages, _ = pages_table(spark, n_pages=64, seed=5)
    split = "https://site00000.example/page/000032"
    batch1 = pages.where(f"url < '{split}'")
    batch2 = pages.where(f"url >= '{split}'")
    n1, n2 = batch1.count(), batch2.count()
    assert n1 > 0 and n2 > 0 and n1 + n2 == 64

    batch1.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_link_ingestion(spark, pages_dir, out_dir)
    dict1 = {
        r["url"]: r["v"]
        for r in spark.read.parquet(os.path.join(out_dir, "dictionary")).collect()
    }
    edges1 = current_edges(spark, out_dir).count()
    assert edges1 > 0

    # batch 2 arrives; stream drains only the new files (source offsets)
    batch2.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_link_ingestion(spark, pages_dir, out_dir)
    dict2 = {
        r["url"]: r["v"]
        for r in spark.read.parquet(os.path.join(out_dir, "dictionary")).collect()
    }
    # ids from batch 1 are stable after batch 2's merge
    for url, v in dict1.items():
        assert dict2[url] == v
    assert len(dict2) >= len(dict1)

    # the accumulated edge set equals the one-shot batch ingestion
    from gunrock_spark.ingest.links import pages_to_edges

    all_edges, _ = pages_to_edges(pages)
    want = {(r["src"], r["dst"]) for r in all_edges.collect()}
    # streaming ids may differ from batch ids (different dictionary
    # order), so compare via url names
    inv = {v: u for u, v in dict2.items()}
    got_urls = {
        (inv[r["src"]], inv[r["dst"]])
        for r in current_edges(spark, out_dir).collect()
    }
    _, bd = pages_to_edges(pages)
    binv = {r["v"]: r["url"] for r in bd.collect()}
    want_urls = {(binv[s], binv[d]) for s, d in want}
    # streaming drops self-loops at write; batch path leaves cleaning
    # to EdgeTable — normalize both
    want_urls = {(a, b) for a, b in want_urls if a != b}
    assert got_urls == want_urls


def test_windowed_rollup_watermark_semantics(spark, tmp_path):
    """Closed windows emit once with final counts; events later than
    the watermark are dropped (not double-counted) across restarts."""
    import datetime as dt

    from gunrock_spark.streaming.windows import run_rollup_stream, windowed_rollup

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(events_dir)

    def ev(i, hour, minute, typ, val):
        return (i, dt.datetime(2026, 1, 1, hour, minute), typ, float(val))

    schema = "event_id long, ts timestamp, event_type string, value double"
    # batch 1: hours 0 and 1
    b1 = [ev(1, 0, 10, "a", 1.0), ev(2, 0, 40, "a", 2.0), ev(3, 1, 5, "b", 3.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(events_dir)
    run_rollup_stream(spark, events_dir, out_dir, ckpt, "1 hour", "2 hours")

    # batch 2: hour 6 — after this batch the watermark is 04:01
    # (watermarks advance at batch END; the next batch sees it)
    b2 = [ev(4, 6, 1, "a", 10.0)]
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(events_dir)
    run_rollup_stream(spark, events_dir, out_dir, ckpt, "1 hour", "2 hours")

    # batch 3 runs under watermark 04:01: the hour-0 event is older
    # than the watermark (must drop); the hour-5 event is within it
    # (accepted); hours 0/1 close and emit their FINAL counts now
    b3 = [
        ev(5, 0, 50, "a", 100.0),  # too late — dropped
        ev(6, 5, 59, "b", 20.0),   # late but within watermark
        ev(7, 12, 0, "c", 0.5),    # advances watermark to 10:00
    ]
    spark.createDataFrame(b3, schema).coalesce(1).write.mode("append").parquet(events_dir)
    run_rollup_stream(spark, events_dir, out_dir, ckpt, "1 hour", "2 hours")

    # batch 4 under watermark 10:00: hours 5 and 6 close and emit
    b4 = [ev(8, 13, 0, "c", 0.5)]
    spark.createDataFrame(b4, schema).coalesce(1).write.mode("append").parquet(events_dir)
    run_rollup_stream(spark, events_dir, out_dir, ckpt, "1 hour", "2 hours")

    got = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # hour 0 "a": the too-late event 6 is NOT counted
    assert got[(0, "a")] == (2, 3.0)
    assert got[(1, "b")] == (1, 3.0)
    assert got[(5, "b")] == (1, 20.0)
    assert got[(6, "a")] == (1, 10.0)
    # hour 12 not closed yet (watermark hasn't passed its end) — absent
    assert (12, "c") not in got

    # batch equivalence of the rollup shape (static input, same fn)
    static = windowed_rollup(spark.createDataFrame(b1, schema))
    rows = {(r["window_start"].hour, r["event_type"]): r["n_events"] for r in static.collect()}
    assert rows == {(0, "a"): 2, (1, "b"): 1}


def test_continuous_crawl_ingest_then_warm_start_rerank(spark, tmp_path):
    """The full continuous-crawl loop: incremental ingest batch 1 →
    PR + CC; batch 2 arrives (additive update) → warm-started PR/CC
    on the grown graph match cold runs, in no more iterations."""
    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.algorithms.pagerank import pagerank
    from gunrock_spark.graph.edge_table import EdgeTable

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    os.makedirs(pages_dir)
    pages, _ = pages_table(spark, n_pages=64, seed=5)
    split = "https://site00000.example/page/000032"

    pages.where(f"url < '{split}'").coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_link_ingestion(spark, pages_dir, out_dir)
    g1 = EdgeTable.from_df(current_edges(spark, out_dir))
    pr1 = pagerank(g1, threshold=1e-7, max_iter=200)
    cc1 = connected_components(g1)

    pages.where(f"url >= '{split}'").coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_link_ingestion(spark, pages_dir, out_dir)
    g2 = EdgeTable.from_df(current_edges(spark, out_dir))
    assert g2.num_edges() > g1.num_edges()  # additive growth

    cold_pr = pagerank(g2, threshold=1e-7, max_iter=200)
    warm_pr = pagerank(
        g2, threshold=1e-7, max_iter=200,
        init_ranks=pr1.state.select("v", "rank"),
    )
    c = {r["v"]: r["rank"] for r in cold_pr.state.collect()}
    w = {r["v"]: r["rank"] for r in warm_pr.state.collect()}
    assert all(abs(w[v] - c[v]) < 1e-6 for v in c)
    # No iteration-count claim here: doubling the corpus moves the
    # fixed point far enough that the stale vector is no better than
    # uniform (measured 71 vs 67). The warm-start win is for small
    # perturbations (see test_warm_start_same_fixed_point_fewer_
    # iterations); the invariant that ALWAYS holds is same values.
    assert warm_pr.converged

    cold_cc = connected_components(g2)
    warm_cc = connected_components(
        g2, init_labels=cc1.state.select("v", "label")
    )
    cl = {(r["v"], r["label"]) for r in cold_cc.state.select("v", "label").collect()}
    wl = {(r["v"], r["label"]) for r in warm_cc.state.select("v", "label").collect()}
    assert wl == cl
    assert warm_cc.iterations <= cold_cc.iterations


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): gap-based
    session windows. Streaming emission (event-time timeouts + the
    in-batch gap split) must equal the batch lag/cumsum formulation
    for every key whose sessions have closed."""
    import datetime as dt

    from gunrock_spark.streaming.sessions import sessionize_batch, sessionize_stream

    events_dir = str(tmp_path / "sess_events")
    os.makedirs(events_dir)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def rows(*evts):
        return spark.createDataFrame(
            [(ts, k, float(v)) for ts, k, v in evts],
            schema="ts timestamp, event_type string, value double",
        )

    batches = [
        rows((t0, "a", 1.0), (t0 + dt.timedelta(seconds=30), "a", 2.0), (t0, "b", 5.0)),
        rows((t0 + dt.timedelta(hours=2), "a", 3.0)),
        # flush batches: an unused key far in the future closes all
        # real sessions via the advancing watermark
        rows((t0 + dt.timedelta(hours=8), "zz", 0.0)),
        rows((t0 + dt.timedelta(hours=16), "zz", 0.0)),
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(events_dir)
        if i == 0:
            stream = (
                spark.readStream.schema("ts timestamp, event_type string, value double")
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir)
            )
            q = (
                sessionize_stream(stream, gap_ms=60_000, watermark_delay="0 seconds")
                .writeStream.format("memory")
                .queryName("sessions_out")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "sess_ck"))
                .start()
            )
        q.processAllAvailable()
    q.stop()

    got = {
        (r["key"], r["session_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
        if r["key"] != "zz"  # the flush key's own early session closes too
    }
    all_events = batches[0].unionByName(batches[1])
    want = {
        (r["key"], r["session_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in sessionize_batch(all_events, gap_ms=60_000).collect()
    }
    assert got == want
    assert len(want) == 3  # a: two sessions; b: one


def test_sessionize_stream_splits_multi_session_batch(spark, tmp_path):
    """ADVICE r2 (high): ONE micro-batch containing several sessions of
    the same key (backfill/replay shape — no maxFilesPerTrigger cap)
    must be gap-split inside the batch, not collapsed into one blob."""
    import datetime as dt

    from gunrock_spark.streaming.sessions import sessionize_batch, sessionize_stream

    events_dir = str(tmp_path / "ms_events")
    os.makedirs(events_dir)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def rows(*evts):
        return spark.createDataFrame(
            [(ts, k, float(v)) for ts, k, v in evts],
            schema="ts timestamp, event_type string, value double",
        )

    # one file = one micro-batch: key "a" spans THREE sessions (gaps of
    # 2h between them), key "b" two; deliberately written out of order
    big = rows(
        (t0 + dt.timedelta(hours=4), "a", 7.0),
        (t0, "a", 1.0),
        (t0 + dt.timedelta(hours=2), "a", 3.0),
        (t0 + dt.timedelta(seconds=30), "a", 2.0),
        (t0 + dt.timedelta(hours=2, seconds=20), "a", 4.0),
        (t0, "b", 5.0),
        (t0 + dt.timedelta(hours=3), "b", 6.0),
    )
    flush1 = rows((t0 + dt.timedelta(hours=12), "zz", 0.0))
    flush2 = rows((t0 + dt.timedelta(hours=24), "zz", 0.0))

    big.coalesce(1).write.mode("append").parquet(events_dir)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        sessionize_stream(stream, gap_ms=60_000, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("ms_sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ms_ck"))
        .start()
    )
    q.processAllAvailable()
    for f in (flush1, flush2):
        f.coalesce(1).write.mode("append").parquet(events_dir)
        q.processAllAvailable()
    q.stop()

    got = {
        (r["key"], r["session_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM ms_sessions_out").collect()
        if r["key"] != "zz"
    }
    want = {
        (r["key"], r["session_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in sessionize_batch(big, gap_ms=60_000).collect()
    }
    assert got == want
    assert len(want) == 5  # a: 3 sessions, b: 2


def test_sessionize_stream_ids_continue_after_timeout(spark, tmp_path):
    """ADVICE r2 (medium): a session closed by an event-time TIMEOUT
    must not reset the key's counter — the next sessions number 2, 3
    (batch-parity monotone ids), via the zero-event tombstone state."""
    import datetime as dt

    from gunrock_spark.streaming.sessions import sessionize_stream

    events_dir = str(tmp_path / "tmo_events")
    os.makedirs(events_dir)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def rows(*evts):
        return spark.createDataFrame(
            [(ts, k, float(v)) for ts, k, v in evts],
            schema="ts timestamp, event_type string, value double",
        )

    batches = [
        rows((t0, "a", 1.0)),
        # watermark jumps past t0+gap -> session 1 closes via TIMEOUT
        rows((t0 + dt.timedelta(hours=2), "zz", 0.0)),
        # session 2 of "a", then another timeout flush
        rows((t0 + dt.timedelta(hours=4), "a", 2.0)),
        rows((t0 + dt.timedelta(hours=8), "zz", 0.0)),
        # session 3 of "a", closed by the final flushes
        rows((t0 + dt.timedelta(hours=12), "a", 3.0)),
        rows((t0 + dt.timedelta(hours=16), "zz", 0.0)),
        rows((t0 + dt.timedelta(hours=24), "zz", 0.0)),
    ]
    q = None
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(events_dir)
        if i == 0:
            stream = (
                spark.readStream.schema("ts timestamp, event_type string, value double")
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir)
            )
            q = (
                sessionize_stream(stream, gap_ms=60_000, watermark_delay="0 seconds")
                .writeStream.format("memory")
                .queryName("tmo_sessions_out")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "tmo_ck"))
                .start()
            )
        q.processAllAvailable()
    q.stop()

    got = sorted(
        (r["session_id"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tmo_sessions_out").collect()
        if r["key"] == "a"
    )
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_incremental_cms_stream_matches_batch(spark, tmp_path):
    """Streamed micro-batch sketch merges == one batch sketch over the
    whole corpus; replayed batch ids never double-count."""
    from gunrock_spark.pipeline.sketches import cms_build
    from gunrock_spark.streaming.sketch_stream import (
        apply_batch,
        incremental_cms,
        load_sketch,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "cms_out")
    a, _ = pages_table(spark, n_pages=64, seed=21)
    b, _ = pages_table(spark, n_pages=32, seed=22)
    b = b.selectExpr(
        "concat('x', url) AS url", "warc_ts", "html", "text", "lang"
    )
    a.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_cms(
        spark, pages_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ck"), width=256,
    )
    # second crawl increment drains as a separate micro-batch
    b.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_cms(
        spark, pages_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ck"), width=256,
    )
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in load_sketch(spark, out_dir).collect()
    }
    whole = a.select("text").unionByName(b.select("text"))
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(whole, width=256).collect()
    }
    assert got == want

    # replay: a batch id at-or-below the committed one is refused and
    # the sketch is unchanged
    assert apply_batch(spark, a, 0, out_dir, width=256) is False
    after = {
        (r["row"], r["col"]): r["cnt"]
        for r in load_sketch(spark, out_dir).collect()
    }
    assert after == want


def test_incremental_hll_stream_matches_batch(spark, tmp_path):
    """Streamed register max-merges == one batch register build over
    the whole corpus; the estimate table matches too; replayed batch
    ids are refused (and would be harmless anyway — max is
    idempotent)."""
    from gunrock_spark.pipeline.sketches import hll_estimate, hll_registers
    from gunrock_spark.streaming.sketch_stream import (
        apply_hll_batch,
        incremental_hll,
        load_sketch,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "hll_out")
    a, _ = pages_table(spark, n_pages=64, seed=31)
    b, _ = pages_table(spark, n_pages=32, seed=32)
    b = b.selectExpr(
        "concat('y', url) AS url", "warc_ts", "html", "text", "lang"
    )
    a.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, checkpoint_dir=str(tmp_path / "ck2"), m=64,
    )
    b.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, checkpoint_dir=str(tmp_path / "ck2"), m=64,
    )
    got = {(r["j"], r["rho"]) for r in load_sketch(spark, out_dir).collect()}
    whole = a.select("url").unionByName(b.select("url"))
    want_regs = hll_registers(whole, col="url", m=64)
    want = {(r["j"], r["rho"]) for r in want_regs.collect()}
    assert got == want
    got_est = hll_estimate(load_sketch(spark, out_dir), m=64).collect()[0]
    want_est = hll_estimate(want_regs, m=64).collect()[0]
    assert tuple(got_est) == tuple(want_est)

    # replay refused, registers unchanged
    assert apply_hll_batch(spark, a, 0, out_dir, m=64) is False
    after = {(r["j"], r["rho"]) for r in load_sketch(spark, out_dir).collect()}
    assert after == want


def test_transitions_stream_matches_batch(spark, tmp_path):
    """Stateful per-user last-event tracking: the streamed pair log,
    aggregated, must equal the batch Markov matrix when per-user
    delivery is in order across micro-batches."""
    import datetime as dt

    from gunrock_spark.pipeline.events import event_transitions
    from gunrock_spark.streaming.transitions import transitions_stream

    events_dir = str(tmp_path / "tr_events")
    os.makedirs(events_dir)
    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)

    # explicit event ids to keep them globally unique across batches
    def rows_ids(*evts):
        return spark.createDataFrame(
            [(eid, t0 + dt.timedelta(minutes=m), u, et, 1.0)
             for eid, m, u, et in evts],
            schema="event_id long, ts timestamp, user_id long, event_type string, value double",
        )

    batches = [
        rows_ids((0, 0, 1, "view"), (1, 5, 1, "click"), (2, 0, 2, "view")),
        rows_ids((3, 9, 1, "purchase"), (4, 2, 2, "view"), (5, 7, 2, "click")),
        rows_ids((6, 12, 1, "view"), (7, 12, 2, "error")),
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(events_dir)
        if i == 0:
            stream = (
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, "
                    "event_type string, value double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir)
            )
            q = (
                transitions_stream(stream, watermark_delay="0 seconds")
                .writeStream.format("memory")
                .queryName("transitions_out")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "tr_ck"))
                .start()
            )
        q.processAllAvailable()
    q.stop()

    got_pairs = spark.sql(
        "SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM transitions_out GROUP BY 1, 2"
    ).collect()
    got = {(r["prev_type"], r["next_type"]): r["n"] for r in got_pairs}
    all_events = batches[0]
    for b in batches[1:]:
        all_events = all_events.unionByName(b)
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(all_events).collect()
    }
    assert got == want
    # user 1: view->click->purchase->view; user 2: view->view->click->error
    assert got[("purchase", "view")] == 1 and got[("view", "view")] == 1


def test_funnel_stream_matches_batch(spark, tmp_path):
    """Per-user stage-machine state: counting the streamed completion
    rows per step must equal the batch first-touch funnel, including
    the strict-> chaining under equal timestamps."""
    import datetime as dt

    from gunrock_spark.pipeline.events import funnel_counts
    from gunrock_spark.streaming.funnel import funnel_stream

    events_dir = str(tmp_path / "fn_events")
    os.makedirs(events_dir)
    t0 = dt.datetime(2026, 1, 2, 9, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")

    def rows_ids(*evts):
        return spark.createDataFrame(
            [(eid, t0 + dt.timedelta(minutes=m), u, et, 1.0)
             for eid, m, u, et in evts],
            schema=schema,
        )

    batches = [
        # user 1 completes all three; user 2 stalls after click;
        # user 3's click shares its view's timestamp -> NOT qualifying
        rows_ids((0, 0, 1, "view"), (1, 2, 1, "click"), (2, 0, 2, "view")),
        rows_ids((3, 5, 1, "purchase"), (4, 4, 2, "click"),
                 (5, 0, 3, "view"), (6, 0, 3, "click")),
        rows_ids((7, 9, 2, "error"), (8, 30, 3, "click")),
    ]
    steps = ["view", "click", "purchase"]
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(events_dir)
        if i == 0:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir)
            )
            q = (
                funnel_stream(stream, steps, watermark_delay="0 seconds")
                .writeStream.format("memory")
                .queryName("funnel_out")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "fn_ck"))
                .start()
            )
        q.processAllAvailable()
    q.stop()

    got = {
        (r["step"], r["step_type"]): r["n"]
        for r in spark.sql(
            "SELECT step, step_type, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM funnel_out GROUP BY 1, 2"
        ).collect()
    }
    all_events = batches[0]
    for b in batches[1:]:
        all_events = all_events.unionByName(b)
    want = {
        (r["step"], r["step_type"]): r["n_users"]
        for r in funnel_counts(all_events, steps).collect()
        if r["n_users"] > 0
    }
    assert got == want
    # user 3's same-ts click never qualifies; their minute-30 click does
    assert got[(2, "click")] == 3
    assert got[(3, "purchase")] == 1


def test_incremental_near_dup_stream_matches_batch(spark, tmp_path):
    """Union-over-batches of streamed near-dup pairs == the batch
    signature_near_duplicates over the whole corpus; replays refused;
    crash-orphaned batch directories invisible until committed."""
    from pyspark.sql import functions as F

    from gunrock_spark.pipeline.dedup import signature_near_duplicates
    from gunrock_spark.streaming.dedup_stream import (
        _commit_marker,
        apply_batch,
        incremental_near_dups,
        read_pairs,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "nd_out")
    a, _ = pages_table(spark, n_pages=64, seed=31)
    b, _ = pages_table(spark, n_pages=32, seed=32)
    b = b.selectExpr(
        "concat('x', url) AS url", "warc_ts", "html", "text", "lang"
    )
    a.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_near_dups(
        spark, pages_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ck"), threshold=0.25,
    )
    b.coalesce(1).write.mode("append").parquet(pages_dir)
    incremental_near_dups(
        spark, pages_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ck"), threshold=0.25,
    )

    got = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in read_pairs(spark, out_dir).collect()
    }
    whole = a.unionByName(b)
    want = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in signature_near_duplicates(
            whole, id_col="url", text_col="text", threshold=0.25
        ).collect()
    }
    assert got == want
    assert len(got) > 0  # the generator corpus must actually produce pairs

    # replay: batch id at-or-below the committed one is refused
    assert (
        apply_batch(spark, a, 0, out_dir, id_col="url", threshold=0.25)
        is False
    )
    assert {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in read_pairs(spark, out_dir).collect()
    } == want

    # crash orphan: write data dirs for a new batch but DON'T commit
    # the marker — the orphan must stay invisible to readers
    c = a.selectExpr("concat('y', url) AS url", "warc_ts", "html", "text", "lang")
    from gunrock_spark.pipeline.dedup import minhash_signatures, shingles

    sig_c = minhash_signatures(shingles(c, "url", "text", 3), 16)
    sig_c.write.mode("overwrite").parquet(out_dir + "/sigs/batch=99")
    assert {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in read_pairs(spark, out_dir).collect()
    } == want
    # committing batch 99 through the real path overwrites the orphan
    assert apply_batch(spark, c, 99, out_dir, id_col="url", threshold=0.25)
    more = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in read_pairs(spark, out_dir).collect()
    }
    assert more >= want and len(more) > len(want)


def test_incremental_near_dup_stream_recrawl_latest_wins(spark, tmp_path):
    """Re-crawled ids (same url in a later batch — or twice within one
    batch) are latest-wins: stale signatures never verify pairs, the
    store reads back one signature per id, and already-emitted pairs
    are not re-emitted (ADVICE r4: dedup_stream re-seen ids)."""
    import datetime

    from gunrock_spark.streaming.dedup_stream import apply_batch, read_pairs

    out_dir = str(tmp_path / "nd_recrawl")
    T1 = "the quick brown fox jumps over the lazy dog again and again"
    T2 = "completely different content about distributed minhash indexes"

    def pages(rows):
        return spark.createDataFrame(
            [
                (u, datetime.datetime(2026, 1, day), bytearray(b""), t, "en")
                for (u, day, t) in rows
            ],
            schema=(
                "url string, warc_ts timestamp, html binary, "
                "text string, lang string"
            ),
        )

    def pair_set():
        return {
            (r["id_a"], r["id_b"]) for r in read_pairs(spark, out_dir).collect()
        }

    # batch 0: u4 appears TWICE — the newer warc_ts (T1 content) must win
    b0 = pages(
        [("u1", 1, T1), ("u2", 1, T1), ("u4", 1, T2), ("u4", 2, T1)]
    )
    assert apply_batch(spark, b0, 0, out_dir, id_col="url", threshold=0.9)
    assert pair_set() == {("u1", "u2"), ("u1", "u4"), ("u2", "u4")}

    # batch 1: u1 RE-CRAWLED with new content T2; u3 is new with T2.
    # Latest-wins: u1 now pairs with u3; the old (u1,u2)/(u1,u4) pairs
    # are not re-emitted; u3 does not pair with anyone's stale content.
    b1 = pages([("u1", 3, T2), ("u3", 3, T2)])
    assert apply_batch(spark, b1, 1, out_dir, id_col="url", threshold=0.9)
    assert pair_set() == {
        ("u1", "u2"), ("u1", "u4"), ("u2", "u4"), ("u1", "u3"),
    }

    # batch 2: u5 arrives with T2 — it must verify against u1's NEWEST
    # signature (T2), proving the superseded row is the one the index
    # serves, and against u3, but not against u2/u4 (T1).
    b2 = pages([("u5", 4, T2)])
    assert apply_batch(spark, b2, 2, out_dir, id_col="url", threshold=0.9)
    assert pair_set() == {
        ("u1", "u2"), ("u1", "u4"), ("u2", "u4"), ("u1", "u3"),
        ("u1", "u5"), ("u3", "u5"),
    }


def test_sessionize_stream_late_event_merges_like_batch(spark, tmp_path):
    """VERDICT r4 #6: an in-watermark LATE event landing inside the
    gap of an internally-closed run must merge (here: BRIDGE two runs
    into one session) exactly as the batch path does — runs are held
    in state until the watermark passes end + gap, never emitted
    early."""
    import datetime as dt

    from gunrock_spark.streaming.sessions import sessionize_batch, sessionize_stream

    events_dir = str(tmp_path / "late_events")
    os.makedirs(events_dir)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    GAP_MS = 7_200_000  # 2h

    def rows(*evts):
        return spark.createDataFrame(
            [(ts, k, float(v)) for ts, k, v in evts],
            schema="ts timestamp, event_type string, value double",
        )

    batches = [
        # ONE batch, two runs of "a" 3h apart (> gap): the old design
        # emitted run [t0, t0] immediately as its own session
        rows((t0, "a", 1.0), (t0 + dt.timedelta(hours=3), "a", 3.0)),
        # late but in-watermark (delay 4h): lands between the runs and
        # BRIDGES them — batch semantics = ONE session of all 3 events
        rows((t0 + dt.timedelta(hours=1), "a", 2.0)),
        # flushes advance the watermark past end + gap
        rows((t0 + dt.timedelta(hours=12), "zz", 0.0)),
        rows((t0 + dt.timedelta(hours=24), "zz", 0.0)),
        rows((t0 + dt.timedelta(hours=48), "zz", 0.0)),
    ]
    q = None
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(events_dir)
        if i == 0:
            stream = (
                spark.readStream.schema(
                    "ts timestamp, event_type string, value double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir)
            )
            q = (
                sessionize_stream(
                    stream, gap_ms=GAP_MS, watermark_delay="4 hours"
                )
                .writeStream.format("memory")
                .queryName("late_sessions_out")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "late_ck"))
                .start()
            )
        q.processAllAvailable()
    q.stop()

    got = {
        (r["key"], r["session_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM late_sessions_out").collect()
        if r["key"] == "a"
    }
    all_a = batches[0].unionByName(batches[1])
    want = {
        (r["key"], r["session_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in sessionize_batch(all_a, gap_ms=GAP_MS).collect()
    }
    assert got == want
    # the whole point: ONE bridged session with all three events
    assert len(want) == 1 and next(iter(want))[4] == 3

"""Crawl-snapshot ops (ingest/recrawl.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from gunrock_spark.functions.hashing import h60_py
from gunrock_spark.ingest.recrawl import crawl_delta, crawl_stats, latest_snapshot


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("u/a", _ts(0), "alpha v1"),
        ("u/a", _ts(100), "alpha v2"),
        ("u/a", _ts(50), "alpha v1"),
        ("u/b", _ts(10), "beta"),
        # u/c: two crawls in the SAME second with different texts
        ("u/c", _ts(5), "gamma x"),
        ("u/c", _ts(5), "gamma y"),
    ]
    return spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, text string"
    )


def test_latest_snapshot_picks_newest(spark, pages):
    out = {r.url: r for r in latest_snapshot(pages).collect()}
    assert len(out) == 3
    assert out["u/a"].text == "alpha v2" and out["u/a"].warc_ts == _ts(100)
    assert out["u/b"].text == "beta"


def test_latest_snapshot_tie_breaks_by_text_hash(spark, pages):
    want = max(["gamma x", "gamma y"], key=lambda t: h60_py(t))
    got = {r.url: r.text for r in latest_snapshot(pages).collect()}["u/c"]
    assert got == want
    # stable under repartitioning
    got2 = {
        r.url: r.text for r in latest_snapshot(pages.repartition(7)).collect()
    }["u/c"]
    assert got2 == want


def test_latest_snapshot_plan_single_agg_no_window(spark, pages):
    plan = latest_snapshot(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # one groupBy shuffle, nothing else


def test_crawl_delta_statuses(spark):
    old = spark.createDataFrame(
        [("u/a", "same"), ("u/b", "will change"), ("u/c", "going away")],
        schema="url string, text string",
    )
    new = spark.createDataFrame(
        [("u/a", "same"), ("u/b", "changed!"), ("u/d", "brand new")],
        schema="url string, text string",
    )
    out = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert out == {
        "u/a": "unchanged",
        "u/b": "changed",
        "u/c": "removed",
        "u/d": "added",
    }


def test_crawl_stats(spark, pages):
    out = {r.url: r for r in crawl_stats(pages).collect()}
    a = out["u/a"]
    assert a.n_crawls == 3 and a.n_distinct_texts == 2
    assert a.first_ts == _ts(0) and a.last_ts == _ts(100)
    c = out["u/c"]
    assert c.n_crawls == 2 and c.n_distinct_texts == 2


# --- change_rate (Cho & Garcia-Molina Poisson estimator) --------------------


def test_change_rate_counts_and_lambda(spark):
    import math

    from gunrock_spark.ingest.recrawl import change_rate

    rows = [
        # u/a: 3 crawls, changes on both intervals (X=2, n=2)
        ("u/a", _ts(0), "v1"),
        ("u/a", _ts(10), "v2"),
        ("u/a", _ts(20), "v3"),
        # u/b: 3 crawls, one change (X=1, n=2)
        ("u/b", _ts(0), "same"),
        ("u/b", _ts(10), "same"),
        ("u/b", _ts(20), "diff"),
        # u/c: 2 crawls, no change (X=0, n=1)
        ("u/c", _ts(0), "s"),
        ("u/c", _ts(10), "s"),
        # u/d: single crawl -> excluded
        ("u/d", _ts(0), "only"),
    ]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, text string"
    )
    got = {r.url: r for r in change_rate(df).collect()}
    assert set(got) == {"u/a", "u/b", "u/c"}

    def lam(n, x):
        return round(-math.log((n - x + 0.5) / (n + 0.5)), 9)

    assert (got["u/a"].n_intervals, got["u/a"].n_changes) == (2, 2)
    assert got["u/a"].change_lambda == lam(2, 2)
    assert (got["u/b"].n_intervals, got["u/b"].n_changes) == (2, 1)
    assert got["u/b"].change_lambda == lam(2, 1)
    assert (got["u/c"].n_intervals, got["u/c"].n_changes) == (1, 0)
    assert got["u/c"].change_lambda == lam(1, 0)


def test_change_rate_order_insensitive(spark):
    from gunrock_spark.ingest.recrawl import change_rate

    rows = [("u", _ts(t), f"t{t}") for t in (30, 0, 20, 10)]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, text string"
    )
    r = change_rate(df).collect()[0]
    assert (r.n_intervals, r.n_changes) == (3, 3)


# --- crawl_priority ---------------------------------------------------------


def test_crawl_priority_freshness_times_importance(spark, pages):
    from gunrock_spark.ingest.recrawl import change_rate, crawl_priority

    ranks = spark.createDataFrame(
        [("u/a", 0.4), ("u/b", 0.9), ("u/c", 0.1)],
        schema="url string, rank double",
    )
    got = {
        r.url: (r.change_lambda, r.priority)
        for r in crawl_priority(pages, ranks, default_lambda=0.5).collect()
    }
    lam = {r.url: r.change_lambda for r in change_rate(pages).collect()}
    # u/a: 2 intervals 1 change; u/c: 1 interval 1 change; u/b single crawl
    assert got["u/a"][0] == lam["u/a"]
    assert got["u/c"][0] == lam["u/c"]
    assert got["u/b"][0] == 0.5  # exploration prior
    for url, rank in [("u/a", 0.4), ("u/b", 0.9), ("u/c", 0.1)]:
        assert got[url][1] == pytest.approx(round(got[url][0] * rank, 9))


def test_crawl_priority_inner_joins_ranks_and_topk(spark, pages):
    from gunrock_spark.ingest.recrawl import crawl_priority

    ranks = spark.createDataFrame(
        [("u/a", 1.0), ("u/zzz", 9.0)], schema="url string, rank double"
    )
    rows = crawl_priority(pages, ranks, k=5).collect()
    assert [r.url for r in rows] == ["u/a"]  # unranked urls excluded

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

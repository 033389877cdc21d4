"""Event analytics (transitions / retention / funnel) vs pure-Python
oracles, plus the jobs/events.py CLI round-trip."""

import datetime as dt
import json
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

from gunrock_spark.pipeline.events import (
    event_transitions,
    funnel_counts,
    retention_cohorts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


ROWS = [
    # (event_id, ts, user_id, event_type, value)
    (0, _ts(0), 1, "view", 1.0),
    (1, _ts(5), 1, "click", 1.0),
    (2, _ts(9), 1, "purchase", 3.0),
    (3, _ts(0), 2, "view", 1.0),
    (4, _ts(1), 2, "view", 1.0),
    (5, _ts(2), 2, "click", 1.0),
    (6, _ts(0), 3, "click", 1.0),        # click with no prior view
    (7, _ts(3), 3, "purchase", 2.0),
    (8, _ts(60 * 24), 1, "view", 1.0),   # day-2 activity for user 1
    (9, _ts(60 * 48), 2, "view", 1.0),   # day-3 activity for user 2
    # equal timestamps: event_id breaks the sequence tie
    (10, _ts(100), 4, "view", 1.0),
    (11, _ts(100), 4, "click", 1.0),
]

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(ROWS, schema=SCHEMA)


def transitions_py(rows):
    by_user = {}
    for eid, ts, uid, et, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    pairs = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    tot = Counter()
    for (a, _), n in pairs.items():
        tot[a] += n
    return {
        (a, b): (n, round(n / tot[a], 6)) for (a, b), n in pairs.items()
    }


def test_event_transitions_matches_python(spark, events):
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in event_transitions(events).collect()
    }
    assert got == transitions_py(ROWS)
    # user 4's equal-timestamp pair orders by event_id: view -> click
    assert ("view", "click") in got


def test_retention_cohorts_matches_python(spark, events):
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(events).collect()
    }
    first = {}
    active = set()
    for _, ts, uid, _, _ in ROWS:
        d = ts.date()
        first[uid] = min(first.get(uid, d), d)
        active.add((uid, d))
    want = Counter()
    for uid, d in active:
        want[(first[uid], (d - first[uid]).days)] += 1
    assert got == dict(want)
    # day-0 row counts every user exactly once
    assert sum(n for (c, o), n in got.items() if o == 0) == len(first)


def test_funnel_counts_strict_ordering(spark, events):
    got = {
        r["step"]: (r["step_type"], r["n_users"])
        for r in funnel_counts(events, ["view", "click", "purchase"]).collect()
    }
    # views: users 1, 2, 4; click-after-view: 1, 2 (user 4's click is
    # NOT strictly after its view — equal ts); purchase-after: 1 only
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_single_step_and_empty_guard(spark, events):
    got = funnel_counts(events, ["purchase"]).collect()
    assert [(r["step"], r["n_users"]) for r in got] == [(1, 2)]
    with pytest.raises(ValueError):
        funnel_counts(events, [])


def test_events_job_cli_round_trip(spark, tmp_path, capsys):
    import importlib

    inp = str(tmp_path / "events.parquet")
    spark.createDataFrame(ROWS, schema=SCHEMA).write.parquet(inp)
    mod = importlib.import_module("events")
    for op, expect_rows in [
        ("transitions", len(transitions_py(ROWS))),
        ("retention", None),
        ("funnel", 3),
        ("hourly", None),
        ("sessionize", None),
    ]:
        out = str(tmp_path / f"out_{op}")
        assert mod.main(["--input", inp, "--op", op, "--out", out]) == 0
        m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert m["op"] == op and m["rows_in"] == len(ROWS)
        n = spark.read.parquet(out).count()
        assert n > 0
        if expect_rows is not None:
            assert n == expect_rows, op

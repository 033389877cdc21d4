"""Gopher repetition metrics (pipeline/repetition.py)."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.pipeline.repetition import (
    GOPHER_MAX,
    gopher_repetition,
    gopher_repetition_flags,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "spam spam spam spam spam spam"),
        (1, "a perfectly normal sentence with no repetition whatsoever here"),
        (2, "nav bar\nnav bar\nactual content line"),
        (3, ""),
        (4, "one two three four five one two three four five six seven"),
    ]
    return spark.createDataFrame(base, schema="doc_id long, text string")


def test_metrics_exact_values(spark, docs):
    out = {r.doc_id: r for r in gopher_repetition(docs).collect()}
    # doc 1: 10 tokens, every gram unique. top 2-gram = lexicographically
    # smallest = "a perfectly" (11 chars) of 62; no dup grams.
    r1 = out[1]
    assert r1.top_2gram_char_frac == pytest.approx(11 / 62)
    assert r1.dup_5gram_char_frac == 0.0 and r1.dup_10gram_char_frac == 0.0
    assert r1.dup_line_frac == 0.0
    # doc 0: "spam spam" appears 5x (overlapping), 9 chars each, 29 total
    r0 = out[0]
    assert r0.top_2gram_char_frac == pytest.approx(5 * 9 / 29)
    # all 5-grams are "spam spam spam spam spam" (2 occurrences, 24 chars)
    assert r0.dup_5gram_char_frac == pytest.approx(2 * 24 / 29)
    # doc 2: 3 lines, "nav bar" repeated -> 1 dup occurrence of 3 lines
    r2 = out[2]
    assert r2.dup_line_frac == pytest.approx(1 / 3)
    assert r2.dup_line_char_frac == pytest.approx(7 / (7 + 7 + 19))
    # doc 4: "one two three four five" (23 chars) repeats as a 5-gram
    r4 = out[4]
    assert r4.dup_5gram_char_frac == pytest.approx(2 * 23 / len(r"one two three four five one two three four five six seven"))
    # empty doc scores zeros everywhere
    r3 = out[3]
    assert r3.n_chars == 0
    assert all(
        getattr(r3, c) == 0.0 for c in out[3].asDict() if c.endswith("_frac")
    )


def test_flags_thresholds(spark, docs):
    out = {r.doc_id: r.keep for r in gopher_repetition_flags(docs).collect()}
    assert out[0] is False  # spam blows every n-gram bound
    assert out[3] is True  # empty doc passes (length filters are separate)
    # tightening a threshold flips a doc
    tight = {
        r.doc_id: r.keep
        for r in gopher_repetition_flags(
            docs, thresholds={"top_2gram_char_frac": 0.0}
        ).collect()
    }
    assert tight[1] is False


def test_partition_invariance(spark, docs):
    a = sorted(map(tuple, gopher_repetition(docs).collect()))
    b = sorted(map(tuple, gopher_repetition(docs.repartition(5)).collect()))
    assert a == b


def test_plan_no_python_no_window(spark, docs):
    plan = (
        gopher_repetition(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the top-gram argmax must be a partial-aggregable min(struct),
    # never a per-document sort window
    assert "Window" not in plan
    assert "partial_min" in plan or "partial min" in plan.lower()

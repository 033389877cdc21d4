"""Corpus-hygiene ops: line-level dedup and benchmark decontamination
(pipeline/decontamination.py)."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.pipeline.decontamination import (
    contamination_flags,
    eval_ngrams,
    line_dedup,
    split_lines,
)

BOILER = "copyright 2024 example corp"


@pytest.fixture(scope="module")
def lined_docs(spark):
    # doc 0 carries the boilerplate line first; docs 1 and 2 repeat it;
    # doc 3 is ONLY boilerplate (every line removed); doc 4 repeats a
    # line within itself.
    base = [
        (0, f"{BOILER}\nalpha beta gamma\ndelta epsilon"),
        (1, f"unique first line\n{BOILER}\nzeta eta"),
        (2, f"{BOILER}\nanother unique line"),
        (3, BOILER),
        (4, "self repeated line\nself repeated line\ntail line"),
        (5, "\n\nonly one real line\n"),
    ]
    return spark.createDataFrame(base, schema="doc_id long, text string")


def test_split_lines_positions_and_empties(spark, lined_docs):
    rows = (
        split_lines(lined_docs.where("doc_id = 5"))
        .orderBy("line_no")
        .collect()
    )
    # empty segments dropped, positions preserved from the raw split
    assert [(r.line_no, r.line) for r in rows] == [(2, "only one real line")]


def test_line_dedup_first_occurrence_keeps(spark, lined_docs):
    out = {r.doc_id: r for r in line_dedup(lined_docs).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    # doc 0 is the global first occurrence of BOILER -> keeps everything
    assert out[0].text == f"{BOILER}\nalpha beta gamma\ndelta epsilon"
    assert out[0].n_lines == 3 and out[0].n_lines_kept == 3
    # later occurrences lose the boilerplate line but keep their own
    assert out[1].text == "unique first line\nzeta eta"
    assert out[2].text == "another unique line"
    # a document that is pure boilerplate survives as an empty husk
    assert out[3].text == "" and out[3].n_lines == 1 and out[3].n_lines_kept == 0
    # intra-document repeats collapse to the first position
    assert out[4].text == "self repeated line\ntail line"
    assert out[4].n_lines == 3 and out[4].n_lines_kept == 2


def test_line_dedup_deterministic_under_partitioning(spark, lined_docs):
    a = sorted(map(tuple, line_dedup(lined_docs).collect()))
    b = sorted(map(tuple, line_dedup(lined_docs.repartition(7)).collect()))
    assert a == b


def test_eval_ngrams_distinct(spark):
    ev = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c d e")], schema="doc_id long, text string"
    )
    # trigrams: {a b c, b c d} + {b c d, c d e} -> 3 distinct
    assert eval_ngrams(ev, n=3).count() == 3


def test_contamination_flags_counts_distinct_hits(spark):
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown fox somewhere else entirely today"),
            (2, "nothing shared with any benchmark at all"),
            (3, "too short"),  # < n tokens -> zero grams
        ],
        schema="doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox ran")], schema="doc_id long, text string"
    )
    out = {r.doc_id: r for r in contamination_flags(train, ev, n=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    # eval trigrams: {the quick brown, quick brown fox, brown fox ran}
    assert out[0].n_hits == 2 and out[0].contaminated  # first two
    assert out[1].n_hits == 1 and out[1].contaminated  # quick brown fox
    assert out[2].n_hits == 0 and not out[2].contaminated
    assert out[3].n_hits == 0 and not out[3].contaminated


def test_contamination_case_insensitive_and_distinct(spark):
    # repeated hit gram in one doc counts once (distinct grams per doc)
    train = spark.createDataFrame(
        [(0, "A B C x A b C")], schema="doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c")], schema="doc_id long, text string")
    row = contamination_flags(train, ev, n=3).collect()[0]
    assert row.n_hits == 1 and row.contaminated


def test_contamination_plan_broadcasts_eval_side(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e f")], schema="doc_id long, text string"
    )
    ev = spark.createDataFrame([(1, "a b c")], schema="doc_id long, text string")
    plan = contamination_flags(train, ev, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_line_dedup_plan_no_python(spark, lined_docs):
    plan = line_dedup(lined_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

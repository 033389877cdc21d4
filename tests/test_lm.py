"""Unigram LM scoring + mixture sampling (pipeline/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from gunrock_spark.pipeline.lm import lm_score, mixture_sample, unigram_lm


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, ""),
        ],
        schema="doc_id long, text string",
    )


def test_model_probabilities_sum_coherent(spark, corpus):
    m = unigram_lm(corpus, k=0.5)
    assert m.n_tokens == 12 and m.vocab_size == 7
    probs = {r.term: math.exp(r.logp) for r in m.terms.collect()}
    # 'the' appears 4 times: (4 + .5) / (12 + .5 * 8)
    assert probs["the"] == pytest.approx(4.5 / 16.0)
    # total in-vocab mass + one reserved OOV slot stays under 1
    assert sum(probs.values()) + math.exp(m.oov_logp) == pytest.approx(
        (12 + 0.5 * 7 + 0.5) / 16.0
    )


def test_scoring_matches_python(spark, corpus):
    m = unigram_lm(corpus, k=0.5)
    out = {r.doc_id: r for r in lm_score(corpus, m).collect()}
    probs = {r.term: r.logp for r in m.terms.collect()}
    want = sum(probs[t] for t in "the cat sat on the mat".split()) / 6
    assert out[0].avg_logp == pytest.approx(want)
    assert out[0].ppl == pytest.approx(math.exp(-want))
    assert out[2].n_tokens == 0 and out[2].ppl == 1.0


def test_oov_uses_smoothed_mass(spark, corpus):
    m = unigram_lm(corpus, k=0.5)
    unseen = spark.createDataFrame(
        [(9, "zyzzyva qwfp")], schema="doc_id long, text string"
    )
    row = lm_score(unseen, m).collect()[0]
    assert row.avg_logp == pytest.approx(m.oov_logp)
    # rarer than any seen term
    assert m.oov_logp < min(r.logp for r in m.terms.collect())


def test_mixture_sample_hits_fractions(spark):
    rows = [(i, "s%d" % (i % 2)) for i in range(2000)]
    df = spark.createDataFrame(rows, schema="doc_id long, source string")
    out = mixture_sample(df, {"s0": 1.0, "s1": 0.25})
    by_src = {
        r.source: r.n for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert by_src["s0"] == 1000  # fraction 1.0 keeps everything
    assert 180 <= by_src["s1"] <= 320  # ~250 expected
    # deterministic: same rows every run, unlisted sources dropped
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in mixture_sample(df.repartition(7), {"s0": 1.0, "s1": 0.25}).collect())
    assert a == b
    assert mixture_sample(df, {"s0": 0.5}).where("source = 's1'").count() == 0


def test_mixture_sample_plan_is_pure_filter(spark):
    df = spark.createDataFrame(
        [(1, "a")], schema="doc_id long, source string"
    )
    plan = (
        mixture_sample(df, {"a": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: a scan-bound filter

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


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def _h60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dsir_ref(docs, target_texts, buckets, n, k):
    """Pure-python DSIR weights: hashed n-gram bag-of-words log-ratio."""
    import re

    def feats(text):
        t = re.findall("[a-z0-9]+", text.lower())
        return [
            _h60_py(" ".join(t[i : i + n])) % buckets
            for i in range(len(t) - n + 1)
        ]

    src = [b for _, text in docs for b in feats(text)]
    tgt = [b for text in target_texts for b in feats(text)]
    from collections import Counter

    cs, ct = Counter(src), Counter(tgt)
    ds, dt = len(src) + k * buckets, len(tgt) + k * buckets
    out = {}
    for doc_id, text in docs:
        fs = feats(text)
        out[doc_id] = (
            len(fs),
            sum(
                math.log((ct[b] + k) / dt) - math.log((cs[b] + k) / ds)
                for b in fs
            ),
        )
    return out


@pytest.fixture(scope="module")
def dsir_docs(spark):
    rows = [
        (0, "alpha beta gamma delta alpha beta", "web"),
        (1, "alpha beta gamma delta epsilon zeta", "web"),
        (2, "lorem ipsum dolor sit amet consectetur", "web"),
        (3, "lorem ipsum dolor sit amet adipiscing", "web"),
        (4, "alpha beta alpha beta alpha beta", "wiki"),
        (5, "gamma delta gamma delta gamma delta", "wiki"),
        (6, "x", "web"),  # single token: no bigrams
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string, source string")


def test_dsir_weights_match_python(spark, dsir_docs):
    from gunrock_spark.pipeline.lm import dsir_weights

    target = dsir_docs.where(F.col("source") == "wiki")
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_weights(dsir_docs, target, buckets=64, k=0.5).collect()
    }
    docs = [(r["doc_id"], r["text"]) for r in dsir_docs.collect()]
    tgt = [r["text"] for r in target.collect()]
    want = _dsir_ref(docs, tgt, buckets=64, n=2, k=0.5)
    assert set(got) == set(want)
    for d, (nf, lw) in want.items():
        assert got[d][0] == nf
        assert got[d][1] == pytest.approx(lw, abs=1e-9)
    # target-like docs (alpha-beta / gamma-delta heavy) outrank the
    # lorem-ipsum docs that share nothing with the target domain
    assert min(got[0][1], got[1][1]) > max(got[2][1], got[3][1])
    # no-feature doc scores exactly 0
    assert got[6] == (0, 0.0)


def test_dsir_sample_is_deterministic_topk(spark, dsir_docs):
    from gunrock_spark.pipeline.lm import dsir_sample, dsir_weights

    target = dsir_docs.where(F.col("source") == "wiki")
    out1 = dsir_sample(dsir_docs, target, n_keep=3, buckets=64, seed=9).collect()
    out2 = dsir_sample(dsir_docs, target, n_keep=3, buckets=64, seed=9).collect()
    assert [r["doc_id"] for r in out1] == [r["doc_id"] for r in out2]
    assert len(out1) == 3
    # scores sorted descending; score = logw + gumbel(h60(id))
    scores = [r["score"] for r in out1]
    assert scores == sorted(scores, reverse=True)
    w = {r["doc_id"]: r["logw"] for r in dsir_weights(dsir_docs, target, buckets=64).collect()}
    for r in out1:
        u = (_h60_py(f"{r['doc_id']}:dsir:9") + 0.5) / float(1 << 60)
        want = w[r["doc_id"]] + (-math.log(-math.log(u)))
        assert r["score"] == pytest.approx(want, abs=1e-9)


# --- cooccurrence_pmi (pipeline/text.py) ------------------------------------


def test_cooccurrence_pmi_hand_computed(spark):
    import math

    from gunrock_spark.pipeline.text import cooccurrence_pmi

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a b")], "doc_id long, text string"
    )
    got = {
        (r.a, r.b): (r.n_pairs, r.pmi)
        for r in cooccurrence_pmi(docs, window=2, min_pair_count=1).collect()
    }
    # slots: d1 (a,b),(a,a),(a,b),(b,c),(a,c); d2 (a,b),(b,b),(a,b)
    assert got[("a", "b")][0] == 4
    assert got[("a", "a")][0] == 1
    assert got[("b", "b")][0] == 1
    assert got[("b", "c")][0] == 1
    assert got[("a", "c")][0] == 1
    n = 8
    m = {"a": 7, "b": 7, "c": 2}

    def pmi(a, b, c_ab):
        return round(math.log(((4.0 * n) * c_ab) / (m[a] * m[b])), 9)

    for (a, b), (c_ab, p) in got.items():
        assert p == pmi(a, b, c_ab), (a, b)


def test_cooccurrence_pmi_min_count_filters(spark):
    from gunrock_spark.pipeline.text import cooccurrence_pmi

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a b")], "doc_id long, text string"
    )
    got = cooccurrence_pmi(docs, window=2, min_pair_count=2).collect()
    assert [(r.a, r.b) for r in got] == [("a", "b")]

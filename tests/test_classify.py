"""Naive-Bayes quality classifier vs a pure-Python oracle."""

import math
import re

import pytest
from pyspark.sql import functions as F

from gunrock_spark.pipeline.classify import nb_score, nb_train

DOCS = [
    (0, "spark shuffle partitions broadcast join optimizer", "wiki"),
    (1, "catalyst plans prune columns and push filters", "wiki"),
    (2, "broadcast join and shuffle service in the optimizer", "wiki"),
    (3, "click here free prize winner claim now", "crawl"),
    (4, "free free free winner winner click click", "crawl"),
    (5, "the optimizer can prune a free prize", "crawl"),
    (6, "", "crawl"),
]
K = 0.5


def _py_model(docs, k=K):
    from collections import Counter

    cp, cn, vocab = Counter(), Counter(), set()
    d_pos = d_neg = 0
    for _, text, src in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        vocab.update(toks)
        if src == "wiki":
            d_pos += 1
            cp.update(toks)
        else:
            d_neg += 1
            cn.update(toks)
    V = len(vocab)
    dp = sum(cp.values()) + k * (V + 1)
    dn = sum(cn.values()) + k * (V + 1)

    def lw(t):
        return math.log((cp[t] + k) / dp) - math.log((cn[t] + k) / dn)

    return lw, math.log(d_pos / d_neg)


def test_nb_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    model = nb_train(df, F.col("source") == "wiki", k=K)
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred"])
        for r in nb_score(df, model).collect()
    }
    lw, prior = _py_model(DOCS)
    for i, text, src in DOCS:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        exp = prior + sum(lw(t) for t in toks)
        n, lo, pred = got[i]
        assert n == len(toks)
        assert lo == pytest.approx(exp, rel=1e-12)
        assert pred == (exp > 0)
    # the classifier separates the training classes
    assert got[0][2] and got[1][2] and got[2][2]
    assert not got[3][2] and not got[4][2]


def test_nb_oov_and_prior(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    model = nb_train(df, F.col("source") == "wiki", k=K)
    sdf = spark.createDataFrame(
        [(10, "zzz yyy xxx totally unseen words"), (11, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in nb_score(sdf, model).collect()}
    # unseen terms score oov_lw each; empty doc scores the prior alone
    assert got[10]["log_odds"] == pytest.approx(
        model.prior_lo + 5 * model.oov_lw, rel=1e-12
    )
    assert got[11]["log_odds"] == pytest.approx(model.prior_lo, rel=1e-12)


def test_nb_requires_both_classes(spark):
    df = spark.createDataFrame(DOCS[:3], ["doc_id", "text", "source"])
    with pytest.raises(ValueError):
        nb_train(df, F.col("source") == "wiki", k=K)

"""Naive-Bayes quality classifier — the "fastText classifier" stage of
GPT-3/CCNet-style curation (Brown et al. 2020 §A: a linear classifier
trained on a trusted reference corpus vs raw crawl, every document
scored, kept by score). A multinomial NB with add-k smoothing is the
deterministic, closed-form member of that family: training is counting,
scoring is one term-keyed join — no SGD, no seed, SQL-replayable.

Model: for class c over training tokens,
    p(t|c)  = (cnt_c(t) + k) / (N_c + k * (V + 1))
with V the union vocabulary (one smoothed slot reserved for unseen
terms per class). A document's score is the log-odds

    log_odds = ln(P_pos/P_neg) + sum_t [ln p(t|pos) - ln p(t|neg)]

with the class prior from training document counts.

Scale shape: training is ONE (term, class) groupBy (map-side combine
absorbs the Zipf head) + a two-scalar aggregate; the model is a
distributed term-keyed table (broadcast it yourself only if the
vocabulary is small). Scoring is one explode + one term-keyed left
join + one per-doc groupBy — all partial-agg shuffles, no Python.

Reference analog: none (graph engine); completes the quality-filter
family of ``pipeline/lm.py`` (perplexity) and ``pipeline/text.py``
(heuristic scores).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from gunrock_spark.functions.hashing import tokens


@dataclass
class NBModel:
    """``terms`` is DataFrame[term, lw] with lw = ln p(t|pos) -
    ln p(t|neg) for every term seen in EITHER class (the smoothed slot
    fills the missing side); ``oov_lw`` the weight of a term seen in
    neither; ``prior_lo`` the prior log-odds ln(n_pos/n_neg)."""

    terms: DataFrame
    oov_lw: float
    prior_lo: float
    vocab_size: int
    k: float


def nb_train(
    df: DataFrame,
    positive: Column,
    text_col: str = "text",
    k: float = 0.5,
) -> NBModel:
    """Train on a labeled corpus; ``positive`` is a boolean Column over
    ``df``'s rows (e.g. ``F.col("source") == "wiki"``)."""
    lab = df.select(positive.cast("boolean").alias("pos"), F.col(text_col))
    toks = lab.select(
        "pos", F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("cp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("cn"),
    )
    tot = counts.agg(
        F.sum("cp").alias("np"),
        F.sum("cn").alias("nn"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_pos_t, n_neg_t, vocab = (
        int(tot["np"] or 0),
        int(tot["nn"] or 0),
        int(tot["v"] or 0),
    )
    dp = float(n_pos_t) + k * float(vocab + 1)
    dn = float(n_neg_t) + k * float(vocab + 1)
    terms = counts.select(
        "term",
        (
            F.log((F.col("cp") + F.lit(k)) / F.lit(dp))
            - F.log((F.col("cn") + F.lit(k)) / F.lit(dn))
        ).alias("lw"),
    )
    docs = lab.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("dn"),
    ).collect()[0]
    d_pos, d_neg = int(docs["dp"] or 0), int(docs["dn"] or 0)
    if d_pos == 0 or d_neg == 0:
        raise ValueError("nb_train needs at least one document per class")
    return NBModel(
        terms=terms,
        oov_lw=math.log(k / dp) - math.log(k / dn),
        prior_lo=math.log(float(d_pos) / float(d_neg)),
        vocab_size=vocab,
        k=k,
    )


def nb_score(
    df: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, log_odds, pred) per document; an empty document
    scores the prior alone. ``pred`` is log_odds > 0."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    scored = toks.join(model.terms, "term", "left").select(
        F.col(id_col),
        F.coalesce(F.col("lw"), F.lit(model.oov_lw)).alias("lw"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("lw").alias("slw"),
    )
    lo = F.lit(model.prior_lo) + F.coalesce(F.col("slw"), F.lit(0.0))
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            lo.alias("log_odds"),
            (lo > 0).alias("pred"),
        )
    )

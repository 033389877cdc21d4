"""Unigram language-model scoring — the CCNet-style perplexity
quality filter (Wenzek et al. 2020 score documents with a KenLM model;
the unigram add-k variant here keeps the same pipeline shape —
train a model table, score every document, filter on perplexity —
with fully deterministic, SQL-replayable math).

Model: ``p(t) = (cnt(t) + k) / (N + k * (V + 1))`` over the training
corpus (add-k smoothing; the ``+1`` reserves one smoothed slot for
every out-of-vocabulary token). A document scores

    avg_logp = mean over tokens of ln p(t)      (OOV -> ln p_oov)
    ppl      = exp(-avg_logp)

Scale shape: training is ONE token-count groupBy (map-side combine
absorbs the Zipf head) plus two scalar aggregates; scoring is one
explode + one (term-keyed, partial-agg) join + one per-doc groupBy.
The model table is a first-class DataFrame — at web scale it stays
distributed (term-keyed shuffle join); broadcast it yourself only if
your vocabulary is small. No Python anywhere.

Reference analog: none (graph engine); extends the quality-filter
family of ``pipeline/text.py`` / ``pipeline/repetition.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import tokens


@dataclass
class UnigramLM:
    """Trained model: ``terms`` is DataFrame[term, logp]; ``oov_logp``
    the smoothed log-probability of any unseen token."""

    terms: DataFrame
    oov_logp: float
    n_tokens: int
    vocab_size: int
    k: float


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )


def unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    k: float = 0.5,
) -> UnigramLM:
    """Train on a corpus: one groupBy + one two-scalar aggregate."""
    counts = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    row = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_tokens, vocab = int(row["n"] or 0), int(row["v"] or 0)
    denom = float(n_tokens) + k * float(vocab + 1)
    terms = counts.select(
        "term",
        F.log((F.col("cnt") + F.lit(k)) / F.lit(denom)).alias("logp"),
    )
    import math

    return UnigramLM(
        terms=terms,
        oov_logp=math.log(k / denom),
        n_tokens=n_tokens,
        vocab_size=vocab,
        k=k,
    )


def lm_score(
    df: DataFrame,
    model: UnigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, avg_logp, ppl) per document; empty documents
    score avg_logp = 0, ppl = 1 (nothing to judge)."""
    toks = _doc_tokens(df, id_col, text_col)
    scored = toks.join(model.terms, "term", "left").select(
        F.col(id_col),
        F.coalesce(F.col("logp"), F.lit(model.oov_logp)).alias("logp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg("logp").alias("avg_logp"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.coalesce(F.col("avg_logp"), F.lit(0.0)).alias("avg_logp"),
            F.exp(-F.coalesce(F.col("avg_logp"), F.lit(0.0))).alias("ppl"),
        )
    )


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-source sampling to hit a target corpus mix —
    the data-mixing pass of a pretraining pipeline. ``fractions`` maps
    source -> keep fraction in [0, 1]; unlisted sources are dropped.

    Uses the same arithmetic-hash Bernoulli rule as
    ``pipeline/sampling.hash_sample`` (retry-stable, no rand(), no
    shuffle — a pure filter over the scan), with the source mixed into
    the hash so the same doc id draws independently per source."""
    from gunrock_spark.functions.hashing import h60

    u = (
        h60(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(f":mix:{seed}:"),
                F.col(source_col),
            )
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    pred = F.lit(False)
    for src, frac in sorted(fractions.items()):
        pred = pred | ((F.col(source_col) == src) & (u < F.lit(float(frac))))
    return df.where(pred)

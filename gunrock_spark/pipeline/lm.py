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


def _hashed_ngram_features(
    df: DataFrame, text_col: str, id_col: str | None, n: int, buckets: int
) -> DataFrame:
    """(id?, bucket) — one row per token n-gram, hashed into ``buckets``
    buckets (h60 % buckets). The n-grams are built inside the token
    array (no self-join), the hash is JVM-side — scan-bound."""
    from gunrock_spark.functions.hashing import h60

    toks = tokens(F.lower(F.col(text_col)))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    cols = [F.col(id_col)] if id_col else []
    return (
        df.where(F.size(toks) >= n)
        .select(*cols, F.explode(grams).alias("gram"))
        .select(*cols, (h60(F.col("gram")) % F.lit(buckets)).alias("bucket"))
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    n: int = 2,
    k: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by how target-like its hashed n-gram distribution is,

        logw(doc) = sum over doc n-grams of
                    ln p_target(bucket) - ln p_source(bucket)

    with hashed-bigram bag-of-words features (the paper's estimator)
    and add-k smoothing over the fixed bucket vocabulary. Returns
    DataFrame[<id_col>, n_feats, logw] covering EVERY corpus document
    (no-feature docs score 0.0).

    Scale shape: two bucket-count groupBys (map-side combine; state
    bounded by ``buckets``, not vocab), one bucket-keyed join of the
    exploded corpus features against the ``buckets``-row log-ratio
    table (broadcast-able by construction), one per-doc groupBy.
    No Python, no all-pairs, nothing grows with the target corpus."""
    src_f = _hashed_ngram_features(corpus, text_col, id_col, n, buckets)
    tgt_f = _hashed_ngram_features(target, text_col, None, n, buckets)

    src_counts = src_f.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_src")
    )
    tgt_counts = tgt_f.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_tgt")
    )
    n_src = src_f.count()
    n_tgt = tgt_f.count()
    denom_s = float(n_src) + k * buckets
    denom_t = float(n_tgt) + k * buckets

    lam = src_counts.join(tgt_counts, "bucket", "left").select(
        "bucket",
        (
            F.log((F.coalesce("c_tgt", F.lit(0)) + F.lit(k)) / F.lit(denom_t))
            - F.log((F.col("c_src") + F.lit(k)) / F.lit(denom_s))
        ).alias("lam"),
    )
    docw = (
        src_f.join(lam, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lam").alias("logw"),
        )
    )
    return (
        corpus.select(id_col)
        .join(docw, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def dsir_sample(
    corpus: DataFrame,
    target: DataFrame,
    n_keep: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    n: int = 2,
    k: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k resampling over the importance
    weights — sampling n_keep docs without replacement with probability
    proportional to exp(logw), made deterministic by deriving the
    Gumbel noise from the arithmetic id hash (retry/engine-stable,
    like pipeline/sampling.hash_sample):

        u     = (h60(id:dsir:seed) + 0.5) / 2^60        in (0, 1)
        score = logw + (-ln(-ln(u)))
        keep  = top n_keep by (score desc, id)

    Returns DataFrame[<id_col>, logw, score]. The top-k compiles to
    TakeOrderedAndProject (per-partition heads + driver merge), never
    a global sort."""
    from gunrock_spark.functions.hashing import h60

    w = dsir_weights(corpus, target, text_col, id_col, buckets, n, k)
    u = (
        h60(F.concat(F.col(id_col).cast("string"), F.lit(f":dsir:{seed}")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    return (
        w.select(id_col, "logw", (F.col("logw") + gumbel).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(n_keep)
    )


@dataclass
class BigramLM:
    """Trained bigram model: ``bigrams`` is DataFrame[w1, w2, logp]
    holding ln p(w2|w1) for every SEEN bigram; ``contexts`` is
    DataFrame[w1, ctx_logp_oov] holding ln of the smoothed probability
    of an UNSEEN continuation after a seen context (each context has
    its own denominator, so OOV mass is per-context); ``oov_logp`` is
    the fallback when the context itself was never seen."""

    bigrams: DataFrame
    contexts: DataFrame
    oov_logp: float
    vocab_size: int
    k: float


def _doc_bigrams(df: DataFrame, id_col: str | None, text_col: str) -> DataFrame:
    """One row per adjacent token pair (w1, w2) per document —
    in-array zip of the token list, no self-join."""
    t = tokens(F.lower(F.col(text_col)))
    zipped = F.arrays_zip(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("w2"),
    )
    cols = [F.col(id_col)] if id_col else []
    return df.select(*cols, F.explode(zipped).alias("p")).select(
        *cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def bigram_lm(df: DataFrame, text_col: str = "text", k: float = 0.5) -> BigramLM:
    """Train an add-k bigram LM: p(w2|w1) = (c(w1,w2)+k) / (c(w1,.) +
    k*(V+1)), the per-context ``+1`` reserving one smoothed slot for
    any unseen continuation. Two groupBys (both map-side combined) and
    one scalar aggregate — the model stays a distributed table."""
    import math

    pairs = _doc_bigrams(df, None, text_col)
    bi = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    ctx = bi.groupBy("w1").agg(F.sum("cb").cast("long").alias("c1"))
    vocab = int(
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
        or 0
    )
    denom_add = k * float(vocab + 1)
    bigrams = bi.join(ctx, "w1").select(
        "w1",
        "w2",
        F.log((F.col("cb") + F.lit(k)) / (F.col("c1") + F.lit(denom_add))).alias(
            "logp"
        ),
    )
    contexts = ctx.select(
        "w1",
        F.log(F.lit(k) / (F.col("c1") + F.lit(denom_add))).alias("ctx_logp_oov"),
    )
    return BigramLM(
        bigrams=bigrams,
        contexts=contexts,
        oov_logp=math.log(1.0 / float(vocab + 1)),
        vocab_size=vocab,
        k=k,
    )


def bigram_lm_score(
    df: DataFrame,
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_logp, ppl) per document, scoring every
    adjacent-pair transition (documents with < 2 tokens score
    avg_logp = 0, ppl = 1). Two term-keyed left joins + one per-doc
    groupBy — all partial-agg shuffles, no Python.

    OOV rule: seen (w1,w2) -> trained logp; seen w1, unseen pair ->
    the context's smoothed OOV slot; unseen w1 -> uniform 1/(V+1)."""
    pairs = _doc_bigrams(df, id_col, text_col)
    scored = (
        pairs.join(model.bigrams, ["w1", "w2"], "left")
        .join(model.contexts, "w1", "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.col("logp"),
                F.col("ctx_logp_oov"),
                F.lit(model.oov_logp),
            ).alias("lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg("lp").alias("avg_logp"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("avg_logp"), F.lit(0.0)).alias("avg_logp"),
            F.exp(-F.coalesce(F.col("avg_logp"), F.lit(0.0))).alias("ppl"),
        )
    )


@dataclass
class KNBigramLM:
    """Trained interpolated Kneser-Ney bigram model (Kneser & Ney
    1995; Chen & Goodman 1999's interpolated variant with one fixed
    discount D):

        p(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
                 + (D * N1+(w1,.) / c(w1)) * Pcont(w2)

    where N1+(w1,.) is the number of distinct continuations of w1 and
    ``Pcont`` is the CONTINUATION distribution — how many distinct
    contexts precede w2, not how often it occurs — add-one smoothed to
    close the recursion deterministically:

        Pcont(w2) = (N1+(., w2) + 1) / (B + V + 1)

    (B = distinct bigram count, V = vocabulary; an unseen w2 gets
    1/(B+V+1), the same reserve-one-slot discipline as the add-k
    models). An unseen context backs off to Pcont alone.

    ``bigrams`` is DataFrame[w1, w2, cb]; ``contexts`` is
    DataFrame[w1, c1, lam] with lam = D * N1+(w1,.) / c(w1);
    ``continuations`` is DataFrame[w2, pc]."""

    bigrams: DataFrame
    contexts: DataFrame
    continuations: DataFrame
    discount: float
    pc_oov: float
    vocab_size: int


def kn_bigram_lm(
    df: DataFrame, text_col: str = "text", discount: float = 0.75
) -> KNBigramLM:
    """Train the interpolated KN bigram model: three map-side-combined
    groupBys over the in-array bigram explode plus two scalar
    aggregates. All model components stay distributed DataFrames.
    ``discount`` must lie in (0, 1) so max(c - D, 0) never clips
    (every seen count is >= 1) — which keeps the seen-pair branch a
    single FP expression the SQL oracle replays exactly."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    pairs = _doc_bigrams(df, None, text_col)
    bi = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    bi = bi.persist()
    ctx = bi.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    consts = bi.agg(F.count(F.lit(1)).cast("long").alias("b")).collect()[0]
    b_total = int(consts["b"] or 0)
    vocab = int(
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
        or 0
    )
    denom = float(b_total + vocab + 1)
    contexts = ctx.select(
        "w1",
        "c1",
        (F.lit(discount) * F.col("n1f") / F.col("c1")).alias("lam"),
    )
    continuations = cont.select(
        "w2", ((F.col("n1b") + F.lit(1)) / F.lit(denom)).alias("pc")
    )
    return KNBigramLM(
        bigrams=bi,
        contexts=contexts,
        continuations=continuations,
        discount=discount,
        pc_oov=1.0 / denom,
        vocab_size=vocab,
    )


def kn_bigram_score(
    df: DataFrame,
    model: KNBigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_logp, ppl) under the KN model — same
    contract as :func:`bigram_lm_score` (documents with < 2 tokens
    score avg_logp = 0, ppl = 1). Three term-keyed left joins + one
    per-doc groupBy, all partial-agg shuffles, no Python."""
    pairs = _doc_bigrams(df, id_col, text_col)
    d = F.lit(model.discount)
    pc = F.coalesce(F.col("pc"), F.lit(model.pc_oov))
    lp = (
        F.when(
            F.col("cb").isNotNull(),
            F.log((F.col("cb") - d) / F.col("c1") + F.col("lam") * pc),
        )
        .when(F.col("c1").isNotNull(), F.log(F.col("lam") * pc))
        .otherwise(F.log(pc))
    )
    scored = (
        pairs.join(model.bigrams, ["w1", "w2"], "left")
        .join(model.contexts, "w1", "left")
        .join(model.continuations, "w2", "left")
        .select(F.col(id_col), lp.alias("lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg("lp").alias("avg_logp"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("avg_logp"), F.lit(0.0)).alias("avg_logp"),
            F.exp(-F.coalesce(F.col("avg_logp"), F.lit(0.0))).alias("ppl"),
        )
    )

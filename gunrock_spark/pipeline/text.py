"""Text analysis over a documents table — language-ID, quality
scoring, token statistics, fingerprinting.

Operates on any DataFrame with (id, text) columns; the sandbox tables
are ``documents(doc_id, text, lang, source, n_chars)``. Everything is
pure Catalyst expressions (one projection, no shuffle except the
explicit aggregates) so the per-document pass streams at scan speed —
at 100 TB this pipeline is scan-bound, exactly what you want.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gunrock_spark.functions.hashing import h60, tokens

# deterministic stopword profiles for the n-gram/stopword language
# heuristic (tiny on purpose; swap in real profiles in production)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "no", "por", "para"),
}
STOPWORDS_EN = LANG_PROFILES["en"]


def _token_col(text_col: str) -> Column:
    return tokens(F.lower(F.col(text_col)))


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, n_distinct_tokens, avg_token_len)."""
    toks = _token_col(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, stopword_ratio, alpha_ratio, quality) — a
    deterministic [0,1] quality heuristic:

        quality = 0.4 * min(1, n_tokens/50)
                + 0.3 * (1 - |stopword_ratio - 0.4| / 0.4  clamped to [0,1])
                + 0.3 * alpha_ratio

    (length saturation, stopword-profile proximity, alphabetic
    cleanliness — the standard pretraining-filter trio.)
    """
    toks = _token_col(text_col)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        F.length(text_col) > 0, alpha_chars / F.length(text_col)
    ).otherwise(F.lit(0.0))
    stop_score = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)) / F.lit(0.4)
    )
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens / F.lit(50.0))
        + F.lit(0.3) * stop_score
        + F.lit(0.3) * alpha_ratio
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(quality, 6).alias("quality"),
    )


# Gopher quality-filter thresholds (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A1.1)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2
_BULLETS = ("-", "*", "•")


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021
    Appendix A1.1) as one Catalyst projection — the standard web-crawl
    pretraining filter, complementing :mod:`repetition`'s repetition
    rules and :mod:`c4`'s line rules:

    - word count in [50, 100000] (whitespace words)
    - mean word length in [3, 10]
    - symbol-to-word ratio ('#' or '...') <= 0.1
    - lines starting with a bullet <= 90%
    - lines ending with an ellipsis <= 30%
    - >= 80% of words contain an alphabetic character
    - >= 2 of the 8 required English stopwords present

    Output: (id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, alpha_word_ratio, n_stop, keep). All ratios are
    exact integer-over-integer doubles, so the keep decision is
    FP-deterministic and SQL-replayable. Per-document projection only
    — no shuffle, scan-bound at any corpus size.
    """
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0
    )
    lines = F.split(F.col(text_col), "\n")
    toks = _token_col(text_col)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])

    n_words = F.size(words)
    n_lines = F.size(F.filter(lines, lambda l: F.length(F.trim(l)) > 0))
    word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.when(n_words > 0, word_chars / n_words).otherwise(F.lit(0.0))
    n_symbols = F.regexp_count(F.col(text_col), F.lit("#")) + F.regexp_count(
        F.col(text_col), F.lit(r"\.\.\.")
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: reduce_or([F.trim(l).startswith(b) for b in _BULLETS]),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),
        )
    )
    bullet_ratio = F.when(n_lines > 0, bullet_lines / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, ellipsis_lines / n_lines).otherwise(
        F.lit(0.0)
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    # count over the 8 required stopwords (not over the token array):
    # duplicate-insensitive by construction, so the SQL replay is exact
    n_stop = F.size(F.filter(stop_arr, lambda s: F.array_contains(toks, s)))
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_ratio <= GOPHER_MAX_BULLET_RATIO)
        & (ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.cast("int").alias("n_stop"),
        keep.alias("keep"),
    )


def quality_rollup(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_keep_rate: float = 0.5,
) -> DataFrame:
    """Per-domain (or per-source/host) Gopher-quality rollup — the
    DOMAIN-level filter every production curation pipeline layers on
    top of the per-document rules: a host whose pages mostly fail the
    quality rules is dropped wholesale (mirror farms, link spam,
    machine-generated boilerplate).

    (group, n_docs, n_keep, keep_rate, avg_words, n_bad_length,
    n_low_alpha, n_few_stopwords, domain_keep) — all counts are
    integer sums over :func:`gopher_quality` rows and every ratio is
    an exact int/int double, so the keep decisions are
    FP-deterministic and SQL-replayable. One groupBy over the
    scan-bound quality projection; map-side combinable.
    """
    q = gopher_quality(df, id_col=group_col, text_col=text_col)
    flag = lambda c: F.sum(c.cast("int"))  # noqa: E731
    agg = q.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        flag(F.col("keep")).cast("long").alias("n_keep"),
        F.sum("n_words").cast("long").alias("total_words"),
        flag(
            (F.col("n_words") < GOPHER_MIN_WORDS)
            | (F.col("n_words") > GOPHER_MAX_WORDS)
        ).cast("long").alias("n_bad_length"),
        flag(F.col("alpha_word_ratio") < GOPHER_MIN_ALPHA_WORD_RATIO)
        .cast("long")
        .alias("n_low_alpha"),
        flag(F.col("n_stop") < GOPHER_MIN_STOPWORDS)
        .cast("long")
        .alias("n_few_stopwords"),
    )
    keep_rate = F.col("n_keep") / F.col("n_docs")
    return agg.select(
        F.col(group_col),
        "n_docs",
        "n_keep",
        F.round(keep_rate, 6).alias("keep_rate"),
        F.round(F.col("total_words") / F.col("n_docs"), 6).alias("avg_words"),
        "n_bad_length",
        "n_low_alpha",
        "n_few_stopwords",
        (keep_rate >= min_keep_rate).alias("domain_keep"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, n_distinct_chars, char_entropy) — per-document
    Shannon entropy (bits) of the character distribution, the classic
    gibberish/binary-junk detector (very low entropy = repeated
    characters, very high = random bytes; natural-language text sits
    in a narrow band ~3.5-4.5 bits).

    Pure HOF projection: per doc O(distinct_chars x len) comparisons
    with a ~100-symbol alphabet — scan-bound, no shuffle, no UDF.
    """
    # split("", "") yields [""] — drop zero-length elements so empty
    # docs count 0 chars (the SQL regexp_extract_all mirror already does)
    chars = F.filter(
        F.split(F.col(text_col), ""), lambda c: F.length(c) > 0
    )
    uniq = F.array_distinct(chars)
    n = F.size(chars)
    probs = F.transform(
        uniq,
        lambda ch: F.size(F.filter(chars, lambda c: c == ch)) / n,
    )
    ent = -F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc + p * F.log2(p)
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.size(uniq).cast("long").alias("n_distinct_chars"),
        F.round(F.when(n > 0, ent).otherwise(F.lit(0.0)), 6).alias(
            "char_entropy"
        ),
    )


def reduce_or(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, lang_pred, lang_hits) — stopword-profile language ID:
    the language whose profile hits the most tokens wins; zero hits →
    'und'; ties → lexicographically smallest code (deterministic)."""
    toks = _token_col(text_col)

    def _hits(words: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = df.select(
        F.col(id_col),
        *[
            _hits(words).alias(f"hits_{code}")
            for code, words in sorted(LANG_PROFILES.items())
        ],
    )
    # argmax via greatest + chained when (codes in sorted order → ties
    # resolve to the smallest code)
    best = F.greatest(*[F.col(f"hits_{c}") for c in sorted(LANG_PROFILES)])
    pred = F.when(best == 0, F.lit("und"))
    for code in sorted(LANG_PROFILES):
        pred = pred.when(F.col(f"hits_{code}") == best, F.lit(code))
    return scored.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_hits"),
    )


def term_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(term, n_occurrences, n_docs) — corpus vocabulary with term and
    document frequencies, the input to tokenizer training / TF-IDF /
    stopword discovery. One explode + one groupBy (map-side partial
    aggregation absorbs the Zipf head: every partition pre-combines
    its 'the' counts before the shuffle, so hot terms do NOT skew the
    exchange the way a raw groupBy on documents would)."""
    toks = _token_col(text_col)
    exploded = df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("term"))
    out = exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col("_id")).alias("n_docs"),
    )
    if min_count > 1:
        out = out.where(F.col("n_occurrences") >= min_count)
    return out


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(ngram, n_occurrences) — token n-gram counts (space-joined),
    the raw material for n-gram LM scoring and BPE-ish merges. The
    n-grams are built INSIDE the token array (transform over index
    sequence — whole-stage codegen, no self-join, no extra shuffle),
    then one explode + groupBy."""
    toks = _token_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    out = (
        df.where(F.size(toks) >= n)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    if min_count > 1:
        out = out.where(F.col("n_occurrences") >= min_count)
    return out


def zipf_alpha(
    df: DataFrame, text_col: str = "text", x_min: int = 2
) -> DataFrame:
    """One row (n_tail, x_min, alpha) — the Zipf exponent of the TERM
    frequency distribution by the same Clauset-Shalizi-Newman discrete
    MLE as gstats.powerlaw_alpha (alpha ≈ 1 + n / Σ ln(f / (x_min -
    0.5)) over terms with frequency >= x_min): the one-pass corpus
    health check that tokenized web text kept its expected Zipf tail
    (alpha ≈ 2 for natural language; a template-dominated or
    boilerplate-heavy crawl flattens it). One explode + two
    partial-agg aggregates — vocabulary-sized, never corpus-sized,
    after the first combine."""
    toks = _token_col(text_col)
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
        .where(F.col("f") >= x_min)
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.lit(x_min).cast("long").alias("x_min"),
        (
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("f") / F.lit(x_min - 0.5)))
        ).alias("alpha"),
    )


def grouped_top_terms(
    df: DataFrame,
    group_col: str = "source",
    k: int = 5,
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """(group, term, n_occurrences, rank) — per-group heavy hitters:
    the k most frequent terms within each group (per-host/per-source
    vocabulary profiling, template detection, per-domain stopword
    discovery). rank is 1..k ordered by (count desc, term asc) — a
    deterministic total order, so the result is unique and
    SQL-replayable.

    Scale shape (100 TB): explode + groupBy(group, term) map-side
    combines the Zipf head exactly like term_counts; then top-k is
    TWO-STAGE so no single task ever sorts a whole group's vocabulary
    — stage 1 takes the top-k within (group, h60(term) mod n_buckets)
    slices, stage 2 re-ranks the surviving <= n_buckets*k rows per
    group. Every global per-group top-k term is its bucket's top-k
    too, so the pre-prune is lossless."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql.window import Window

    from gunrock_spark.functions.hashing import h60

    toks = _token_col(text_col)
    counts = (
        df.select(F.col(group_col).alias("grp"), F.explode(toks).alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    order = [F.col("n_occurrences").desc(), F.col("term").asc()]
    bucket = F.pmod(h60(F.col("term")), F.lit(n_buckets))
    w_bucket = Window.partitionBy("grp", bucket).orderBy(*order)
    pruned = counts.withColumn("_br", F.row_number().over(w_bucket)).where(
        F.col("_br") <= k
    )
    w_grp = Window.partitionBy("grp").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w_grp))
        .where(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col), "term", "n_occurrences", "rank"
        )
    )


# deliberately simple, deterministic patterns (production would plug
# in a real PII library; the PIPELINE contract — scan-bound Catalyst
# regexp counting, no UDF — is what this engine provides)
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phones": r"\+?[0-9][0-9()\[\] .-]{7,}[0-9]",
    "urls": r"https?://[^\s]+",
    "ipv4s": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_phones, n_urls, n_ipv4s, has_pii) — per-doc
    counts of PII-shaped spans, the filter/redaction gate of a
    training-data pipeline. Pure regexp_count projections."""
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col), *cols)
    flag = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag.cast("boolean"))


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp) — order-insensitive 60-bit document fingerprint:
    h60 of the sorted distinct token list (canonical bag-of-words
    form; robust to whitespace/ordering noise, the cheap cousin of
    simhash for exact-content clustering)."""
    toks = _token_col(text_col)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.select(F.col(id_col), h60(canon).alias("fp"))


def tfidf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf, df_docs, tfidf) — smoothed TF-IDF per
    (document, term): tf = in-doc count, idf = ln((N+1)/(df+1)) + 1
    (the sklearn smooth-idf convention, always > 0).

    Two partial-agg shuffles ((id, term) counts, then term document
    frequencies) plus one term join — no windows, no self-joins. The
    corpus size N is a single metadata count (same scalar class as
    PageRank's dangling-mass term): one cheap action against a cached
    table, never a per-row driver loop. At 100 TB the (id, term)
    aggregation is the dominant exchange and map-side combine absorbs
    the Zipf head exactly as in term_counts."""
    pairs = df.select(F.col(id_col).alias("_id"), F.explode(_token_col(text_col)).alias("term"))
    tf = pairs.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.select(id_col).distinct().count()
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df_docs") + 1.0)) + F.lit(1.0)
    return tf.join(dfreq, "term").select(
        F.col("_id").alias(id_col),
        "term",
        "tf",
        "df_docs",
        (F.col("tf") * idf).alias("tfidf"),
    )


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 1000,
    scale: int = 1 << 20,
) -> DataFrame:
    """(id_a, id_b, dot, cosine) — all-pairs document similarity over
    sparse TF-IDF-weighted term vectors (the inverted-index similarity
    join of Bayardo et al., "Scaling up all pairs similarity search",
    WWW 2007): documents share a candidate pair iff they share a
    surviving term, scored by the dot product of their weighted
    vectors.

    Determinism contract: weights are INTEGER-quantized — w(d, t) =
    tf · (scale DIV df) — so dot products and squared norms are exact
    BIGINT sums (partition-order-invariant, no float accumulation),
    and cosine = dot / (√n_a·√n_b) is ONE fixed float expression over
    exact integers, SQL-replayable bit-for-bit. DIV-quantized idf
    preserves the idf ordering (rarer term => larger weight) without
    ln() rounding hazards at quantization boundaries.

    Scale shape (100 TB): the df filter [min_df, max_df] is THE
    quadratic-head control — dropping df>max_df stop-terms bounds
    every posting list, so the term self-join generates at most
    Σ_t |posting(t)|² ≤ max_df · |postings| candidate rows (the same
    escape hatch as jaccard's max_shingle_df); min_df≥2 drops the
    singleton tail that can never pair. Everything else is two
    partial-agg shuffles + one groupBy(pair) sum.

    Overflow bound: choose ``scale`` so max(tf·(scale DIV min_df))²
    times the max shared-term count stays below 2^63 — the default
    2^20 leaves ~2e4 headroom for tf=50, df=2, 100 shared terms;
    shrink scale for pathological corpora (long docs of one rare
    term)."""
    if min_df < 1 or max_df < min_df:
        raise ValueError("need 1 <= min_df <= max_df")
    pairs = df.select(
        F.col(id_col).alias("_id"), F.explode(_token_col(text_col)).alias("term")
    )
    tf = pairs.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_docs"))
        .where(
            (F.col("df_docs") >= min_df) & (F.col("df_docs") <= max_df)
        )
    )
    w = (
        F.col("tf").cast("long")
        * F.expr(f"CAST({scale} AS BIGINT) DIV df_docs")
    ).alias("w")
    weights = tf.join(dfreq, "term").select("_id", "term", w)
    norms = weights.groupBy("_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    a, b = weights.alias("a"), weights.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("n2").alias("_na"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("n2").alias("_nb"))
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", "dot", F.round(cosine, 6).alias("cosine"))
    )


def bm25(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) — Okapi BM25 of each document against the query
    term bag. idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

    The per-term filter runs BEFORE the aggregation (only query-term
    occurrences survive the explode), the per-term document-frequency
    table is |Q| rows and broadcast, and document length joins on the
    (id)-keyed length table — so the whole query is bounded by the
    matching postings, not the corpus vocabulary."""
    base = df.select(F.col(id_col).alias("_id"), _token_col(text_col).alias("_toks"))
    dl = base.select("_id", F.size("_toks").cast("double").alias("dl"))
    row = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n, avgdl = float(row["n"]), float(row["avgdl"] or 0.0)
    pairs = base.select("_id", F.explode("_toks").alias("term")).where(
        F.col("term").isin([t.lower() for t in query_terms])
    )
    tf = pairs.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    idf = F.log(
        F.lit(1.0) + (F.lit(n) - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5)
    )
    norm = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "_id")
        .select("_id", (idf * F.col("tf") * F.lit(k1 + 1.0) / norm).alias("s"))
        .groupBy("_id")
        .agg(F.sum("s").alias("score"))
        .select(F.col("_id").alias(id_col), "score")
    )


def length_percentile_filter(
    df: DataFrame,
    low_q: float = 0.05,
    high_q: float = 0.99,
    id_col: str = "doc_id",
    text_col: str = "text",
    bins_per_octave: int = 8,
) -> DataFrame:
    """(id, n_tokens, keep) — corpus-RELATIVE length filtering: keep
    documents whose token count lies within [q_low, q_high] of the
    corpus's own length distribution, estimated by the log-binned
    quantile sketch (pipeline/sketches.py). Unlike Gopher's absolute
    50/100k-token cutoffs this adapts to the corpus; the sketch makes
    it one partial-agg pass + a <= 63*bpo-row driver threshold
    instead of an exact global sort of 10^12 lengths.

    Threshold semantics (deterministic, integer): a doc keeps iff
    est(low_q) <= n_tokens <= est(high_q), where est() is the
    conservative lower-edge estimator — both bounds are exact
    integers, so the filter is bit-reproducible in SQL."""
    from gunrock_spark.pipeline.sketches import log_histogram, quantile_estimates

    counts = df.select(
        F.col(id_col), F.size(_token_col(text_col)).cast("long").alias("n_tokens")
    )
    hist = log_histogram(counts, "n_tokens", bins_per_octave)
    qs = {
        r["q"]: r["est"]
        for r in quantile_estimates(hist, [low_q, high_q], bins_per_octave).collect()
    }
    lo, hi = int(qs[low_q]), int(qs[high_q])
    return counts.select(
        id_col,
        "n_tokens",
        ((F.col("n_tokens") >= lo) & (F.col("n_tokens") <= hi)).alias("keep"),
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_pair_count: int = 5,
) -> DataFrame:
    """(a, b, n_pairs, pmi) — unordered token co-occurrence counts
    within ``window`` positions plus pointwise mutual information:
    the count matrix GloVe/SVD-style embeddings factorize and the
    collocation-discovery signal (Church & Hanks 1990; Levy &
    Goldberg 2014; public knowledge).

    Counting: for token positions i < k with k - i <= window, one
    slot for the unordered pair (least(t_i,t_k), greatest(t_i,t_k)).
    With N total slots and participation marginals
    m_x = sum over slots containing x (self-pairs count twice)::

        pmi(a,b) = ln( (c_ab / N) / ((m_a / 2N) * (m_b / 2N)) )
                 = ln( ((4.0 * N) * c_ab) / (m_a * m_b) )

    evaluated in EXACTLY that association order on exact integer
    counts, so the doubles are bit-identical across engines; rounded
    to 9.

    Scale shape: pairs are generated IN-ARRAY (window-bounded
    transform — no token self-join), then ONE map-side-combined
    groupBy; marginals derive from the grouped matrix (|pairs| rows,
    not |slots|), N is a 1-row broadcast. The Zipf head ('the','and')
    pre-combines per partition exactly as term_counts does."""
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = _token_col(text_col)
    pair_expr = (
        "flatten(transform(sequence(1, size(_t) - 1), i -> "
        f"transform(sequence(i + 1, least(i + {int(window)}, size(_t))), k -> "
        "struct(least(element_at(_t, i), element_at(_t, k)) AS a, "
        "greatest(element_at(_t, i), element_at(_t, k)) AS b))))"
    )
    slots = (
        df.select(toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.a", "p.b")
    )
    c = slots.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    c = c.persist()
    marg = (
        c.select(F.col("a").alias("x"), "n_pairs")
        .unionAll(c.select(F.col("b").alias("x"), "n_pairs"))
        .groupBy("x")
        .agg(F.sum("n_pairs").alias("m"))
    )
    total = c.agg(F.sum("n_pairs").alias("N"))
    out = (
        c.where(F.col("n_pairs") >= int(min_pair_count))
        .join(marg.select(F.col("x").alias("a"), F.col("m").alias("m_a")), "a")
        .join(marg.select(F.col("x").alias("b"), F.col("m").alias("m_b")), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "n_pairs",
            F.round(
                F.log(
                    ((F.lit(4.0) * F.col("N")) * F.col("n_pairs"))
                    / (F.col("m_a").cast("double") * F.col("m_b"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    return out


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 1_000,
    min_df: int = 1,
) -> DataFrame:
    """(term, df, doc_ids array<long> sorted asc) — document-frequency-
    capped posting lists, the materialized search-index artifact behind
    tfidf/bm25 scoring.

    Scale shape: the document-frequency table is computed FIRST (one
    distinct + one partial-agg count), and only terms with
    min_df <= df <= max_df reach the collect_list — a stopword's
    |corpus|-row posting list is never buffered anywhere (the same
    prune-before-the-expensive-stage discipline as dedup's
    stop-shingle cap). Posting lists are therefore bounded at max_df
    entries per term, and the final aggregation is keyed on term with
    per-list memory <= max_df * 8 bytes.
    """
    toks = _token_col(text_col)
    pairs = (
        df.select(F.col(id_col).cast("long").alias("_id"), F.explode(toks).alias("term"))
        .distinct()
    )
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    keep = dfreq.where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    return (
        pairs.join(keep, "term")
        .groupBy("term", "df")
        .agg(F.sort_array(F.collect_list("_id")).alias("doc_ids"))
        .select("term", "df", "doc_ids")
    )

"""BPE tokenizer training — byte-pair-encoding merge learning over the
corpus word-frequency table.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.,
ACL 2016, "Neural Machine Translation of Rare Words with Subword
Units" — public algorithm): repeatedly find the most frequent adjacent
symbol pair across the corpus and fuse it into one symbol. The classic
implementation is a single-machine loop over a python dict; at 100 TB
the right factoring is the one used here:

  * the corpus collapses to its WORD-FREQUENCY table first (one
    partial-agg groupBy — Zipf makes this table ~|vocab|, bounded and
    tiny relative to the corpus, and it is the ONLY thing the merge
    loop ever touches);
  * each merge round is two distributed ops over that table: adjacent-
    pair counting (explode + partial-agg sum) and a greedy left-to-
    right pair fusion (one Catalyst ``aggregate`` fold projection —
    no Python, no shuffle);
  * the only driver traffic per round is the argmax pair — one row
    (the same bounded stop-metric convention as the iterative graph
    loops, cf. engine/iterate.py).

Determinism contract: pair counting weights every adjacent occurrence
(including overlaps) by word frequency — Sennrich's get_stats; the
argmax tie-breaks by (count DESC, pair string ASC); fusion is greedy
left-to-right — a fold where a just-fused symbol never re-fuses in
the same round (matching the reference implementation's re-scan
semantics). All symbols stay [a-z0-9]+ substrings, so merge tables
replay bit-for-bit on any engine; the DuckDB oracle in
__spark_entry__ re-learns the identical merges via unrolled
recursive-CTE folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gunrock_spark.functions.hashing import tokens

_SYMS_INIT = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"


def word_vocab(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, freq): corpus word-frequency table under the engine
    tokenizer — the bounded object every BPE round operates on."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """(pair, cnt) over a (word, freq, syms) table: every adjacent
    symbol pair, overlaps included, weighted by word frequency
    (Sennrich get_stats). Explode + one partial-agg sum."""
    return (
        vocab_syms.select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1),"
                    " slice(syms, 2, size(syms) - 1),"
                    " (x, y) -> concat(x, ' ', y))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_pair_expr(lhs: str, rhs: str) -> str:
    """Catalyst fold fusing every greedy left-to-right (lhs, rhs)
    adjacency in ``syms``: carry the last symbol; fuse when it equals
    ``lhs`` and the next equals ``rhs`` — the fused symbol becomes the
    carry, so it cannot re-fuse as ``lhs`` within the round (it is a
    different, longer string). Symbols are [a-z0-9]+ so inlining them
    as literals is injection-safe (asserted by the caller)."""
    return merge_pairs_expr([(lhs, rhs)])


def merge_pairs_expr(pairs: list[tuple[str, str]]) -> str:
    """One Catalyst fold applying a BATCH of symbol-disjoint merges in
    a single left-to-right pass. Because the batch is symbol-disjoint
    (see :func:`_select_disjoint_batch`), at most one pair can match
    any adjacency, so the single pass is exactly the sequential
    application of the pairs — same greedy no-refuse carry rule as the
    one-pair fold."""
    whens = "".join(
        f"  WHEN element_at(acc, -1) = '{l}' AND x = '{r}'"
        f"  THEN concat(slice(acc, 1, size(acc) - 1), array('{l + r}'))"
        for l, r in pairs
    )
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE aggregate("
        " slice(syms, 2, size(syms) - 1),"
        " slice(syms, 1, 1),"
        " (acc, x) -> CASE"
        + whens
        + "  ELSE concat(acc, array(x)) END) END"
    )


def _select_disjoint_batch(
    ranked: list[tuple[str, str, int]], batch_size: int
) -> list[tuple[str, str, int]]:
    """Greedily take up to ``batch_size`` pairs from the
    (cnt DESC, pair ASC)-ranked candidate list such that every kept
    pair is SYMBOL-DISJOINT from all earlier kept pairs — its lhs and
    rhs appear in no earlier pair's {lhs, rhs, fused}. Disjointness is
    what makes batch application exact: fusing an earlier pair can
    neither create nor destroy an occurrence of a later one (the only
    new symbol it introduces is its fused string, excluded here), so
    the batch applied in one pass equals applying its pairs one at a
    time — the standard scalable-BPE batching argument."""
    kept: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for lhs, rhs, cnt in ranked:
        if len(kept) >= batch_size:
            break
        if lhs in used or rhs in used:
            continue
        kept.append((lhs, rhs, cnt))
        used.update((lhs, rhs, lhs + rhs))
    return kept


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, vocab_syms)``: ``merges`` is the learned model,
    (merge_idx int, lhs string, rhs string, pair_count long) in learn
    order — the tiny table a tokenizer ships; ``vocab_syms`` is
    (word, freq, syms array<string>), every corpus word segmented
    under the full merge sequence (the encode lookup table — encoding
    a corpus is one broadcast join against it). Stops early if no
    adjacent pair remains.

    ``batch_size`` > 1 enables BATCH-GREEDY rounds (VERDICT r4 #2):
    each round takes the top-B count-ranked pairs that are mutually
    SYMBOL-DISJOINT (see :func:`_select_disjoint_batch`) and applies
    them in one fold pass, so a 32k-merge tokenizer needs ~n_merges/B
    Spark rounds instead of n_merges. Disjoint pairs cannot create or
    destroy each other's occurrences, so every batched merge's
    recorded pair_count equals what a sequential re-count would have
    seen; the merge ORDER can differ from strict Sennrich when an
    early merge of a round would have spawned a brand-new pair that
    out-counts a later batch member — the standard, documented
    approximation of scalable-BPE batching (exact at batch_size=1).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    spark: SparkSession = df.sparkSession
    vocab = (
        word_vocab(df, id_col, text_col)
        .withColumn("syms", F.expr(_SYMS_INIT))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        b = min(batch_size, n_merges - len(merges))
        # over-fetch: conflicting candidates are skipped, so pull 4B
        # ranked rows to fill the batch in one driver round-trip
        # (b=1 keeps the exact limit(1) plan of the sequential mode)
        top = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1 if b == 1 else 4 * b)
            .collect()
        )
        if not top:
            break
        ranked = [
            (*r["pair"].split(" "), int(r["cnt"])) for r in top
        ]
        batch = _select_disjoint_batch(ranked, b)
        for lhs, rhs, cnt in batch:
            assert lhs.isalnum() and rhs.isalnum()  # literal-inline safety
            merges.append((len(merges), lhs, rhs, cnt))
        # one projection; localCheckpoint keeps the plan flat across rounds
        vocab = vocab.withColumn(
            "syms",
            F.expr(merge_pairs_expr([(l, r) for l, r, _ in batch])),
        ).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(
        merges, schema="merge_idx int, lhs string, rhs string, pair_count long"
    )
    return merges_df, vocab


def bpe_segment(
    df: DataFrame,
    vocab_syms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, word_pos, word, syms): the corpus tokenized under a
    learned model — one explode + one equi-join against the segmented
    vocab (broadcast it when the vocab fits; Zipf usually makes it
    so)."""
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("word_pos", "word"),
    )
    return words.join(vocab_syms.select("word", "syms"), "word").select(
        id_col, "word_pos", "word", "syms"
    )

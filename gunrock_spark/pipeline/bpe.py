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
    fused = lhs + rhs
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE aggregate("
        " slice(syms, 2, size(syms) - 1),"
        " slice(syms, 1, 1),"
        " (acc, x) -> CASE"
        f"  WHEN element_at(acc, -1) = '{lhs}' AND x = '{rhs}'"
        f"  THEN concat(slice(acc, 1, size(acc) - 1), array('{fused}'))"
        "  ELSE concat(acc, array(x)) END) END"
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, vocab_syms)``: ``merges`` is the learned model,
    (merge_idx int, lhs string, rhs string, pair_count long) in learn
    order — the tiny table a tokenizer ships; ``vocab_syms`` is
    (word, freq, syms array<string>), every corpus word segmented
    under the full merge sequence (the encode lookup table — encoding
    a corpus is one broadcast join against it). Stops early if no
    adjacent pair remains."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark: SparkSession = df.sparkSession
    vocab = (
        word_vocab(df, id_col, text_col)
        .withColumn("syms", F.expr(_SYMS_INIT))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs = best[0]["pair"].split(" ")
        assert lhs.isalnum() and rhs.isalnum()  # literal-inline safety
        merges.append((r, lhs, rhs, int(best[0]["cnt"])))
        # one projection; localCheckpoint keeps the plan flat across rounds
        vocab = vocab.withColumn(
            "syms", F.expr(merge_pair_expr(lhs, rhs))
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

"""Sequence packing — concat-and-chunk layout of a tokenized corpus
into fixed-length training sequences.

The last step of every LLM training-data pipeline: lay all documents'
tokens end-to-end in a canonical order (ascending ``id_col``) and cut
the stream into chunks of exactly ``seq_len`` tokens, recording which
document supplies which span of which chunk. Downstream loaders join
this map back to the tokenized text to emit training batches; the map
itself is what has to be computed at corpus scale, and it is pure
arithmetic once every document's global token offset is known.

The offset is a global prefix sum — the one primitive that naively
compiles to a single-partition window over the whole corpus (the
plan-killer at 100 TB). We compute it with the classic two-level
scan instead, the same shape a GPU scan kernel uses (block-local scan
+ scan of block totals — cf. the reference's multi_scan machinery,
gunrock/util/multi_scan/multi_scan.cuh, which exists for exactly this
reason):

  1. bucket = id // bucket_size                (pure projection)
  2. per-bucket token totals: one partial-agg groupBy — the ONLY
     full-corpus shuffle, and it moves one row per bucket
  3. exclusive prefix over the bucket-totals table — a window over
     #buckets rows (corpus/bucket_size; ~10^6 rows for 10^12 docs at
     the default 2^20), a bounded driver-scale table
  4. broadcast-join the bucket offsets back; within-bucket exclusive
     prefix via a window partitioned BY BUCKET — every sort is over
     at most ``bucket_size`` rows, a constant
  5. each doc spans [start, start+n); explode the chunk ids it
     intersects with F.sequence — output rows == map size, no
     intermediate blow-up

Determinism contract: tokenization is the engine-wide TOKEN_RE
(functions/hashing.tokens) on lowercased text; offsets are exact
BIGINT arithmetic; chunk ids are 0-based. Empty documents (0 tokens)
occupy no span and are absent from the map. The result replays
bit-for-bit on any engine — the DuckDB oracle in __spark_entry__
recomputes the identical map from one SQL window + UNNEST(range()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from gunrock_spark.functions.hashing import tokens

DEFAULT_BUCKET_SIZE = 1 << 20


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n) token counts under the engine tokenizer; 0-token docs
    dropped (they occupy no span in the packed stream)."""
    return (
        df.select(
            F.col(id_col),
            F.size(tokens(F.lower(F.col(text_col)))).cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
    )


def doc_offsets(
    counts: DataFrame, id_col: str = "doc_id", bucket_size: int = DEFAULT_BUCKET_SIZE
) -> DataFrame:
    """(id, n, start): exclusive global prefix sum of ``n`` in
    ascending id order, via the two-level scan described in the module
    docstring. ``counts`` must be (id, n) with unique numeric ids."""
    if bucket_size < 1:
        raise ValueError("bucket_size must be >= 1")
    bucketed = counts.withColumn(
        "__b", F.floor(F.col(id_col) / F.lit(bucket_size)).cast("long")
    )
    # (2) one row per bucket; (3) exclusive prefix over that small table.
    # The single-partition window here sorts corpus/bucket_size rows —
    # bounded and tiny by construction (see module docstring).
    w_buckets = (
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_offsets = (
        bucketed.groupBy("__b")
        .agg(F.sum("n").alias("__btot"))
        .select(
            "__b",
            F.coalesce(F.sum("__btot").over(w_buckets), F.lit(0))
            .cast("long")
            .alias("__boff"),
        )
    )
    # (4) broadcast the bucket offsets back; within-bucket exclusive
    # prefix — each window sort is over <= bucket_size rows.
    w_in = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(bucket_offsets), "__b")
        .select(
            F.col(id_col),
            F.col("n"),
            (
                F.col("__boff")
                + F.coalesce(F.sum("n").over(w_in), F.lit(0))
            )
            .cast("long")
            .alias("start"),
        )
    )


def pack_chunks(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = DEFAULT_BUCKET_SIZE,
) -> DataFrame:
    """The packing map: one row per (document, chunk) intersection.

    (id, chunk_id, chunk_off, doc_off, n_tok) — tokens
    [doc_off, doc_off + n_tok) of the document land at positions
    [chunk_off, chunk_off + n_tok) of training sequence ``chunk_id``.
    A document longer than ``seq_len`` spans several chunks; a chunk
    holds several short documents. Every chunk except the last is
    exactly ``seq_len`` tokens full by construction.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    pos = doc_offsets(token_counts(df, id_col, text_col), id_col, bucket_size)
    L = F.lit(int(seq_len))
    first = F.floor(F.col("start") / L).cast("long")
    last = F.floor((F.col("start") + F.col("n") - 1) / L).cast("long")
    begin = F.greatest(F.col("start"), F.col("chunk_id") * L)
    end = F.least(F.col("start") + F.col("n"), (F.col("chunk_id") + 1) * L)
    return (
        pos.select(
            id_col,
            "n",
            "start",
            F.explode(F.sequence(first, last)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            (begin - F.col("chunk_id") * L).cast("long").alias("chunk_off"),
            (begin - F.col("start")).cast("long").alias("doc_off"),
            (end - begin).cast("long").alias("n_tok"),
        )
    )


def chunk_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """(chunk_id, n_docs, fill): per-sequence composition — how many
    documents contribute and what fraction of ``seq_len`` is used
    (1.0 everywhere except the final chunk). One partial agg over the
    packing map."""
    return packed.groupBy("chunk_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.sum("n_tok") / F.lit(float(seq_len)), 6).alias("fill"),
    )

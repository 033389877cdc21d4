"""Corpus-hygiene operators: line-level exact dedup (CCNet-style) and
benchmark decontamination (eval-set n-gram overlap flagging).

Two ops every 100 TB pretraining pipeline runs that the rest of the
dedup family (document-level exact/MinHash/SimHash in
``pipeline/dedup.py``) does not cover:

* **line_dedup** — remove every repeated LINE across the corpus,
  keeping only its globally-first occurrence (smallest
  ``(doc_id, line_no)``). This is the CCNet / RefinedWeb "line-level
  dedup" pass that strips boilerplate (nav bars, cookie banners,
  footers) which document-level near-dup misses because the documents
  differ everywhere else. Scale shape: one ``posexplode`` (no
  shuffle), one line-hash ``groupBy`` with a map-side-combinable
  ``min(struct)`` (the ONE unavoidable global exchange — boilerplate
  lines collapse to a single row per partition before the shuffle, so
  the "© 2024" line repeated 10^9 times costs one row per map task,
  not 10^9 shuffled rows), one co-partitioned join back on the same
  hash, and one per-document rebuild groupBy.

* **contamination_flags** — flag training documents that contain any
  token n-gram from a (small) benchmark/eval set, the standard
  decontamination pass (GPT-3 appendix C / PaLM-style n-gram overlap).
  Scale shape: the eval n-gram table is tiny (10^5-10^6 rows even for
  a large benchmark suite) → ``broadcast`` inner join against the
  corpus's in-array n-grams; the 100 TB side is never shuffled, the
  whole pass is scan-bound.

Everything is pure Catalyst (h60 hashing, in-array n-gram
construction as in ``pipeline/text.py:ngram_counts``) — no Python in
the hot path, DuckDB-replayable for the oracle gate.

Reference analog: the reference engine has no corpus ops (it is a
graph engine); these extend the training-data pipeline the same way
``pipeline/dedup.py`` does. Dedup-keeper tie-break mirrors
``pipeline/dedup.py``'s min-doc_id canonical-representative rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import h60, tokens


def split_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
) -> DataFrame:
    """(id, line_no long, line string) — positional line explode.
    ``line_no`` is 0-based. Empty lines are dropped (they carry no
    content and would otherwise all collide into one global keeper)."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), delimiter)).alias(
                "line_no", "line"
            ),
        )
        .where(F.length("line") > 0)
        .withColumn("line_no", F.col("line_no").cast("long"))
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    lines: DataFrame | None = None,
) -> DataFrame:
    """Corpus-wide line dedup: DataFrame[id, text (rebuilt), n_lines
    long, n_lines_kept long].

    A line survives iff its ``(doc_id, line_no)`` is the corpus-wide
    minimum for its exact content (h60 of the line) — the
    first-occurrence-keeps rule, deterministic under any partitioning.
    Documents whose every line is removed still appear, with
    ``text = ''`` and ``n_lines_kept = 0`` (the caller decides whether
    to drop empties). Pass ``lines`` (a ``split_lines``-shaped frame)
    to dedup pre-split lines and skip the text split.
    """
    if lines is None:
        lines = split_lines(df, id_col=id_col, text_col=text_col, delimiter=delimiter)
    ln = lines.withColumn("lh", h60(F.col("line")))
    # globally-first occurrence per line hash. min(struct) is
    # partial-aggregable: each map task emits one candidate keeper per
    # distinct line before the exchange.
    keeper = ln.groupBy("lh").agg(
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("k")
    )
    kept = ln.join(keeper, "lh").where(
        (F.col("k")[id_col] == F.col(id_col))
        & (F.col("k")["line_no"] == F.col("line_no"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
        ).alias("_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0))
            .cast("long")
            .alias("n_lines_kept"),
        )
    )


def _ngram_array(text_col: str, n: int):
    """array<string> of space-joined token n-grams, built in-array
    (whole-stage codegen, no self-join) — same construction as
    pipeline/text.py:ngram_counts."""
    toks = tokens(F.lower(F.col(text_col)))
    return F.when(F.size(toks) >= n, F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )).otherwise(F.array().cast("array<string>"))


def eval_ngrams(
    eval_df: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(gh long) — distinct h60 hashes of the eval set's token
    n-grams. Small by construction (benchmarks are thousands of
    documents, not billions); downstream joins broadcast it."""
    return (
        eval_df.select(F.explode(_ngram_array(text_col, n)).alias("g"))
        .select(h60(F.col("g")).alias("gh"))
        .distinct()
    )


def contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits long, contaminated boolean) for every training
    document: ``n_hits`` = how many DISTINCT eval n-grams the document
    contains; ``contaminated`` = n_hits > 0. The eval n-gram table is
    broadcast — the training corpus is scanned once, never shuffled."""
    grams = eval_ngrams(eval_df, n=n, text_col=text_col)
    doc_grams = train_df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_ngram_array(text_col, n))).alias("g"),
    ).select(F.col(id_col), h60(F.col("g")).alias("gh"))
    hits = (
        doc_grams.join(F.broadcast(grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train_df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )

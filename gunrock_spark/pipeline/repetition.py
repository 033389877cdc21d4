"""Gopher-style per-document repetition metrics — the standard
pretraining quality-filter family (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Table A1; same practical formulas as the public
DataTrove / NeMo-Curator re-implementations).

Per document, over lowercased alnum tokens and raw ``\\n`` lines:

* ``dup_line_frac`` — fraction of line OCCURRENCES beyond the first
  occurrence of their content (``sum(cnt - 1) / sum(cnt)``).
* ``dup_line_char_frac`` — same, weighted by line length in chars.
* ``top_{n}gram_char_frac`` (n in ``top_ns``) — chars covered by ALL
  occurrences of the single most frequent token n-gram, over the
  document's total char count (``cnt_top * len(top_gram) / n_chars``).
  Tie-break: the lexicographically smallest gram among the maxima —
  deterministic under any partitioning.
* ``dup_{n}gram_char_frac`` (n in ``dup_ns``) — chars covered by every
  occurrence of every n-gram seen more than once, over total chars
  (``sum(cnt * len(g)) over cnt >= 2 / n_chars``; overlaps between
  occurrences are NOT deduplicated — the standard approximation).

Scale shape: ONE scan builds all n-gram orders in-array (a single
``flatten`` of per-order ``transform`` arrays, whole-stage codegen),
ONE explode, then ``groupBy(id, n, gram)`` -> ``groupBy(id, n)`` ->
conditional-aggregate ``groupBy(id)`` — three partial-aggregable
exchanges TOTAL regardless of how many n-gram orders are requested,
all keyed by doc id (bounded rows per key: a document's distinct
grams, never a corpus-wide hot key). The top-gram argmax is a
``min(struct(-cnt, gram))`` — partial-aggregable, NO per-document sort
window (the kcore h-index lesson: hub-sized sorts inside one task).
Line metrics ride the same shape on the line split. No Python
anywhere; every formula is integer-ratio so the doubles are
partition-order invariant and DuckDB-replayable.

Reference analog: none (the reference is a graph engine); this
extends the corpus-hygiene family of ``pipeline/decontamination.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import tokens
from gunrock_spark.pipeline.decontamination import split_lines

DEFAULT_TOP_NS = (2, 3, 4)
DEFAULT_DUP_NS = (5, 10)


def _gram_builder(toks, n: int):
    """Single-arg transform lambda (a two-arg lambda would be bound to
    transform's (element, index) form and shadow ``n`` with the array
    index)."""

    def build(i):
        return F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("g"),
        )

    return build


def _tagged_grams(text_col: str, ns: tuple[int, ...]):
    """array<struct<n:int, g:string>> of every requested n-gram order,
    built in ONE in-array pass (no per-order scan)."""
    toks = tokens(F.lower(F.col(text_col)))
    per_n = [
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                _gram_builder(toks, n),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))
        for n in ns
    ]
    return F.flatten(F.array(*per_n))


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = DEFAULT_TOP_NS,
    dup_ns: tuple[int, ...] = DEFAULT_DUP_NS,
    line_delimiter: str = "\n",
) -> DataFrame:
    """(id, n_chars, dup_line_frac, dup_line_char_frac,
    top_{n}gram_char_frac..., dup_{n}gram_char_frac...) per document.
    Documents with no lines / too few tokens score 0.0 (nothing
    repeated), so the filter never rejects empty docs by accident."""
    base = df.select(
        F.col(id_col), F.length(F.col(text_col)).cast("long").alias("n_chars")
    )

    # --- line repetition -------------------------------------------------
    lc = (
        split_lines(df, id_col=id_col, text_col=text_col, delimiter=line_delimiter)
        .groupBy(id_col, "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.length("line").cast("long"))
    )
    dup_cnt = F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(F.lit(0))
    lm = lc.groupBy(id_col).agg(
        (F.sum(dup_cnt) / F.sum(F.col("cnt"))).alias("dup_line_frac"),
        (
            F.sum(dup_cnt * F.col("len")) / F.sum(F.col("cnt") * F.col("len"))
        ).alias("dup_line_char_frac"),
    )

    # --- n-gram repetition: one explode for every order ------------------
    ns = tuple(sorted(set(top_ns) | set(dup_ns)))
    gc = (
        df.select(
            F.col(id_col),
            F.explode(_tagged_grams(text_col, ns)).alias("t"),
        )
        .select(id_col, F.col("t.n").alias("n"), F.col("t.g").alias("g"))
        .groupBy(id_col, "n", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_n = gc.groupBy(id_col, "n").agg(
        # argmax(cnt) with smallest-gram tie-break, partial-aggregable
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("g"))).alias("top"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("g")).otherwise(
                F.lit(0)
            )
        ).alias("dup_chars"),
    )
    top_cols = [
        F.max(
            F.when(
                F.col("n") == n,
                (-F.col("top.nc")) * F.length(F.col("top.g")),
            )
        ).alias(f"_top{n}")
        for n in top_ns
    ]
    dup_cols = [
        F.max(F.when(F.col("n") == n, F.col("dup_chars"))).alias(f"_dup{n}")
        for n in dup_ns
    ]
    gm = per_n.groupBy(id_col).agg(*top_cols, *dup_cols)

    z = F.lit(0.0)
    out_cols = [
        F.col(id_col),
        F.col("n_chars"),
        F.coalesce(F.col("dup_line_frac"), z).alias("dup_line_frac"),
        F.coalesce(F.col("dup_line_char_frac"), z).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        out_cols.append(
            F.coalesce(F.col(f"_top{n}") / F.col("n_chars"), z).alias(
                f"top_{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        out_cols.append(
            F.coalesce(F.col(f"_dup{n}") / F.col("n_chars"), z).alias(
                f"dup_{n}gram_char_frac"
            )
        )
    return (
        base.join(lm, id_col, "left").join(gm, id_col, "left").select(*out_cols)
    )


# the published Gopher thresholds (Rae et al. 2021 Table A1)
GOPHER_MAX = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Metrics plus a ``keep`` boolean applying the published Gopher
    repetition thresholds (a doc is dropped when ANY metric exceeds
    its bound). Thresholds override per metric name."""
    th = dict(GOPHER_MAX)
    if thresholds:
        th.update(thresholds)
    m = gopher_repetition(df, id_col=id_col, text_col=text_col)
    keep = F.lit(True)
    for name, bound in th.items():
        if name in m.columns:
            keep = keep & (F.col(name) <= F.lit(bound))
    return m.withColumn("keep", keep)

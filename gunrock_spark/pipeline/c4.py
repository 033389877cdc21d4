"""C4-style corpus cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning…", §2.2) — the line-level heuristics every
web-text curation pipeline applies before dedup/quality filtering:

  * keep a line only if it ends in terminal punctuation,
  * drop lines with fewer than ``min_words`` words,
  * drop lines containing a curly brace (leaked code/templates),
  * drop lines containing a blocked phrase ("javascript",
    "lorem ipsum", boilerplate policy strings),
  * then drop any document left with fewer than ``min_lines`` kept
    lines.

Scale shape: the whole pass is ONE narrow projection — ``split`` on
newline + a higher-order ``filter`` lambda + ``array_join`` — fully
whole-stage-codegen'd JVM work with zero shuffles and zero Python.
At 100 TB this is scan-bound: Parquet in, Parquet out, each task
independent. The only aggregate anyone adds downstream (kept-line
counts) is a partial-agg count.

Determinism: pure string predicates, no hashing, no rand — the same
document always cleans identically, so retries/speculative tasks are
safe and the DuckDB oracle replays the exact lambda with
``list_filter``.

Reference analog: none (the reference is a graph engine); this
extends the corpus-hygiene family of ``pipeline/decontamination.py``
(line dedup) and ``pipeline/repetition.py`` (Gopher filters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gunrock_spark.functions.hashing import TOKEN_RE

# C4's list is longer (and includes the "bad words" doc-level list);
# this default keeps the structurally distinct classes: script noise,
# placeholder text, and legal boilerplate.
DEFAULT_BLOCKLIST = (
    "javascript",
    "lorem ipsum",
    "privacy policy",
    "terms of use",
    "cookie policy",
)

TERMINAL_PUNCT_RE = r"""[.!?"']$"""


def _keep_line(
    line: Column,
    min_words: int,
    blocklist: tuple[str, ...],
    require_terminal_punct: bool,
) -> Column:
    low = F.lower(line)
    keep = F.size(F.regexp_extract_all(line, F.lit(TOKEN_RE), 0)) >= F.lit(
        min_words
    )
    keep = keep & ~low.contains("{") & ~low.contains("}")
    for phrase in blocklist:
        keep = keep & ~low.contains(phrase)
    if require_terminal_punct:
        keep = keep & (F.regexp_extract(line, TERMINAL_PUNCT_RE, 0) != F.lit(""))
    return keep


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 2,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """(id, text, n_lines_kept, n_lines_dropped) — ``text`` is the
    newline-joined surviving lines; documents with fewer than
    ``min_lines`` surviving lines are dropped entirely.

    One narrow projection + one filter: no shuffle, no Python.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: _keep_line(ln, min_words, blocklist, require_terminal_punct),
    )
    out = df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
    )
    return out.where(F.col("n_lines_kept") >= F.lit(min_lines))

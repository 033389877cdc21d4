"""Main-content extraction (boilerplate removal) — the html-to-text
pass every webtext corpus runs between the crawl and the quality
filters. Nav bars, footers, and link farms are short, link-dense
lines; article text is long, link-sparse lines (the line/block
text-density heuristic behind Readability/Arc90, jusText, and
trafilatura — public knowledge).

Rule, per newline-delimited html line ``l``::

    text  = trim(strip_tags(l))           # remove <...> runs
    links = count of '<a ' openings in l
    keep  iff len(text) >= min_text_len
         and len(text) >= chars_per_link * links

Kept lines concatenate (in document order) into ``main_text``.

Everything is ONE Catalyst projection over higher-order array
functions (split / transform / filter / aggregate) — no Python, no
shuffle, scan-bound at 100 TB, and every step is DuckDB-replayable
for the oracle gate. This is intentionally a heuristic, not an html
parser: at corpus scale the per-line density rule recovers the
article body without building a DOM, which is what the reference
pipelines above do too.

Reference analog: none (the reference ingests numeric edge lists,
gunrock/graphio/market.cuh); this serves the north rule's pages
table, upstream of pipeline/text.py quality scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MIN_TEXT_LEN = 30
CHARS_PER_LINK = 20


def extract_main_content(
    pages: DataFrame,
    html_col: str = "html",
    min_text_len: int = MIN_TEXT_LEN,
    chars_per_link: int = CHARS_PER_LINK,
) -> DataFrame:
    """Append ``main_text`` (kept lines joined by newline),
    ``n_lines``, ``n_content_lines`` and ``content_chars`` to each
    page row (all original columns retained, html stays put)."""
    stats = (
        f"transform(split({html_col}, '\\n'), l -> named_struct("
        "'t', trim(regexp_replace(l, '<[^>]*>', '')), "
        "'k', regexp_count(l, '<a ')))"
    )
    kept = (
        f"filter({stats}, s -> length(s.t) >= {int(min_text_len)} "
        f"AND length(s.t) >= {int(chars_per_link)} * s.k)"
    )
    return pages.select(
        "*",
        F.expr(f"array_join(transform({kept}, s -> s.t), '\\n')").alias(
            "main_text"
        ),
        F.expr(f"size(split({html_col}, '\\n'))").cast("long").alias("n_lines"),
        F.expr(f"size({kept})").cast("long").alias("n_content_lines"),
        F.expr(
            f"aggregate({kept}, 0L, (acc, s) -> acc + length(s.t))"
        ).alias("content_chars"),
    )

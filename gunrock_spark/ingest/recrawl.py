"""Crawl-snapshot operations over the pages table shape
``(url, warc_ts, html, text, lang)`` — the ingest passes a
Common-Crawl-style corpus runs BEFORE any graph or dedup work.

* **latest_snapshot** — collapse N crawls of the same url to the
  newest one ("latest-crawl-wins"). ONE map-side-combinable
  ``max_by(struct(cols), key)`` groupBy — no window, no sort; the
  billion-row recrawl history costs one candidate row per url per map
  task before the exchange. Ties on ``warc_ts`` (two fetches in the
  same second) break deterministically by text hash, so the result is
  stable under any partitioning.
* **crawl_delta** — classify urls between two snapshots:
  ``added | removed | changed | unchanged`` (changed = extracted text
  differs, compared via h60, so the 100 TB html/text columns never
  ride the shuffle — only (url, hash) pairs do).
* **crawl_stats** — per-url crawl history profile: crawl count,
  distinct-text count (content-change signal for crawl scheduling),
  first/last fetch timestamps. One groupBy.

Reference analog: none (the reference starts from an edge list); this
is the ingest layer the north rule's Iceberg pages table implies,
sitting in front of ``ingest/links.pages_to_edges``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import h60


def latest_snapshot(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Newest crawl per url (all original columns, one row per url).
    Deterministic under same-timestamp recrawls: ties break by the
    larger text hash."""
    others = [c for c in pages.columns if c != url_col]
    key = F.struct(F.col(ts_col), h60(F.col("text")))
    return (
        pages.groupBy(url_col)
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in others]), key).alias("_r")
        )
        .select(url_col, *[F.col(f"_r.{c}").alias(c) for c in others])
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, status) with status in added|removed|changed|unchanged,
    comparing one snapshot to the next by extracted text. Only
    (url, h60(text)) pairs are shuffled — never the text itself."""
    o = old.select(F.col(url_col).alias("url"), h60(F.col(text_col)).alias("oh"))
    n = new.select(F.col(url_col).alias("url"), h60(F.col(text_col)).alias("nh"))
    return o.join(n, "url", "full_outer").select(
        "url",
        F.when(F.col("oh").isNull(), F.lit("added"))
        .when(F.col("nh").isNull(), F.lit("removed"))
        .when(F.col("oh") == F.col("nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def change_rate(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(url, n_intervals, n_changes, change_lambda) — per-url Poisson
    change-rate estimate from the recrawl history, the quantity a
    crawl scheduler ranks the frontier by (recrawl fast-changing pages
    first). ``change_lambda`` is the Cho & Garcia-Molina (TOIT 2003)
    bias-corrected estimator over n uniform recrawl intervals with X
    observed changes::

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5))

    Changes are detected on ``h60(text)`` of time-adjacent snapshots
    (ties on the timestamp break by the hash), so only (url, ts, hash)
    rides the shuffle — never the 100 TB text column. One groupBy into
    a per-url sorted array (history length is bounded by crawl
    frequency, never by corpus size) and an in-array adjacent-pair
    fold; no window sort over the global history. Urls with a single
    crawl have no interval and are excluded. Rounded to 9 for
    replayability."""
    arr = pages.groupBy(F.col(url_col).alias("url")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), h60(F.col(text_col)).alias("h")))
        ).alias("a")
    )
    n_int = (F.size("a") - 1).cast("long")
    n_chg = F.expr(
        "aggregate(sequence(1, size(a) - 1), 0L,"
        " (acc, i) -> acc + IF(a[i].h <> a[i-1].h, 1L, 0L))"
    )
    return (
        arr.where(F.size("a") >= 2)
        .select(
            "url",
            n_int.alias("n_intervals"),
            n_chg.alias("n_changes"),
        )
        .select(
            "url",
            "n_intervals",
            "n_changes",
            F.round(
                -F.log(
                    (F.col("n_intervals") - F.col("n_changes") + 0.5)
                    / (F.col("n_intervals") + 0.5)
                ),
                9,
            ).alias("change_lambda"),
        )
    )


def crawl_stats(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(url, n_crawls, n_distinct_texts, first_ts, last_ts) — the
    per-url recrawl profile (change frequency drives crawl
    scheduling). Distinct texts counted on h60, one groupBy."""
    return pages.groupBy(url_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_crawls"),
        F.count_distinct(h60(F.col(text_col))).cast("long").alias(
            "n_distinct_texts"
        ),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )


def crawl_priority(
    pages: DataFrame,
    ranks: DataFrame,
    default_lambda: float = 0.5,
    k: int | None = None,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-frontier scheduling scores: (url, change_lambda, rank,
    priority) with ``priority = change_lambda * rank`` — the standard
    freshness x importance recrawl policy (Cho & Garcia-Molina 2003
    change rates weighted by page importance a la Edwards et al. /
    Olston & Najork's crawl-ordering survey, Ch. 4). Pages whose
    history is too short to estimate a rate (a single crawl) take
    ``default_lambda`` — the exploration prior that keeps new urls in
    the rotation.

    ``ranks`` is any (url, rank double) importance table — page or
    host PageRank from the link graph (algorithms/pagerank.py after
    ingest/hosts rollup). Inner join: urls without a rank are not in
    the scheduler's graph yet and are crawled by the discovery path,
    not this scorer.

    Plan: change_rate's one groupBy (hashes ride the shuffle, texts
    never do) + one |urls|-row join against the rank table; with
    ``k`` set, TakeOrdered top-k (no global sort). Priority is rounded
    to 9 so the score column replays bit-identically.
    """
    lam = change_rate(pages, url_col=url_col, ts_col=ts_col, text_col=text_col)
    urls = pages.select(F.col(url_col).alias("url")).distinct()
    scored = (
        urls.join(lam.select("url", "change_lambda"), "url", "left")
        .select(
            "url",
            F.coalesce("change_lambda", F.lit(float(default_lambda))).alias(
                "change_lambda"
            ),
        )
        .join(ranks.select("url", "rank"), "url")
        .select(
            "url",
            F.round("change_lambda", 9).alias("change_lambda"),
            "rank",
            F.round(F.col("change_lambda") * F.col("rank"), 9).alias(
                "priority"
            ),
        )
    )
    if k is not None:
        scored = scored.orderBy(F.desc("priority"), "url").limit(k)
    return scored

"""URL canonicalization — the normalization pass that precedes url
dictionary building and latest-crawl dedup (two crawls of
``HTTP://X.com/a?b=2&a=1#frag`` and ``http://x.com/a?a=1&b=2`` are the
same page; without canonicalization they become two graph vertices).

Rules (RFC 3986 normalization + the common crawl-pipeline extras):

1. trim whitespace; strip the ``#fragment``
2. lowercase the scheme and the host (never the path/query)
3. drop default ports (``:80`` for http, ``:443`` for https)
4. ensure a root path (``http://x.com`` -> ``http://x.com/``)
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``)
6. sort the remaining query parameters (order-insensitive identity)

Everything is a single Catalyst projection — regexp extracts plus an
in-array filter/sort for the query string; scan-bound at 100 TB, no
Python, no shuffle, DuckDB-replayable for the oracle gate. URLs
without a ``scheme://`` prefix pass through with only the trim (they
are not absolute web urls; guessing would corrupt them).

Reference analog: none — the reference ingests numeric edge lists
(gunrock/graphio/market.cuh); this serves the north rule's pages
table, feeding ``ingest/links.url_dictionary``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"
_ABS = "^[A-Za-z][A-Za-z0-9+.-]*://"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute url column (see module rules)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, "^[^:]+://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).otherwise(hostport)
    tail = F.regexp_extract(u, "^[^:]+://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    qcanon = F.concat_ws("&", F.array_sort(params))
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    return F.when(u.rlike(_ABS), rebuilt).otherwise(u)


def canonicalize(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    """Append the canonical url column."""
    return df.withColumn(out_col, canonicalize_url(url_col))


def resolve_redirects(
    redirects: DataFrame,
    url_col: str = "url",
    target_col: str = "target",
    max_doublings: int | None = None,
) -> DataFrame:
    """(url, final_url, is_cycle) — resolve every redirecting URL to
    the end of its 3xx chain by POINTER DOUBLING over the functional
    graph f(url) = target: each round replaces nxt(v) with
    nxt(nxt(v)) where defined, so after k rounds nxt = f^(2^k)(v) and
    a chain of length L resolves in ceil(log2 L) self-joins instead
    of L sequential ones — the same contraction as the CC
    pointer-jump (algorithms/components.py), applied to the crawl
    frontier's redirect map. A URL whose pointer still lands inside
    the redirect domain after 2^k >= |domain| steps can never leave
    it (any acyclic prefix is shorter than |domain|), so it is on or
    feeding a redirect CYCLE: flagged is_cycle with final_url ''.

    ``max_doublings`` defaults to ceil(log2 |redirects|) + 1 (one
    count action); extra rounds past convergence are stationary for
    every acyclic row and cycles report '' regardless, so any
    sufficient round count yields identical output — the DuckDB
    oracle unrolls a fixed 12.

    Scale shape: log2(chain-bound) rounds of a |redirects|-row
    self-join, each hash-partitioned on the join key, lineage cut per
    round; no per-row Python and nothing proportional to chain length.
    """
    import math

    f = redirects.select(
        F.col(url_col).cast("string").alias("url"),
        F.col(target_col).cast("string").alias("nxt"),
    )
    n_d = f.count()
    if max_doublings is None:
        max_doublings = max(1, int(math.ceil(math.log2(max(n_d, 2)))) + 1)
    state = f.localCheckpoint(eager=True)
    for _ in range(max_doublings):
        g = state.select(F.col("url").alias("g_url"), F.col("nxt").alias("g_nxt"))
        state = (
            state.join(g, state["nxt"] == g["g_url"], "left")
            .select("url", F.coalesce("g_nxt", "nxt").alias("nxt"))
            .localCheckpoint(eager=True)
        )
    dom = f.select(F.col("url").alias("d_url")).distinct()
    return (
        state.join(dom, state["nxt"] == dom["d_url"], "left")
        .select(
            "url",
            F.when(F.col("d_url").isNull(), F.col("nxt"))
            .otherwise(F.lit(""))
            .alias("final_url"),
            F.col("d_url").isNotNull().alias("is_cycle"),
        )
    )

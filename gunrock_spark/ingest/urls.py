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

"""Ingestion: Common-Crawl-style pages table -> link edge table.

The north-rule input is an Iceberg/Parquet table
``(url string, warc_ts timestamp, html binary, text string, lang
string)``; the engine derives ``edges(src long, dst long)`` from the
``<a href>`` links in ``html`` plus a ``url -> long id`` dictionary
(the Spark analog of the reference's .mtx reader + id space,
gunrock/graphio/market.cuh:192-461 — here ids come from a dictionary
table instead of being given).

Contracts:
- ``extract_text(html)`` is a PURE function of the html bytes; the
  north rule requires byte-identical extracted text per url, pinned by
  goldens in tests (FIXTURES.md §1: title, anchor texts, paragraph
  text, joined by newline).
- Extraction runs as Arrow-vectorized pandas UDFs (no per-row Python
  dispatch from the JVM; the regex loop is per-batch numpy/pandas).
- Vertex ids: row_number over sorted url (deterministic, dense). At
  10^12-page scale a sort-based dense id assignment is one global sort
  of the |V|-sized url dictionary — done ONCE and persisted next to
  the edge table (the analog of the reference's binary CSR cache).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_ANCHOR_RE = re.compile(rb'<a\s+href="([^"]*)"[^>]*>(.*?)</a>', re.S)
_PARA_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_TAG_RE = re.compile(rb"<[^>]+>")


def _extract_text_one(html: bytes) -> str:
    """Canonical text extraction (pure; byte-identical per url):
    title, each anchor's text, each paragraph's tag-stripped text,
    joined by '\\n'."""
    parts: list[bytes] = []
    m = _TITLE_RE.search(html)
    if m:
        parts.append(m.group(1))
    for _, anchor_text in _ANCHOR_RE.findall(html):
        parts.append(_TAG_RE.sub(b"", anchor_text))
    for para in _PARA_RE.findall(html):
        parts.append(_TAG_RE.sub(b"", para))
    return b"\n".join(parts).decode("utf-8", errors="replace")


def _extract_links_one(html: bytes) -> list[str]:
    return [u.decode("utf-8", errors="replace") for u, _ in _ANCHOR_RE.findall(html)]


# DataType objects (not DDL strings) so the UDFs can be defined at
# import time, before any SparkSession exists.
@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(lambda b: _extract_text_one(bytes(b)) if b is not None else None)


@pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    return html.map(lambda b: _extract_links_one(bytes(b)) if b is not None else None)


def url_dictionary(pages: DataFrame) -> DataFrame:
    """Deterministic url -> dense long id: row_number over sorted url
    (FIXTURES.md §2). Returns DataFrame[url, v]."""
    w = Window.orderBy("url")
    return pages.select("url").distinct().select(
        "url", (F.row_number().over(w) - 1).cast("long").alias("v")
    )


def pages_to_edges(
    pages: DataFrame, dictionary: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """pages -> (edges(src,dst), dictionary(url,v)).

    Only links whose target url exists in the dictionary (i.e. is a
    crawled page) become edges — the inner join below doubles as the
    out-of-corpus filter. Self-loop/dup cleaning is EdgeTable's job so
    the cleaning contract stays in one place.
    """
    if dictionary is None:
        dictionary = url_dictionary(pages)
    dictionary = dictionary.persist()
    links = pages.select(
        "url", F.explode(extract_links("html")).alias("target_url")
    )
    src_ids = dictionary.withColumnRenamed("v", "src")
    dst_ids = dictionary.select(
        F.col("url").alias("target_url"), F.col("v").alias("dst")
    )
    edges = (
        links.join(src_ids, "url")
        .join(dst_ids, "target_url")
        .select("src", "dst")
    )
    return edges, dictionary


def verify_extraction(pages: DataFrame) -> int:
    """Count rows whose stored ``text`` differs from ``extract_text(html)``
    — the north rule's byte-identical invariant; must be 0."""
    return pages.where(extract_text("html") != F.col("text")).count()


def _extract_anchors_one(html: bytes) -> list[tuple[str, str]]:
    return [
        (u.decode("utf-8", errors="replace"),
         _TAG_RE.sub(b"", t).decode("utf-8", errors="replace"))
        for u, t in _ANCHOR_RE.findall(html)
    ]


@pandas_udf(ArrayType(StructType([
    StructField("href", StringType()),
    StructField("anchor", StringType()),
])))
def extract_anchors(html: pd.Series) -> pd.Series:
    """array<struct<href, anchor>> — every <a href> with its
    tag-stripped anchor text (the same regex pass extract_text uses,
    so the two stay byte-consistent)."""
    return html.map(
        lambda b: _extract_anchors_one(bytes(b)) if b is not None else None
    )


def anchor_text_rollup(pages: DataFrame) -> DataFrame:
    """DataFrame[url, term, n_anchors]: per TARGET url, how often each
    token appears across all anchor texts pointing at it — the
    classic search-engine anchor-text signal (inbound anchors describe
    a page better than its own body).

    Scale shape: one Arrow-batched extraction pass over the (100 TB)
    html column, an explode to (target, term) pairs whose volume is
    the link count x anchor words (never |pages|^2), and ONE
    map-side-combined groupBy. Zipf-heavy terms ('click', 'here')
    partial-aggregate away per task before the shuffle."""
    from gunrock_spark.functions.hashing import tokens

    anchors = pages.select(
        F.explode(extract_anchors("html")).alias("a")
    ).select(F.col("a.href").alias("url"), F.col("a.anchor").alias("anchor"))
    return (
        anchors.select("url", F.explode(tokens(F.lower("anchor"))).alias("term"))
        .groupBy("url", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_anchors"))
    )

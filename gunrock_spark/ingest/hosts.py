"""Host-level link-graph rollup — the Common-Crawl aggregation layer.

Real web-graph analytics runs at two granularities: the page graph
(10^12 vertices) and the HOST graph (10^8 vertices — site?site links
aggregated over pages, the granularity of Common Crawl's published
host-level webgraph releases). The rollup is a pure Catalyst pass:
regexp host extraction + one groupBy, so at 100 TB it is scan-bound
and shuffles only the (src_host, dst_host) pair stream, which is
orders of magnitude smaller than the page-level edge table.

The host graph then feeds every primitive in this engine unchanged
(PageRank over hosts = the classic "host rank"); ``host_graph``
returns an EdgeTable plus the host<->id dictionary, mirroring
``pages_to_edges``'s url dictionary contract (ingest/links.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.ingest.links import extract_links, url_dictionary

# scheme://host[/...] — group 1 is the host (ports/userinfo kept
# verbatim: the rollup must be a deterministic pure function of the
# url bytes, not a normalizer)
HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def host_of(url: Column | str) -> Column:
    """Host component of a url column ('' when the url has no
    scheme://host prefix — relative links roll up to the empty host,
    which callers filter or keep deliberately)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, HOST_RE, 1)


def host_link_rollup(
    links: DataFrame,
    src_url: str = "url",
    dst_url: str = "target_url",
    keep_self: bool = False,
) -> DataFrame:
    """(src_host, dst_host, n_links) — page-level link pairs rolled up
    to host granularity. ``n_links`` counts page-level links (the edge
    weight of the host graph). Intra-host links are dropped unless
    ``keep_self`` (they dominate raw counts — nav bars — and carry no
    ranking signal). Empty hosts (schemeless urls) are dropped."""
    out = (
        links.select(
            host_of(src_url).alias("src_host"),
            host_of(dst_url).alias("dst_host"),
        )
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    )
    if not keep_self:
        out = out.where(F.col("src_host") != F.col("dst_host"))
    return out.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def page_links(pages: DataFrame, in_corpus_only: bool = True) -> DataFrame:
    """(url, target_url) pairs from a pages table — the link relation
    before any id mapping. With ``in_corpus_only`` targets are
    restricted to crawled urls (the same inner-join filter as
    ``pages_to_edges``); without it, links to uncrawled pages are
    kept — the right default for HOST rollups, where the target host
    is known even when the target page was never fetched."""
    links = pages.select(
        "url", F.explode(extract_links("html")).alias("target_url")
    )
    if in_corpus_only:
        corpus = pages.select(F.col("url").alias("target_url")).distinct()
        links = links.join(corpus, "target_url")
    return links


def host_dictionary(host_edges: DataFrame) -> DataFrame:
    """host -> dense long id (row_number over sorted host — the same
    deterministic contract as links.url_dictionary). DataFrame[host, v]."""
    hosts = (
        host_edges.select(F.col("src_host").alias("host"))
        .union(host_edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    w = Window.orderBy("host")
    return hosts.select(
        "host", (F.row_number().over(w) - 1).cast("long").alias("v")
    )


def host_graph(
    pages: DataFrame, in_corpus_only: bool = False
) -> tuple[EdgeTable, DataFrame, DataFrame]:
    """pages -> (host EdgeTable, host dictionary, weighted host edges).

    The EdgeTable carries ``n_links`` as the weight column, so both
    unweighted primitives (PageRank/CC treat each host pair as one
    edge) and weighted ones (SSSP) run on it directly.
    """
    rollup = host_link_rollup(page_links(pages, in_corpus_only=in_corpus_only))
    d = host_dictionary(rollup).persist()
    src_ids = d.select(F.col("host").alias("src_host"), F.col("v").alias("src"))
    dst_ids = d.select(F.col("host").alias("dst_host"), F.col("v").alias("dst"))
    edges = (
        rollup.join(src_ids, "src_host")
        .join(dst_ids, "dst_host")
        .select("src", "dst", F.col("n_links").cast("double").alias("weight"))
    )
    return EdgeTable.from_df(edges, weight="weight"), d, rollup


def host_template_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(host, n_pages, n_distinct_texts, template_rate) — per-host
    duplicated-content profile: template_rate = 1 - distinct/pages,
    the boilerplate/mirror-farm signal crawl quality filters rank
    hosts by (a host serving one template under 10^6 urls scores
    ~1.0; an article site scores ~0). Distinct texts are counted on
    h60 fingerprints so the 100 TB text column never rides the
    shuffle; one groupBy, map-side combinable. The rate is an exact
    integer ratio rounded to 9 for engine replay."""
    from gunrock_spark.functions.hashing import h60

    agg = pages.groupBy(host_of(F.col(url_col)).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.count_distinct(h60(F.col(text_col))).cast("long").alias(
            "n_distinct_texts"
        ),
    )
    return agg.select(
        "host",
        "n_pages",
        "n_distinct_texts",
        F.round(
            1.0 - F.col("n_distinct_texts") / F.col("n_pages"), 9
        ).alias("template_rate"),
    )

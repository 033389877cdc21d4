from gunrock_spark.ingest.hosts import (
    host_dictionary,
    host_graph,
    host_link_rollup,
    host_of,
    host_template_stats,
    page_links,
)
from gunrock_spark.ingest.recrawl import change_rate, crawl_delta, crawl_stats, latest_snapshot
from gunrock_spark.ingest.links import extract_text, extract_links, pages_to_edges, url_dictionary

__all__ = [
    "change_rate",
    "crawl_delta",
    "crawl_stats",
    "latest_snapshot",
    "extract_text",
    "extract_links",
    "pages_to_edges",
    "url_dictionary",
    "host_of",
    "host_template_stats",
    "host_link_rollup",
    "host_dictionary",
    "host_graph",
    "page_links",
]

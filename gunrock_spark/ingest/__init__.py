from gunrock_spark.ingest.links import extract_text, extract_links, pages_to_edges, url_dictionary

__all__ = ["extract_text", "extract_links", "pages_to_edges", "url_dictionary"]

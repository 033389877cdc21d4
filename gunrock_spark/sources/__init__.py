from gunrock_spark.sources.pages import PAGES_SCHEMA, read_pages, write_pages
from gunrock_spark.sources.tables import (
    EDGE_MOD,
    derived_edge_table,
    derived_edges_df,
    load_table,
    weighted_edges_df,
)

__all__ = [
    "EDGE_MOD",
    "derived_edge_table",
    "derived_edges_df",
    "load_table",
    "weighted_edges_df",
    "PAGES_SCHEMA",
    "read_pages",
    "write_pages",
]

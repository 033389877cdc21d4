from gunrock_spark.streaming.incremental import (
    current_edges,
    incremental_link_ingestion,
    merge_dictionary,
)

__all__ = ["incremental_link_ingestion", "merge_dictionary", "current_edges"]

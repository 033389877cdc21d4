from gunrock_spark.streaming.incremental import (
    current_edges,
    incremental_link_ingestion,
    merge_dictionary,
)
from gunrock_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)
from gunrock_spark.streaming.dedup_stream import (
    incremental_near_dups,
    read_pairs,
)
from gunrock_spark.streaming.windows import windowed_rollup

__all__ = [
    "incremental_link_ingestion",
    "merge_dictionary",
    "current_edges",
    "sessionize_batch",
    "sessionize_stream",
    "windowed_rollup",
    "incremental_near_dups",
    "read_pairs",
]

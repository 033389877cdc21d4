"""gunrock_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-creation of the query semantics of the Gunrock GPU
graph-analytics library (reference: /root/reference, sgpyc/gunrock) as
idiomatic PySpark: graphs are DataFrames of edges, iterative frontier
primitives are driver-side convergence loops over DataFrame joins +
aggregations, and all hot-path math stays JVM-side in Catalyst
expressions (Arrow-vectorized pandas UDFs only where DataFrame ops
cannot express the semantics).

Layers (SURVEY.md §7.0):
  graph/      EdgeTable + degree tables + generators   (Csr/Coo analog)
  engine/     iterate() convergence driver, checkpoint/resume, metrics
  algorithms/ pagerank, connected components, label propagation,
              triangle counting, bfs, sssp, hits/salsa, topk, bc
  ingest/     Common-Crawl-style pages -> link edge extraction
  pipeline/   training-data ops: dedup, similarity search, text
              analysis, multimodal plumbing
"""

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.engine.iterate import iterate, IterationResult
from gunrock_spark.engine.checkpoint import CheckpointManager
from gunrock_spark.algorithms import (
    bc_single_source,
    betweenness_centrality,
    bfs,
    component_sizes,
    connected_components,
    degree_topk,
    distances,
    hits,
    label_propagation,
    modularity,
    pagerank,
    ranked,
    salsa,
    sssp,
    subgraph_match,
    subgraph_match_count,
    triangle_count,
    triangle_count_df,
    triangle_count_per_vertex,
    who_to_follow,
)

__version__ = "0.2.0"

__all__ = [
    "EdgeTable",
    "iterate",
    "IterationResult",
    "CheckpointManager",
    "pagerank",
    "ranked",
    "connected_components",
    "component_sizes",
    "label_propagation",
    "triangle_count",
    "triangle_count_df",
    "triangle_count_per_vertex",
    "bfs",
    "sssp",
    "distances",
    "bc_single_source",
    "betweenness_centrality",
    "hits",
    "salsa",
    "who_to_follow",
    "degree_topk",
    "modularity",
    "subgraph_match",
    "subgraph_match_count",
]

"""Landmark (pivot) distance sketches — the classic web-graph
distance-oracle construction (Potamias et al. CIKM 2009, "Fast
shortest path distance estimation in large networks"): BFS from k
deterministic landmarks once, then answer any pair query with the
triangle-inequality upper bound

    d(u, w)  <=  min over landmarks l of  d(u, l) + d(l, w).

This is the operator behind "degrees of separation" analyses at web
scale, where per-query BFS is unaffordable but a k-row-per-vertex
sketch is one batched traversal.

Spark design: the k BFSes share ONE level-synchronous frontier loop —
the frontier state carries a ``landmark`` column, exactly the
source-batched machinery of ``algorithms/bc.py`` (one shuffle per
level for all landmarks; level count = max eccentricity over the
batch, not the sum). Distances are over the undirected (symmetrized,
cached) view, which is what makes the bound valid. The sketch is a
(k·|V|)-row DataFrame — distributed, never collected; pair estimation
is two landmark-keyed joins + one partial-agg min.

Reference analog: the reference ships single-source BFS only
(gunrock/app/bfs/); batching + the estimation join are the web-scale
extension, same relationship as bc.py's source batching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.algorithms.bc import _forward_batched, sample_sources
from gunrock_spark.graph.edge_table import EdgeTable


def landmark_distances(
    graph: EdgeTable,
    k: int = 4,
    salt: int = 0,
    landmarks: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[landmark, v, dist] — exact BFS distance from each of
    the k landmarks to every vertex it reaches, over the undirected
    view. Landmarks default to the k vertices with smallest
    h60(salt:v) (the deterministic sample of bc.sample_sources)."""
    sym = graph.symmetrized()
    if landmarks is None:
        landmarks = sample_sources(graph, k, salt=salt)
    state, _ = _forward_batched(sym, landmarks)
    return state.select(
        F.col("source").alias("landmark"),
        "v",
        F.col("depth").cast("int").alias("dist"),
    )


def estimate_distances(dists: DataFrame, pairs: DataFrame) -> DataFrame:
    """Upper-bound distance estimates for ``pairs`` (DataFrame[u, w])
    from a :func:`landmark_distances` sketch: DataFrame[u, w, est]
    with est = min_l d(u,l) + d(l,w). Pairs not covered by any shared
    landmark (different components) are absent from the result.

    Plan: two joins keyed by (landmark, vertex) against the sketch +
    one partial-agg min per pair — no BFS at query time."""
    du = dists.select(
        F.col("landmark"), F.col("v").alias("u"), F.col("dist").alias("d_u")
    )
    dw = dists.select(
        F.col("landmark"), F.col("v").alias("w"), F.col("dist").alias("d_w")
    )
    return (
        pairs.join(du, "u")
        .join(dw, ["landmark", "w"])
        .groupBy("u", "w")
        .agg(F.min(F.col("d_u") + F.col("d_w")).cast("int").alias("est"))
    )

"""Quotient-graph contraction — collapse a vertex labeling into the
weighted super-graph over the labels.

This is the coarsening step of every multi-level graph pipeline
(Louvain's level-2 graph, METIS's V-cycle, host-graph rollup
generalized to ANY labeling): given per-vertex labels (communities,
hosts, shards, CC components), the quotient graph has one vertex per
label and an edge (A, B) weighted by the number of original edges
whose endpoints map to (A, B). Self-loops (A, A) carry the
intra-cluster edge mass — the modularity diagonal — and are kept by
default.

The reference's partitioner family consumes exactly this structure to
place edges (gunrock/app/metisp/metis_partitioner.cuh — semantic spec
only); `ingest/hosts.py::host_link_rollup` is the special case where
the labeling is the url→host map.

Scale shape (100 TB link graph): two |E|-row equi-joins against the
|V|-row label table (broadcast when the labeling is small, shuffle
hash otherwise — Catalyst/AQE picks) + ONE map-side-combined groupBy
on (src_label, dst_label). No windows, no Python, no driver loop; a
10^7-degree hub contributes 10^7 rows to a partial aggregation, never
to a single task's sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def contract_by_labels(
    graph: EdgeTable,
    labels: DataFrame,
    *,
    drop_self_loops: bool = False,
    sum_weights: bool = False,
) -> DataFrame:
    """DataFrame[src, dst, weight]: the quotient graph of ``graph``
    under ``labels`` (columns v, label — every edge endpoint must be
    labeled; unlabeled endpoints drop the edge, matching an inner
    join's semantics). ``weight`` counts collapsed original edges, or
    SUMS their integer weights when ``sum_weights`` (requires a
    weighted EdgeTable — the Louvain-coarsening aggregation);
    (A, A) rows are the intra-cluster mass unless ``drop_self_loops``.
    """
    if sum_weights and not graph.weighted:
        raise ValueError("sum_weights requires a weighted EdgeTable")
    lab_s = labels.select(F.col("v").alias("_sv"), F.col("label").alias("src"))
    lab_d = labels.select(F.col("v").alias("_dv"), F.col("label").alias("dst"))
    e = graph.edges.select(
        F.col("src").alias("_es"),
        F.col("dst").alias("_ed"),
        *([F.col("weight").cast("long").alias("_w")] if sum_weights else []),
    )
    agg = (
        F.sum("_w").cast("long").alias("weight")
        if sum_weights
        else F.count(F.lit(1)).cast("long").alias("weight")
    )
    q = (
        e.join(lab_s, e["_es"] == lab_s["_sv"])
        .join(lab_d, e["_ed"] == lab_d["_dv"])
        .groupBy("src", "dst")
        .agg(agg)
    )
    if drop_self_loops:
        q = q.where(F.col("src") != F.col("dst"))
    return q

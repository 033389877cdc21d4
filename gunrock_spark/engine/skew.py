"""Skew hardening — explicit salting + degree-aware repartitioning.

The reference treats power-law degree skew as a first-class design
concern (TWC degree-tiered kernels, oprtr/edge_map_forward/cta.cuh:
383,499,602; LB merge-path, edge_map_partitioned/kernel.cuh; the
degree histogram diagnostic, csr.cuh:707-751). Spark's map-side
partial aggregation already absorbs most aggregation skew, but two
explicit tools remain necessary at 100 TB (north rule: "explicit
salting and degree-aware repartitioning"):

- ``salted_sum``: two-phase aggregation — partial sums keyed on
  (key, salt), final sum on key. Use when a single reducer key (a
  mega-popular url) would otherwise receive a partition-sized bucket
  in the FINAL aggregation (map-side combine can't help when one
  key's partials alone exceed a reducer).
- ``hot_keys``: pick the salting candidates from the degree table —
  the engine's version of reading the reference's degree histogram.
- ``repartition_by_degree``: split edges so hot-dst edge blocks
  spread over ``salt_factor`` partitions instead of hashing to one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    salt_factor: int = 16,
    salt_on: Column | None = None,
    out: str | None = None,
) -> DataFrame:
    """Two-phase sum of ``value`` by ``key``: partial by (key, salt),
    final by key. Semantically identical to
    ``df.groupBy(key).agg(sum(value))``; physically, the hot key's
    rows fan out over ``salt_factor`` reducers in phase 1 and only
    ``salt_factor`` partial rows meet in phase 2.

    ``salt_on``: expression the salt is derived from (default: a
    stable hash of the whole row's value column position via
    spark_partition_id — cheap, uniform within partitions).
    """
    out = out or f"sum_{value}"
    salt = (
        F.pmod(salt_on, F.lit(salt_factor))
        if salt_on is not None
        else F.pmod(F.spark_partition_id(), F.lit(salt_factor))
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def hot_keys(degrees: DataFrame, degree_col: str = "in_degree", threshold: int | None = None) -> DataFrame:
    """DataFrame[v] of vertices whose degree exceeds ``threshold``
    (default: 16x the mean — the knee the reference's log-scale
    histogram makes visible)."""
    if threshold is None:
        mean = degrees.agg(F.avg(degree_col)).collect()[0][0] or 0.0
        threshold = int(16 * mean) + 1
    return degrees.where(F.col(degree_col) >= threshold).select("v")


def detect_hot_vertices(
    degrees: DataFrame,
    degree_col: str = "out_degree",
    ratio: float = 64.0,
    max_hot: int = 64,
    n_edges: int | None = None,
    num_partitions: int | None = None,
    share_factor: float = 8.0,
) -> list[int]:
    """Driver-side list of the (few) hub vertex ids whose degree
    exceeds ``ratio`` x the mean — the auto-gate the iterative loops
    use to decide whether to split the per-iteration state ⋈ edges
    join into a cold (shuffle) tier and a hot (broadcast) tier. One
    top-k action over the cached |V|-row degree table, evaluated once
    per graph (the hot set is static), never per iteration. Returns
    [] when the graph is not skewed enough to bother — the common
    case, where the split would only add plan nodes.

    This is the engine's TWC analog: the reference tiers edge
    expansion by degree class (oprtr/edge_map_forward/cta.cuh:
    383,499,602); here the hot tier switches physical join strategy
    instead of kernel, which is the lever Spark actually has.

    When ``n_edges``/``num_partitions`` are given, the threshold is
    additionally floored at ``share_factor`` x the per-partition fair
    share |E|/P: a vertex only straggles a reducer when its adjacency
    alone exceeds what one task would process anyway, so an ordinary
    power-law head (many vertices at 100x the mean but far below a
    partition's share) correctly yields [] — splitting those only
    adds split/broadcast overhead (measured 2x wall at rmat19,
    BENCH.md §3c-r4).
    """
    row = degrees.agg(
        F.avg(degree_col).alias("mean"), F.max(degree_col).alias("mx")
    ).collect()[0]
    mean, mx = row["mean"] or 0.0, row["mx"] or 0
    threshold = ratio * mean
    if n_edges is not None and num_partitions:
        threshold = max(threshold, share_factor * n_edges / num_partitions)
    if mean <= 0 or mx < threshold:
        return []
    return [
        r["v"]
        for r in degrees.where(F.col(degree_col) >= threshold)
        .orderBy(F.col(degree_col).desc(), "v")
        .limit(max_hot)
        .collect()
    ]


def split_hot_edges(
    edges: DataFrame, hot_ids: list[int], key: str = "src"
) -> tuple[DataFrame, DataFrame]:
    """(hot_edges, cold_edges) split on ``key`` membership in the hot
    set. Deliberately NOT persisted: the parent edge table is already
    cached, so each side is a predicate over the cached scan (InSet
    hash lookup per row) — a second materialized copy of a 100 TB
    edge table would double storage for no win, and filters preserve
    the parent's hash-partitioning + within-partition order, so the
    cold side still sort-merge-joins without a shuffle."""
    hot = edges.where(F.col(key).isin(hot_ids))
    cold = edges.where(~F.col(key).isin(hot_ids))
    return hot, cold


def skewed_state_edge_join(
    state: DataFrame,
    hot_edges: DataFrame,
    cold_edges: DataFrame,
    hot_ids: list[int],
    state_key: str,
    edge_key: str,
) -> DataFrame:
    """state ⋈ edges on state_key == edge_key, hub-safe: cold keys go
    through the normal co-partitioned hash join; the hot keys' STATE
    rows (a handful — |hot_ids| rows) are broadcast against the hot
    edge tier, so a 10^7-out-degree hub's edges never hash to one
    reducer — they stay spread over their existing partitions and the
    join happens map-side. Semantically identical to the plain join
    (equality-tested in tests/test_engine.py)."""
    cold = state.where(~F.col(state_key).isin(hot_ids)).join(
        cold_edges, F.col(state_key) == cold_edges[edge_key]
    )
    hot = F.broadcast(state.where(F.col(state_key).isin(hot_ids))).join(
        hot_edges, F.col(state_key) == hot_edges[edge_key]
    )
    return cold.unionByName(hot)


def repartition_by_degree(
    edges: DataFrame,
    degrees: DataFrame,
    num_partitions: int,
    salt_factor: int = 16,
    hot_threshold: int | None = None,
) -> DataFrame:
    """Repartition edges by (dst, salt-for-hot-dsts): edges into a
    hot dst spread over ``salt_factor`` partitions; everything else
    hashes normally — the brp 'biased random' partitioner analog
    (app/brp/brp_partitioner.cuh:12)."""
    hot = hot_keys(degrees, "in_degree", hot_threshold).withColumn("_hot", F.lit(True))
    e = edges.join(hot.withColumnRenamed("v", "dst"), "dst", "left")
    salted = e.withColumn(
        "_shard",
        F.when(
            F.col("_hot").isNotNull(), F.pmod(F.hash("src"), F.lit(salt_factor))
        ).otherwise(F.lit(0)),
    )
    return salted.repartition(num_partitions, "dst", "_shard").drop("_hot", "_shard")

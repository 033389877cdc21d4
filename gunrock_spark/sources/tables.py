"""Parquet table sources + the deterministic derived link graph.

The sandbox testdata (`/root/testdata/sf*/`) carries TPC-H-ish tables
plus `documents`/`embeddings`. The graph engine's correctness harness
needs an edge table that BOTH Spark and the DuckDB oracle can derive
with bit-identical integer arithmetic from the same parquet — the
in-sandbox stand-in for the north-rule Common-Crawl edge table (the
pages→links ingestion path is exercised separately by
``gunrock_spark.ingest`` over synthesized pages, see tests/FIXTURES.md).

Derivation contract (keep in lockstep with the SQL in
``__spark_entry__.py``):

    src = o_orderkey % EDGE_MOD
    dst = (o_custkey * 31) % EDGE_MOD        -- spread custkeys
    drop self loops, dedup (src, dst)        -- EdgeTable cleaning pass

At sf=0.01 this yields a 997-vertex, ~14k-edge directed multigraph-
free graph — dense enough for triangles and fast CC convergence, small
enough for exact DuckDB oracles. The bench graph at sf=0.1 derives
from ``lineitem`` with a larger modulus for ~0.5M edges.

Edge weights (for SSSP) are a pure function of the endpoints so every
engine regenerates them identically:

    weight = double((src * 7 + dst * 13) % 19 + 1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gunrock_spark.graph.edge_table import EdgeTable

EDGE_MOD = 997  # correctness-scale modulus (prime)
BENCH_MOD = 100_003  # bench-scale modulus (prime)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_edges_df(spark: SparkSession, sf_dir: str, mod: int = EDGE_MOD) -> DataFrame:
    """Raw (uncleaned) derived edges from ``orders`` — the shared
    Spark/DuckDB contract above."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        (F.col("o_orderkey") % mod).cast("long").alias("src"),
        ((F.col("o_custkey") * 31) % mod).cast("long").alias("dst"),
    )


def bench_edges_df(spark: SparkSession, sf_dir: str, mod: int = BENCH_MOD) -> DataFrame:
    """Bigger bench-scale raw edges from ``lineitem``."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % mod).cast("long").alias("src"),
        ((F.col("l_partkey") * 31) % mod).cast("long").alias("dst"),
    )


def weighted_edges_df(spark: SparkSession, sf_dir: str, mod: int = EDGE_MOD) -> DataFrame:
    """Derived edges with the deterministic per-edge weight."""
    e = derived_edges_df(spark, sf_dir, mod)
    return e.withColumn(
        "weight", ((F.col("src") * 7 + F.col("dst") * 13) % 19 + 1).cast("double")
    )


def derived_edge_table(
    spark: SparkSession,
    sf_dir: str,
    mod: int | None = None,
    *,
    weighted: bool = False,
    source: str = "orders",
) -> EdgeTable:
    """Cleaned EdgeTable over the derived graph (self-loops dropped,
    deduped — the reference COO→CSR contract, gunrock/csr.cuh:588)."""
    if mod is None:
        mod = EDGE_MOD if source == "orders" else BENCH_MOD
    if source == "orders":
        raw = weighted_edges_df(spark, sf_dir, mod) if weighted else derived_edges_df(spark, sf_dir, mod)
    elif source == "lineitem":
        raw = bench_edges_df(spark, sf_dir, mod)
    else:
        raise ValueError(f"unknown source {source!r}")
    return EdgeTable.from_df(raw, weight="weight" if weighted else None)

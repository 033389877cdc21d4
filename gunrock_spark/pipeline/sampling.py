"""Deterministic dataset sampling — the subsetting ops a training-data
pipeline runs before anything else at 100 TB.

Both samplers key off a pure-arithmetic hash of a stable id column
(same contract as algorithms/walks.py: h = ((key % P) * 1000003 +
seed) % P, P = 900_000_007, 64-bit safe), NOT Spark's rand() or
sample(): the selection is then (a) reproducible bit-for-bit across
runs, engines and cluster sizes, (b) stable under repartitioning
(rand() re-draws per task attempt; a retried task would sample a
different subset), and (c) oracle-able in ANSI SQL.

Scale notes: `hash_sample` is a pure Catalyst projection+filter — no
shuffle at all, pushed to the scan. `stratified_sample` shuffles by
stratum once for the per-stratum top-k window; a stratum holding most
of the corpus serializes through one task — for that regime pass the
stratum pre-split (salt the stratum column) or raise `k` and
subsample again; the common label/language strata are fine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

HASH_P = 900_000_007
HASH_A = 1_000_003


def sample_hash(key: Column | str, seed: int = 42) -> Column:
    """The shared deterministic sampling hash, as a Column."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(k, F.lit(HASH_P)) * HASH_A + F.lit(seed), F.lit(HASH_P))


def hash_sample(
    df: DataFrame, key: str, num: int, den: int, seed: int = 42
) -> DataFrame:
    """Keep the deterministic ~num/den fraction of rows: rows where
    hash(key) % den < num. Same row set on every run and any engine."""
    if not (0 <= num <= den) or den <= 0:
        raise ValueError("need 0 <= num <= den, den > 0")
    return df.where(F.pmod(sample_hash(key, seed), F.lit(den)) < num)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, k: int, seed: int = 42
) -> DataFrame:
    """Deterministic k rows per stratum: the k smallest sampling
    hashes within each stratum (key asc tie-break). The hash order is
    a fixed random permutation of each stratum, so this is an exact
    per-stratum uniform sample that never needs a second pass or a
    count — the distributed analog of per-key reservoir sampling."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(stratum).orderBy(sample_hash(key, seed), F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )

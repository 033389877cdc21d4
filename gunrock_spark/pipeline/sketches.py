"""Bounded-memory frequency sketches — Count-Min over the token
stream (Cormode & Muthukrishnan 2005).

At 100 TB the exact vocabulary (`text.term_counts`) is itself a big
shuffle; a Count-Min Sketch bounds the state to depth x width
counters REGARDLESS of vocabulary size, at the cost of one-sided
overestimation (est >= true; error <= 2N/width with prob
1 - 2^-depth). The sketch here is fully deterministic — hash rows are
affine functions of the engine's h60 (functions/hashing.py), with
coefficients derived from a seed string — so the ENTIRE sketch table
is bit-reproducible and oracle-checkable in SQL, unlike library
sketches with opaque seeds (e.g. Spark's own stat.countMinSketch).

Physical plan: one explode + one groupBy for the build (the depth
rows per token are generated inside the projection — no extra
shuffle, map-side combine absorbs the Zipf head exactly as in
term_counts); lookups are a broadcast-sized join against the sketch.

Merge at scale: sketches of two corpus shards merge by adding
counters (groupBy(row, col).sum) — the property that makes CMS the
standard distributed heavy-hitter tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import h60, h60_py, tokens

# modulus for the affine hash family: prime, small enough that
# a * (h60 % P) + b stays far below 2^63 (a, b < P ~ 1e9, h%P < 1e9
# -> product < 1e18)
CMS_P = 1_000_000_007


def _coeffs(depth: int, seed: str) -> list[tuple[int, int]]:
    """Deterministic per-row affine coefficients (a != 0)."""
    out = []
    for i in range(depth):
        a = h60_py(f"{seed}:a:{i}") % (CMS_P - 1) + 1
        b = h60_py(f"{seed}:b:{i}") % CMS_P
        out.append((a, b))
    return out


def _col_expr(term_col, a: int, b: int, width: int):
    hm = h60(term_col) % F.lit(CMS_P)
    return ((F.lit(a) * hm + F.lit(b)) % F.lit(CMS_P)) % F.lit(width)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """(row int, col long, cnt long) — the CMS counter table over the
    corpus token stream. depth x width rows at most, whatever the
    corpus size; counters for absent (row, col) cells are implicitly
    zero (lookups coalesce)."""
    toks = tokens(F.lower(F.col(text_col)))
    exploded = df.select(F.explode(toks).alias("term"))
    cells = exploded.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _col_expr(F.col("term"), a, b, width).alias("col"),
                    )
                    for i, (a, b) in enumerate(_coeffs(depth, seed))
                ]
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.row", "cell.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """(term, est) — point estimates: min over the depth counters a
    term hashes to. est >= true count always; equality whenever no
    collision on at least one row. The probe side is one narrow
    (term, row, col) table joined against the sketch — broadcast the
    sketch side in production (depth x width rows)."""
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _col_expr(F.col(term_col), a, b, width).alias("col"),
                    )
                    for i, (a, b) in enumerate(_coeffs(depth, seed))
                ]
            )
        ).alias("cell"),
    ).select("term", "cell.row", "cell.col")
    return (
        probes.join(cms, ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches built with identical (depth, width, seed):
    counters add."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))

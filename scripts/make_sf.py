"""Deterministic bench-profile table generator for scale factors the
driver does not ship (`/root/testdata` stops at sf0.1, read-only).

Generates the three tables `bench.py` reads — `lineitem` (graph
source), `documents`, `embeddings` — into an `sf{N}`-named directory,
matching the driver testdata's schema and statistical shape scaled by
SF (lineitem rows = SF * 6M, key ranges scale with rows so the
derived graph keeps its shape under the BENCH_MOD projection;
documents = SF * 50k with ~0.5%% injected near-dup pairs so the
minhash query stays non-trivial; embeddings = 10-cluster mixture like
the driver's, count following the observed sf0.01->sf0.1 x4 rule).

Everything is seeded: same (sf, seed) -> byte-identical tables.
The lineitem table is generated DISTRIBUTED (spark.range +
xxhash64-derived columns, no driver materialization) — the same path
that would produce a 100 TB input on a real cluster; documents and
embeddings are small enough (<= a few hundred k rows at any sane
bench SF) that a seeded driver-side numpy build is simpler and still
deterministic.

Usage: python scripts/make_sf.py --sf 1 [--out /tmp/sf1] [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window join shuffle stage task "
    "cache spill merge scan plan code row page block read write skew"
).split()


def gen_lineitem(spark: SparkSession, out: str, sf: float, seed: int) -> int:
    """SF * 6M rows, distributed; only the columns the bench contract
    reads (l_orderkey, l_partkey) carry the graph structure — the rest
    follow the driver schema so `load_table` consumers see the same
    shape."""
    n = int(sf * 6_000_000)
    n_orders = max(1, int(sf * 1_500_000))
    n_parts = max(1, int(sf * 200_000))
    df = (
        spark.range(n)
        .withColumn("h1", F.xxhash64(F.col("id"), F.lit(seed)))
        .withColumn("h2", F.xxhash64(F.col("id"), F.lit(seed + 1)))
        .select(
            (F.pmod("h1", F.lit(n_orders))).cast("long").alias("l_orderkey"),
            (F.pmod("h2", F.lit(n_parts))).cast("long").alias("l_partkey"),
            (F.pmod("h1", F.lit(int(sf * 20_000) or 1))).cast("long").alias("l_suppkey"),
            (F.pmod("h2", F.lit(7)) + 1).cast("int").alias("l_linenumber"),
            (F.pmod("h1", F.lit(50)) + 1).cast("double").alias("l_quantity"),
            (F.pmod("h2", F.lit(90_000)) + 1000).cast("double").alias("l_extendedprice"),
            (F.pmod("h1", F.lit(11)) / 100).cast("double").alias("l_discount"),
            (F.pmod("h2", F.lit(9)) / 100).cast("double").alias("l_tax"),
            F.when(F.pmod("h1", F.lit(3)) == 0, "R")
            .when(F.pmod("h1", F.lit(3)) == 1, "A")
            .otherwise("N")
            .alias("l_returnflag"),
            F.when(F.pmod("h2", F.lit(2)) == 0, "O").otherwise("F").alias("l_linestatus"),
            F.timestamp_seconds(
                F.lit(694224000) + F.pmod("h1", F.lit(7 * 365)) * 86400
            ).alias("l_shipdate"),
        )
    )
    df.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    return n


def gen_documents(spark: SparkSession, out: str, sf: float, seed: int) -> int:
    n = int(sf * 50_000)
    rng = np.random.default_rng(seed + 17)
    langs = np.array(["en", "de", "fr", "es", "nl"])
    sources = np.array([f"crawl-{i:02d}" for i in range(20)])
    texts: list[str] = []
    for _ in range(n):
        k = int(rng.integers(8, 90))
        texts.append(" ".join(rng.choice(VOCAB, size=k)))
    # near-dup injection: ~0.5% of docs are a perturbed copy of an
    # earlier doc (one word appended) plus a handful of exact dups —
    # mirrors the driver data where minhash finds a small pair set.
    n_near = max(1, n // 200)
    victims = rng.integers(0, n, size=n_near)
    for i, v in enumerate(victims):
        tgt = int(rng.integers(0, n))
        if tgt == int(v):
            continue
        texts[tgt] = texts[int(v)] + (" " + str(rng.choice(VOCAB)) if i % 3 else "")
    rows = [
        (i, t, str(langs[i % len(langs)]), str(sources[i % len(sources)]), len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(max(1, n // 25_000)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return n


def gen_embeddings(spark: SparkSession, out: str, sf: float, seed: int) -> int:
    # driver data: 500 @ sf0.01 -> 2000 @ sf0.1 (x4 per decade)
    n = int(2000 * (4 ** np.log10(sf / 0.1))) if sf != 0.1 else 2000
    n = max(100, n)
    rng = np.random.default_rng(seed + 29)
    centers = rng.normal(0, 1.0, size=(10, 64))
    labels = rng.integers(0, 10, size=n)
    vecs = centers[labels] + rng.normal(0, 0.35, size=(n, 64))
    rows = [
        (i, [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(max(1, n // 50_000)).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default=None, help="default /tmp/sf{sf}")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()
    sf_name = f"{args.sf:g}"
    out = args.out or f"/tmp/sf{sf_name}"
    os.makedirs(out, exist_ok=True)

    from gunrock_spark.session import build_session

    spark = build_session("make-sf", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    nl = gen_lineitem(spark, out, args.sf, args.seed)
    nd = gen_documents(spark, out, args.sf, args.seed)
    ne = gen_embeddings(spark, out, args.sf, args.seed)
    print(f"wrote {out}: lineitem={nl} documents={nd} embeddings={ne}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""A/B: community-aware edge placement vs random (hash) placement,
measured on REAL shuffle-write bytes of the advance+reduce iteration.

The reference's partitioner family (random.cuh, brp_partitioner.cuh,
cp_partitioner.cuh, metis_partitioner.cuh) exists to shrink the
multi-GPU exchange; the Spark analog of that exchange is the shuffle
write of ``edges ⋈ ranks on src -> groupBy(dst).sum``. This script
builds a planted-partition graph (ground-truth communities), places
its edges two ways, runs the same PR-style iteration on both, and
reads the per-stage shuffleWriteBytes off the Spark REST API —
alternating reps so host drift cancels.

Usage: python scripts/partition_ab.py [--n 200000] [--communities 64]
           [--deg-in 14] [--deg-out 2] [--iters 3] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import planted_partition_edges_df
from gunrock_spark.graph.partition import (
    edge_cut,
    hash_layout,
    partition_layout,
    place_edges,
)
from gunrock_spark.session import build_session


def total_shuffle_write_bytes(spark) -> int:
    """Sum shuffleWriteBytes over all completed stages (REST API)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def scatter_probe(edges, iters: int) -> float:
    """The advance+reduce scatter under measurement: per-edge
    contribution -> map-side partial agg -> exchange -> final agg.
    This is the stage whose exchange a community placement shrinks
    (partial agg emits one row per distinct (map partition, dst); a
    partition holding whole communities has few distinct dsts). The
    vertex-STATE join is deliberately excluded: Catalyst realises that
    join exchange-free only under hash(src) co-partitioning, so the
    engine's iterative loops keep hash placement for state and use
    community placement for edge-resident aggregations (host rollups,
    degree/TC candidate scatter) — see partition.py's module doc."""
    t0 = time.time()
    for _ in range(iters):
        contribs = edges.groupBy("dst").agg(F.sum("w").alias("r"))
        contribs.count()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--communities", type=int, default=64)
    ap.add_argument("--deg-in", type=int, default=14)
    ap.add_argument("--deg-out", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--lp-iters", type=int, default=5)
    args = ap.parse_args()

    spark = build_session(
        "partition_ab", extra_conf={"spark.ui.enabled": "true"}, adaptive=False
    )
    p = args.partitions or spark.sparkContext.defaultParallelism

    raw = planted_partition_edges_df(
        spark, args.n, args.communities, args.deg_in, args.deg_out
    )
    graph = EdgeTable.from_df(raw, num_partitions=p)
    m = graph.num_edges()

    # layouts: ground-truth-free community detection vs random
    t0 = time.time()
    comm_layout = partition_layout(graph, p, lp_iters=args.lp_iters).persist()
    comm_layout.count()
    layout_sec = time.time() - t0
    rand_layout = hash_layout(graph, p).persist()
    rand_layout.count()

    cut_comm = edge_cut(graph, comm_layout).collect()[0]
    cut_rand = edge_cut(graph, rand_layout).collect()[0]

    placed = place_edges(graph, comm_layout, p)
    placed.num_edges()  # materialize the placement before measuring

    # identical edge-resident contribution column on both variants
    w = (F.pmod(F.xxhash64("src", "dst"), F.lit(97)) + 1).cast("double")
    hash_e = graph.edges.withColumn("w", w)
    comm_e = placed.edges.withColumn("w", w)

    variants = {"hash_placed": hash_e, "community_placed": comm_e}
    bytes_out: dict[str, list[int]] = {k: [] for k in variants}
    wall: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, edges in variants.items():
            before = total_shuffle_write_bytes(spark)
            sec = scatter_probe(edges, args.iters)
            after = total_shuffle_write_bytes(spark)
            bytes_out[name].append(after - before)
            wall[name].append(round(sec, 3))

    med = {k: int(statistics.median(v)) for k, v in bytes_out.items()}
    out = {
        "metric": "partition_shuffle_write_bytes",
        "unit": "bytes_per_probe",
        "n": args.n,
        "edges": m,
        "communities": args.communities,
        "partitions": p,
        "iters": args.iters,
        "reps": args.reps,
        "shuffle_write_bytes": med,
        "reduction": round(1 - med["community_placed"] / max(med["hash_placed"], 1), 4),
        "wall_sec": wall,
        "edge_cut_frac": {
            "community": round(cut_comm["cut_frac"], 4),
            "hash": round(cut_rand["cut_frac"], 4),
        },
        "layout_build_sec": round(layout_sec, 2),
        "all_bytes": bytes_out,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

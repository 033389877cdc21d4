"""A/B bench: direction-optimized BFS (push/pull switch) vs pure push
on a big seeded R-MAT graph — the reference's DOBFS win reproduced as
a Spark plan choice (bfs_enactor.cuh:852-933 analog).

On a power-law graph 2-3 middle levels hold most of |V|; pure push
shuffles ~all out-edges of those huge frontiers, while pull scans the
small unvisited set's in-edges. This script measures both on the SAME
input in ONE process (A/B ordering interleaved would drift; the graph
and reverse-edge caches are warmed per-mode before timing).

Usage:
  python scripts/bfs_direction.py --input /tmp/.../edges.parquet [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="edges parquet")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--source", type=int, default=0)
    args = ap.parse_args()
    os.environ.setdefault("SPARK_DRIVER_MEM", f"{min(96, max(32, 4 * args.cpus))}g")  # cap: 128 GiB host

    from gunrock_spark.algorithms.bfs import bfs
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.session import build_session

    spark = build_session(
        "bfs-direction",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        adaptive=False,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    g = EdgeTable.from_df(spark.read.parquet(args.input), num_partitions=args.cpus)
    m, n = g.num_edges(), g.num_vertices()
    g.degrees.count()

    results = {}
    for mode, kw in (
        ("push_only", {"direction_optimized": False}),
        ("direction_optimized", {}),
    ):
        bfs(g, source=args.source, **kw)  # warmup (also builds rev cache)
        t0 = time.monotonic()
        res = bfs(g, source=args.source, **kw)
        dt = time.monotonic() - t0
        reached = res.state.count()
        regimes = [mt["regime"] for mt in res.metrics]
        frontier = [mt["frontier"] for mt in res.metrics]
        results[mode] = {
            "sec": round(dt, 3),
            "levels": res.iterations,
            "reached": reached,
            "regimes": regimes,
            "teps": round(m / dt),
        }
        print(
            f"# {mode}: {dt:.2f}s, {res.iterations} levels, reached {reached}, "
            f"frontiers {frontier}",
            file=sys.stderr,
        )
    speedup = results["push_only"]["sec"] / results["direction_optimized"]["sec"]
    print(
        json.dumps(
            {
                "metric": "bfs_direction_optimization_speedup",
                "value": round(speedup, 3),
                "unit": "x",
                "edges": m,
                "vertices": n,
                "cpus": args.cpus,
                **{k: v for k, v in results.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Two-cluster-size scaling study (north rule: >=0.8 throughput
scaling efficiency from N to 4N executors).

No real cluster exists in the sandbox, so per the evidence rule the
SAME job runs at two parallelism levels — local[N] and local[4N]
(cores-as-executors proxy) — on the SAME input, and we report TEPS at
both plus efficiency = (TEPS_4N / TEPS_N) / 4.

The input is a seeded R-MAT graph (reference generator defaults
a=.55 b=.2 c=.2 d=.05, gunrock/graphio/rmat.cuh:180-184) big enough
that shuffle/compute dominates fixed per-job scheduling overhead —
the regime a 1000-executor cluster actually runs in. Each measurement
is a fresh spark-submit-style subprocess (fresh JVM) so the two runs
share nothing.

Usage: python scripts/scaling.py [--scale 20] [--n 8] [--iters 5]
Writes BENCH.md-ready JSON to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from gunrock_spark.session import build_session
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.algorithms.components import connected_components

cpus = int(sys.argv[1]); path = sys.argv[2]; iters = int(sys.argv[3])
algo = sys.argv[4] if len(sys.argv) > 4 else "pagerank"
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
# Heap sized like a real cluster: each executor brings its own memory,
# so total memory scales with core count (4 GiB/core, floor 32g —
# conservative for the efficiency ratio: the N side gets MORE memory
# per core than the 4N side). Override via SPARK_DRIVER_MEM.
os.environ.setdefault("SPARK_DRIVER_MEM", f"{{min(96, max(32, 4 * cpus))}}g")  # cap: 128 GiB host
# the cluster-scale plan: shuffle joins co-partitioned on the key (a
# 10^12-vertex state table cannot be broadcast), shuffle partitions =
# cores, AQE off (per-stage re-planning latency dominates these small
# iterative stages — session.py note)
spark = build_session(
    "scaling",
    master=f"local[{{cpus}}]",
    shuffle_partitions=cpus,
    adaptive=False,
    extra_conf={{
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # JDK NIO race mitigation: at very low core counts the CC
        # runs spill heavily and the spill-read ReadAheadInputStream
        # reproducibly dies in sun.nio.ch.NativeThreadSet.remove
        # (ArrayIndexOutOfBoundsException: -1) on this JDK; the
        # read-ahead is an I/O optimization only — disabling it does
        # not change plans or results, and the measured regime is
        # compute-dominant
        "spark.unsafe.sorter.spill.read.ahead.enabled": "false",
    }},
)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet(path)
g = EdgeTable.from_df(edges, num_partitions=cpus)
m = g.num_edges(); g.degrees.count()   # warm cache outside the timer
warm = None
if algo == "pagerank_warm":
    # the continuous-crawl path: yesterday's converged (v, rank) table
    # seeds today's run; built untimed — the measured job is the
    # warm-started power iteration incl. the extra init join
    warm = (
        pagerank(g, threshold=0.0, max_iter=2)
        .state.select("v", "rank")
        .localCheckpoint(eager=True)
    )
def run(k):
    if algo == "cc":
        # CC touches 2|E| symmetrized edges per iteration
        return connected_components(g, max_iter=k)
    if algo == "pagerank_warm":
        return pagerank(g, threshold=0.0, max_iter=k, init_ranks=warm)
    return pagerank(g, threshold=0.0, max_iter=k)

edge_mult = 2 if algo == "cc" else 1
run(1)                                  # JIT/codegen warmup, untimed
best = None
iters_done = iters
for _ in range(2):                      # best-of-2: squeeze out GC noise
    t0 = time.monotonic()
    res = run(iters)
    res.state.select("v").limit(1).collect()
    dt = time.monotonic() - t0
    if best is None or dt < best:
        best = dt
        # CC can converge before max_iter on small-diameter graphs;
        # TEPS must count iterations that actually ran
        iters_done = res.iterations
print(json.dumps({{"cpus": cpus, "edges": m, "iters": iters_done,
                   "sec": round(best, 3),
                   "teps": round(edge_mult * m * iters_done / best)}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=23)
    ap.add_argument("--edge-factor", type=int, default=16)
    ap.add_argument("--n", type=int, default=4, help="small size N (big = 4N)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--input", default=None, help="reuse an existing edges.parquet")
    ap.add_argument("--algorithm", default="pagerank", choices=["pagerank", "cc", "pagerank_warm"])
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-runner wall-clock cap, seconds")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    tmp = tempfile.mkdtemp(prefix="scaling_rmat_")

    if args.input:
        path = args.input
    elif args.scale >= 24:
        # Big inputs: generate distributed (32-way mapInPandas) — the
        # driver-side numpy path is single-threaded and this sandbox's
        # rng throughput makes scale>=24 take hours there. Deterministic
        # given (seed, partition count).
        path = os.path.join(tmp, "edges.parquet")
        from gunrock_spark.graph.generators import rmat_edges_df_distributed
        from gunrock_spark.session import build_session

        spark = build_session(
            "rmat-gen", master="local[32]", shuffle_partitions=32
        )
        spark.sparkContext.setLogLevel("ERROR")
        rmat_edges_df_distributed(
            spark, args.scale, args.edge_factor, seed=42, num_partitions=32
        ).write.parquet(path)
        spark.stop()
        print(f"# distributed R-MAT scale={args.scale} -> {path}", file=sys.stderr)
    else:
        # generate the shared input once (deterministic, seeded)
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gunrock_spark.graph.generators import rmat_edges

        arr = rmat_edges(args.scale, args.edge_factor, seed=42)
        path = os.path.join(tmp, "edges.parquet")
        pq.write_table(
            pa.table({"src": arr[:, 0], "dst": arr[:, 1]}), path, row_group_size=1 << 20
        )
        print(
            f"# R-MAT scale={args.scale} ef={args.edge_factor}: {len(arr):,} raw edges -> {path}",
            file=sys.stderr,
        )

    runner = RUNNER.format(repo=repo)
    script = os.path.join(tmp, "runner.py")
    with open(script, "w") as f:
        f.write(runner)

    results = {}
    for cpus in (args.n, 4 * args.n):
        out = subprocess.run(
            [sys.executable, script, str(cpus), path, str(args.iters), args.algorithm],
            capture_output=True,
            text=True,
            timeout=args.timeout,
        )
        json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not json_lines:
            print(
                f"# runner local[{cpus}] failed (rc={out.returncode}); last stderr:",
                file=sys.stderr,
            )
            for l in out.stderr.splitlines()[-30:]:
                print(f"#   {l}", file=sys.stderr)
            sys.exit(1)
        line = json_lines[-1]
        results[cpus] = json.loads(line)
        print(f"# local[{cpus}]: {line}", file=sys.stderr)

    small, big = results[args.n], results[4 * args.n]
    eff = (big["teps"] / small["teps"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_N_to_4N",
                "value": round(eff, 3),
                "unit": "ratio",
                "n_cpus": args.n,
                "teps_n": small["teps"],
                "teps_4n": big["teps"],
                "sec_n": small["sec"],
                "sec_4n": big["sec"],
                "edges": small["edges"],
                "iterations": args.iters,
                "rmat_scale": args.scale,
                "algorithm": args.algorithm,
            }
        )
    )


if __name__ == "__main__":
    main()

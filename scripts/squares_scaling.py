"""Two-parallelism scaling study for the 4-cycle (squares) kernel —
the same N -> 4N evidence protocol as scripts/scaling.py, with
wedges/sec as the throughput unit (the wedge-pair statistic IS the
work; see algorithms/motifs.py).

Each measurement is a fresh subprocess (fresh JVM, nothing shared);
the input parquet is generated once. Writes BENCH.md-ready JSON.

Usage: python scripts/squares_scaling.py [--scale 16] [--n 4]
       [--cap 512]
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
cpus = int(sys.argv[1]); path = sys.argv[2]; cap = int(sys.argv[3])
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
os.environ.setdefault("SPARK_DRIVER_MEM", f"{{min(96, max(32, 4 * cpus))}}g")
from gunrock_spark.session import build_session
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.algorithms.motifs import square_count
from pyspark.sql import functions as F
spark = build_session(
    "squares-scaling",
    master=f"local[{{cpus}}]",
    shuffle_partitions=cpus,
    adaptive=False,
    extra_conf={{"spark.sql.autoBroadcastJoinThreshold": "-1"}},
)
spark.sparkContext.setLogLevel("ERROR")
g = EdgeTable.from_df(spark.read.parquet(path), num_partitions=cpus)
sym = g.symmetrized()
sym.edges.count()                      # warm the cached layout, untimed
# wedge volume (the work unit) from the cached degree table, untimed
wedges = int(
    sym.degrees.select(
        F.sum(F.expr(f"least(out_degree, {{cap}}) * (least(out_degree, {{cap}}) - 1) div 2"))
        .alias("w")
    ).collect()[0]["w"]
)
best = None
for _ in range(2):                     # best-of-2
    t0 = time.monotonic()
    n = square_count(g, max_center_degree=cap)
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": cpus, "wedges": wedges, "squares": n,
                   "sec": round(best, 3),
                   "wps": round(wedges / best)}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--edge-factor", type=int, default=8)
    ap.add_argument("--n", type=int, default=4, help="small side; big side is 4N")
    ap.add_argument("--cap", type=int, default=512, help="max_center_degree")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "edges.parquet")
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gunrock_spark.session import build_session; "
            "from gunrock_spark.graph.generators import rmat_edges_df; "
            "s = build_session('gen'); "
            "rmat_edges_df(s, scale=%d, edge_factor=%d, seed=%d)"
            ".write.parquet(%r)"
            % (repo, args.scale, args.edge_factor, args.seed, path)
        )
        subprocess.run([sys.executable, "-c", gen], check=True)

        script = os.path.join(td, "runner.py")
        with open(script, "w") as f:
            f.write(RUNNER.format(repo=repo))

        results = {}
        for cpus in (args.n, 4 * args.n):
            out = subprocess.run(
                [sys.executable, script, str(cpus), path, str(args.cap)],
                check=True,
                capture_output=True,
                text=True,
            ).stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(out)

        lo, hi = results[args.n], results[4 * args.n]
        eff = (hi["wps"] / lo["wps"]) / 4.0
        print(
            json.dumps(
                {
                    "metric": "squares_scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "x",
                    "scale": args.scale,
                    "edge_factor": args.edge_factor,
                    "cap": args.cap,
                    "runs": {str(k): v for k, v in results.items()},
                },
                sort_keys=True,
            )
        )


if __name__ == "__main__":
    main()

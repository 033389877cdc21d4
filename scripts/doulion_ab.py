"""DOULION sampled-vs-exact triangle counting at scale: the
measured version of the `triangle_count_doulion` scale story — on a
seeded R-MAT graph, run the exact CSR-blocks count and the
deterministic-coin sparsified estimate at one or more retention
rates, each in its OWN fresh JVM subprocess (same evidence protocol
as scripts/tc_ab.py / r5_scaling.py: cold JIT, no shuffle-file
reuse between cells), and report wall time, the estimate, and the
relative error vs the exact count.

Usage: python scripts/doulion_ab.py [--scale 22] [--cpus 32]
       [--dens 10,3] [--timeout 1800]
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
cpus = int(sys.argv[1]); path = sys.argv[2]; den = int(sys.argv[3])
os.environ.setdefault("SPARK_DRIVER_MEM", f"{{min(96, max(32, 6 * cpus))}}g")
from gunrock_spark.session import build_session
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.algorithms.triangles import (
    triangle_count_blocks,
    triangle_count_doulion,
)
spark = build_session(
    "doulion-ab", master=f"local[{{cpus}}]", shuffle_partitions=cpus, adaptive=False
)
spark.sparkContext.setLogLevel("ERROR")
g = EdgeTable.from_df(spark.read.parquet(path), num_partitions=cpus)
m = g.num_edges(); g.degrees.count()   # warm the cached degree table
t0 = time.monotonic()
if den == 1:
    tri = triangle_count_blocks(g, num_blocks=32)
    out = {{"den": 1, "sec": round(time.monotonic() - t0, 3),
            "sampled_triangles": tri, "est_triangles": float(tri)}}
else:
    row = triangle_count_doulion(g, num=1, den=den, seed=11).collect()[0]
    out = {{"den": den, "sec": round(time.monotonic() - t0, 3),
            "sampled_triangles": row["sampled_triangles"],
            "est_triangles": row["est_triangles"]}}
out["edges"] = m
print(json.dumps(out))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22)
    ap.add_argument("--edge-factor", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dens", default="10,3", help="sampling denominators (p=1/den)")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gunrock_spark.graph.generators import rmat_edges

    td = tempfile.mkdtemp(prefix="doulion_ab_")
    edge_path = os.path.join(td, "edges.parquet")
    arr = rmat_edges(args.scale, args.edge_factor, seed=42)
    pq.write_table(
        pa.table({"src": arr[:, 0], "dst": arr[:, 1]}), edge_path
    )

    script = os.path.join(td, "runner.py")
    with open(script, "w") as f:
        f.write(RUNNER.format(repo=repo))

    cells = [1] + [int(d) for d in args.dens.split(",")]
    results = []
    for den in cells:
        proc = subprocess.run(
            [sys.executable, script, str(args.cpus), edge_path, str(den)],
            capture_output=True, text=True, timeout=args.timeout,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            return 1
        results.append(json.loads(line[-1]))
        print(results[-1], flush=True)

    exact = results[0]["est_triangles"]
    summary = {
        "metric": "doulion_sampled_tc",
        "rmat_scale": args.scale,
        "cpus": args.cpus,
        "exact": results[0],
        "sampled": [
            {**r, "rel_err": round(abs(r["est_triangles"] - exact) / exact, 6),
             "speedup": round(results[0]["sec"] / r["sec"], 2)}
            for r in results[1:]
        ],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""A/B bench: triangle counting wedge-join vs CSR-block
sorted-intersection (`triangle_count(impl=)`) on a big seeded R-MAT
input — the north rule's optimized-TC path measured against the
shuffle-based default (VERDICT r1 #8 done-criterion).

Each impl runs in its OWN fresh JVM subprocess with an independent
timeout, so one strategy blowing up (the wedge join's output is
O(sum deg+^2) — enormous on power-law graphs) is recorded as a DNF
instead of taking the other measurement down with it.

Usage: python scripts/tc_ab.py --input <edges.parquet> [--cpus 16]
       [--timeout 1200] [--impls join,blocks]
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
from gunrock_spark.algorithms.triangles import triangle_count

cpus = int(sys.argv[1]); path = sys.argv[2]; impl = sys.argv[3]
os.environ.setdefault("SPARK_DRIVER_MEM", f"{{min(96, max(32, 6 * cpus))}}g")  # cap: 128 GiB host
spark = build_session(
    "tc-ab", master=f"local[{{cpus}}]", shuffle_partitions=cpus, adaptive=False
)
spark.sparkContext.setLogLevel("ERROR")
g = EdgeTable.from_df(spark.read.parquet(path), num_partitions=cpus)
m = g.num_edges(); g.degrees.count()
t0 = time.monotonic()
n_tri = triangle_count(g, impl=impl)
dt = time.monotonic() - t0
print(json.dumps({{"impl": impl, "sec": round(dt, 3), "triangles": n_tri,
                   "edges": m, "edges_per_sec": round(m / dt)}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--timeout", type=int, default=1800, help="per-impl seconds")
    ap.add_argument("--impls", default="join,blocks")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(tempfile.mkdtemp(prefix="tc_ab_"), "runner.py")
    with open(script, "w") as f:
        f.write(RUNNER.format(repo=repo))

    results = {}
    for impl in args.impls.split(","):
        try:
            out = subprocess.run(
                [sys.executable, script, str(args.cpus), args.input, impl],
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if out.returncode == 0 and lines:
                results[impl] = json.loads(lines[-1])
            else:
                tail = out.stderr.splitlines()[-3:]
                results[impl] = {"impl": impl, "dnf": f"rc={out.returncode}",
                                 "stderr_tail": tail}
        except subprocess.TimeoutExpired:
            results[impl] = {"impl": impl, "dnf": f"timeout {args.timeout}s"}
        print(f"# {impl}: {results[impl]}", file=sys.stderr)
    done = [r for r in results.values() if "triangles" in r]
    if len(done) == 2:
        assert done[0]["triangles"] == done[1]["triangles"], results
    print(json.dumps({"metric": "tc_join_vs_blocks", "unit": "sec",
                      "cpus": args.cpus, **{k: v for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

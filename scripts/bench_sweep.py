"""Per-query latency curve across scale factors — makes round-over-
round regressions visible PER QUERY instead of as one total
(`bench.py` emits a single line per SF; the driver records only one).

Runs `bench.py` in a fresh subprocess (fresh JVM) per SF directory,
then prints one combined JSON line plus a BENCH.md-ready markdown
table: rows = queries, one column per SF, plus the sfB/sfA latency
ratio — a query whose latency grows much faster than the data is the
one to inspect.

Usage: python scripts/bench_sweep.py [--sf-dirs sf0.01,sf0.1] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        default="/root/testdata/sf0.01,/root/testdata/sf0.1",
        help="comma-separated SF directories, smallest first",
    )
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = [d for d in args.sf_dirs.split(",") if d]

    runs: dict[str, dict] = {}
    for d in dirs:
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py"), "--sf-dir", d,
             "--cpus", str(args.cpus), "--no-sf1"],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            print(f"# bench at {d} failed rc={out.returncode}", file=sys.stderr)
            for l in out.stderr.splitlines()[-20:]:
                print(f"#   {l}", file=sys.stderr)
            return 1
        runs[d] = json.loads(lines[-1])
        print(f"# {d}: total {runs[d]['value']}s", file=sys.stderr)

    queries = list(runs[dirs[0]]["queries"])
    sf_names = [d.rstrip("/").rsplit("/", 1)[-1] for d in dirs]
    print(f"| query | {' | '.join(f'{n} (s)' for n in sf_names)} | ratio |")
    print("|---" * (len(dirs) + 2) + "|")
    for q in queries:
        vals = [runs[d]["queries"].get(q) for d in dirs]
        ratio = (
            round(vals[-1] / vals[0], 2)
            if vals[0] and vals[-1] is not None
            else "-"
        )
        cells = " | ".join(f"{v:.2f}" if v is not None else "-" for v in vals)
        print(f"| {q} | {cells} | {ratio} |")
    print(
        json.dumps(
            {
                "metric": "per_query_latency_curve",
                "unit": "sec",
                "cpus": args.cpus,
                "curves": {
                    n: runs[d]["queries"] for n, d in zip(sf_names, dirs)
                },
                "totals": {n: runs[d]["value"] for n, d in zip(sf_names, dirs)},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

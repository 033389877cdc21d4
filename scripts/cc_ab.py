"""Same-JVM interleaved A/B of CC pointer-jump strength.

r3 jumped labels once through the materialized previous state
(halving per-iteration compute vs jump-through-new but costing one
extra outer iteration at sf0.1: 5 -> 6). r4 jumps TWICE through the
same materialized map — two |V|-row joins, still no recomputed
|E|-row hash-min. This script interleaves the two variants in one
JVM (hardware drift cancels) and reports per-variant seconds and
iteration counts.

Usage: python scripts/cc_ab.py [--sf-dir DIR] [--cpus N] [--reps R]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gunrock_spark.algorithms.components import connected_components
from gunrock_spark.session import build_session
from gunrock_spark.sources.tables import derived_edge_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mod", type=int, default=None)
    args = ap.parse_args()

    spark = build_session("cc-ab", master=f"local[{args.cpus}]", adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    graph = derived_edge_table(spark, args.sf_dir, mod=args.mod)
    graph.num_edges()
    graph.symmetrized().edges.count()  # shared warm layout for both variants

    results: dict[str, list] = {"jump1": [], "jump2": []}
    iters: dict[str, int] = {}
    # warm-up run (JIT/codegen caches), discarded
    connected_components(graph, pointer_jump=1).state.count()
    for rep in range(args.reps):
        for name, jumps in (("jump1", 1), ("jump2", 2)):
            t0 = time.monotonic()
            res = connected_components(graph, pointer_jump=jumps)
            n_labels = res.state.select("label").distinct().count()
            dt = time.monotonic() - t0
            results[name].append(round(dt, 3))
            iters[name] = res.iterations
            print(f"rep{rep} {name}: {dt:.3f}s iters={res.iterations} labels={n_labels}", file=sys.stderr)

    summary = {
        name: {
            "sec": vals,
            "median": sorted(vals)[len(vals) // 2],
            "iterations": iters[name],
        }
        for name, vals in results.items()
    }
    summary["speedup_jump2_vs_jump1"] = round(
        summary["jump1"]["median"] / summary["jump2"]["median"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

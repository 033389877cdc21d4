"""Hub-skew A/B — does the broadcast hot tier (engine/skew.py, wired
into pagerank/connected_components as ``skew="auto"``) actually cut
the straggler task on a deliberately hub-skewed graph?

Input: distributed R-MAT (scale S, edge factor F) PLUS one injected
hub vertex owning ~hub_frac of all edges — the shape the reference's
TWC machinery exists for. Each variant runs in its OWN subprocess
(fresh JVM) with the Spark UI enabled so the REST API can report the
MAX single-task executorRunTime across the run — the straggler metric
a wall-clock average hides.

Usage:
  python scripts/skew_ab.py                # wrapper: alternating A/B
  python scripts/skew_ab.py --variant auto # one measured run (child)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("SKEW_AB_SCALE", 19))
EDGE_FACTOR = 8
HUB_FRAC = float(os.environ.get("SKEW_AB_HUB_FRAC", 0.10))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def build_graph(spark):
    from pyspark.sql import functions as F

    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import rmat_edges_df_distributed

    n = 1 << SCALE
    m = n * EDGE_FACTOR
    base = rmat_edges_df_distributed(spark, SCALE, EDGE_FACTOR, seed=7)
    n_hub = int(m * HUB_FRAC)
    hub = spark.range(n_hub).select(
        F.lit(0).cast("long").alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(99)), F.lit(n - 1)) + 1).cast("long").alias("dst"),
    )
    return EdgeTable.from_df(
        base.unionByName(hub),
        num_partitions=spark.sparkContext.defaultParallelism,
    )


def max_task_ms(spark) -> int:
    """Max single-task executorRunTime (ms) over the app's heaviest
    completed stages, via the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
    )
    stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    worst = 0
    for s in stages[:12]:  # the heavy join/agg stages
        try:
            summ = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                    f"{s['attemptId']}/taskSummary?quantiles=1.0"
                )
            )
            worst = max(worst, int(summ["executorRunTime"][0]))
        except Exception:
            continue
    return worst


def run_variant(variant: str) -> None:
    from gunrock_spark.algorithms.pagerank import pagerank
    from gunrock_spark.session import build_session

    spark = build_session(
        f"skew-ab-{variant}",
        master=f"local[{CPUS}]",
        adaptive=False,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    g = build_graph(spark)
    g.num_edges()
    g.degrees.count()
    skew = "auto" if variant == "auto" else False
    t0 = time.monotonic()
    pr = pagerank(g, max_iter=5, threshold=0.0, skew=skew)
    pr.state.agg({"rank": "sum"}).collect()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "variant": variant,
                "wall_sec": round(wall, 2),
                "max_task_ms": max_task_ms(spark),
                "iters": pr.iterations,
                "edges": g.num_edges(),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["auto", "off"], default=None)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.variant:
        run_variant(args.variant)
        return
    here = os.path.abspath(__file__)
    out: dict[str, list] = {"off": [], "auto": []}
    for rep in range(args.reps):
        for v in ("off", "auto"):
            r = subprocess.run(
                [sys.executable, here, "--variant", v],
                capture_output=True,
                text=True,
                timeout=1200,
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(f"variant {v} rep {rep} failed:\n{r.stderr[-2000:]}", file=sys.stderr)
                continue
            rec = json.loads(lines[-1])
            out[v].append(rec)
            print(f"rep{rep} {v}: wall={rec['wall_sec']}s max_task={rec['max_task_ms']}ms",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

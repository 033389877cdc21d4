"""Benchmark harness — headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], PLUS the
standing sf1-big suite (deterministic generated tables, 1M-vertex /
6M-edge graph via --mod 1000003) — the regime where plan changes
dominate fixed overheads and host drift (BENCH.md §2b-r3).

Prints ONE JSON line:
  {"metric": "total_runtime", "value": N, "unit": "sec",
   "queries": {...sf0.1 seconds...}, "sf": ..., "teps": {...},
   "sf1_big": {"queries": {...}, "graph": {...}, "total": N}}

TEPS follows the reference's accounting (gunrock/util/info.cuh:
1297-1425; PR queues |E| edges per iteration, pr_enactor.cuh:542):
  TEPS = |E| * iterations / elapsed_seconds.

Usage:
  python bench.py                 # both suites
  python bench.py --cpus 8        # override parallelism (scaling runs)
  python bench.py --no-sf1        # primary suite only
  python bench.py --sf-dir /tmp/sf1 --mod 1000003 --no-sf1  # manual sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from gunrock_spark.algorithms.components import connected_components
from gunrock_spark.algorithms.label_propagation import label_propagation
from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.algorithms.triangles import triangle_count_df
from gunrock_spark.pipeline.dedup import near_duplicates
from gunrock_spark.pipeline.similarity import cosine_topk
from gunrock_spark.session import build_session
from gunrock_spark.sources.tables import derived_edge_table, load_table

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
SF1_MOD = 1_000_003


def run_suite(spark, sf_dir: str, mod: int | None, source: str) -> dict:
    """The six headline queries against one sf dir; returns the
    per-suite record (timings, iterations, teps, graph/pipeline)."""
    graph = derived_edge_table(spark, sf_dir, mod=mod, source=source)
    n_edges = graph.num_edges()
    n_vertices = graph.num_vertices()
    graph.degrees.count()  # warm the cached degree table

    timings: dict[str, float] = {}
    teps: dict[str, float] = {}
    iters: dict[str, int] = {}

    t0 = time.monotonic()
    pr = pagerank(graph, delta=0.85, threshold=0.01, max_iter=50)
    pr.state.select("v", "rank").orderBy("rank", ascending=False).limit(10).collect()
    timings["pagerank"] = time.monotonic() - t0
    iters["pagerank"] = pr.iterations
    teps["pagerank"] = n_edges * pr.iterations / timings["pagerank"]

    t0 = time.monotonic()
    cc = connected_components(graph)
    cc.state.select("label").distinct().count()
    timings["connected_components"] = time.monotonic() - t0
    iters["connected_components"] = cc.iterations
    # CC touches 2|E| (symmetrized) edges per iteration
    teps["connected_components"] = 2 * n_edges * cc.iterations / timings["connected_components"]

    t0 = time.monotonic()
    lp = label_propagation(graph, mode="mode", max_iter=5)
    lp.state.select("label").distinct().count()
    timings["label_propagation"] = time.monotonic() - t0
    iters["label_propagation"] = lp.iterations
    teps["label_propagation"] = 2 * n_edges * lp.iterations / timings["label_propagation"]

    t0 = time.monotonic()
    n_tri = triangle_count_df(graph).collect()[0]["n_triangles"]
    timings["triangle_count"] = time.monotonic() - t0
    teps["triangle_count"] = n_edges / timings["triangle_count"]

    # training-data pipeline headliners
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    t0 = time.monotonic()
    n_near_dups = near_duplicates(docs, threshold=0.2).count()
    timings["minhash_near_dup"] = time.monotonic() - t0

    embeds = load_table(spark, sf_dir, "embeddings")
    n_vecs = embeds.count()
    queries_df = embeds.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.monotonic()
    ann_rows = cosine_topk(embeds, queries_df, k=10).count()
    timings["ann_cosine_top10"] = time.monotonic() - t0

    graph.unpersist()
    return {
        "total": round(sum(timings.values()), 3),
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "graph": {"vertices": n_vertices, "edges": n_edges, "triangles": n_tri},
        "pipeline": {
            "docs": n_docs,
            "near_dup_pairs": n_near_dups,
            "vectors": n_vecs,
            "ann_result_rows": ann_rows,
        },
        "iterations": iters,
        "teps": {k: round(v) for k, v in teps.items()},
    }


def ensure_sf1(spark, out: str = SF1_DIR, seed: int = 42) -> bool:
    """Generate the deterministic sf1 tables if not already present
    (same (sf, seed) -> byte-identical; a marker file records a
    completed build so a half-written dir is regenerated)."""
    marker = os.path.join(out, "_GENERATED")
    if os.path.exists(marker):
        return True
    from scripts.make_sf import gen_documents, gen_embeddings, gen_lineitem

    os.makedirs(out, exist_ok=True)
    gen_lineitem(spark, out, 1.0, seed)
    gen_documents(spark, out, 1.0, seed)
    gen_embeddings(spark, out, 1.0, seed)
    with open(marker, "w") as f:
        f.write(json.dumps({"sf": 1.0, "seed": seed}))
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--source", default="lineitem", choices=["lineitem", "orders"])
    ap.add_argument(
        "--mod",
        type=int,
        default=None,
        help="vertex-id modulus for the derived graph (default: the "
        "BENCH_MOD contract, 100_003). The contract mod CAPS the vertex "
        "count, so a 10x-lineitem SF yields a DENSER graph, not a bigger "
        "one — pass a ~|rows|/6 prime to scale vertices with the data "
        "instead (e.g. 1_000_003 at sf1).",
    )
    ap.add_argument(
        "--no-sf1",
        action="store_true",
        help="skip the standing sf1-big suite (scaling sweeps that "
        "invoke bench.py per cpu count only need the primary suite)",
    )
    args = ap.parse_args()

    # Host-speed calibration: this sandbox's throughput drifts ±20%
    # (sometimes 2x) between sessions, which makes round-over-round
    # absolute-seconds comparisons meaningless. A fixed single-thread
    # CPU workload gives the denominator: compare
    # query_sec * (calibration_this_round / calibration_that_round).
    import hashlib
    import time as _time

    _t = _time.monotonic()
    _b = b"calibration"
    for _ in range(200_000):
        _b = hashlib.md5(_b).digest()
    host_calibration_sec = round(_time.monotonic() - _t, 4)

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    # adaptive=False: AQE's per-stage re-planning costs ~20% wall-clock
    # on these many-small-stage iterative loops (see session.py note);
    # a production cluster run of a single huge job would keep it on.
    spark = build_session(
        "gunrock-spark-bench", master=f"local[{args.cpus}]", adaptive=False
    )
    spark.sparkContext.setLogLevel("ERROR")

    primary = run_suite(spark, args.sf_dir, args.mod, args.source)

    record = {
        "metric": "total_runtime",
        "value": primary["total"],
        "unit": "sec",
        "queries": primary["queries"],
        "sf": float(args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": args.cpus,
        "graph": primary["graph"],
        "pipeline": primary["pipeline"],
        "iterations": primary["iterations"],
        "teps": primary["teps"],
        "host_calibration_sec": host_calibration_sec,
    }

    if not args.no_sf1:
        # standing sf1-big suite: 10x the data, 1M-vertex graph —
        # failures here must never lose the primary record.
        try:
            t0 = time.monotonic()
            ensure_sf1(spark)
            gen_sec = round(time.monotonic() - t0, 3)
            sf1 = run_suite(spark, SF1_DIR, SF1_MOD, "lineitem")
            sf1["mod"] = SF1_MOD
            sf1["generation_sec"] = gen_sec
            record["sf1_big"] = sf1
        except Exception as exc:  # pragma: no cover - defensive
            record["sf1_big"] = {"error": f"{type(exc).__name__}: {exc}"}

    print(json.dumps(record))


if __name__ == "__main__":
    main()

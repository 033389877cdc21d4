"""Two-parallelism scaling study for the round-4b ops — standalone
Lloyd k-means (pipeline/similarity.kmeans) and the Gopher quality
rule set (pipeline/text.gopher_quality) — the same N -> 4N evidence
protocol as scripts/scaling.py / curation_scaling.py.

Each measurement is a fresh subprocess (fresh JVM). Inputs are
deterministic h60-derived synthetic tables (no external data):
embeddings = unit-scaled 64-dim vectors, documents = the Zipfian
token soup of curation_scaling.py.

Usage: python scripts/newops_scaling.py [--vecs 300000] [--docs 300000] [--n 8]
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
cpus = int(sys.argv[1]); emb_path = sys.argv[2]; doc_path = sys.argv[3]
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
from gunrock_spark.session import build_session
from gunrock_spark.pipeline.similarity import kmeans
from gunrock_spark.pipeline.text import gopher_quality
from pyspark.sql import functions as F
spark = build_session(
    "newops-scaling",
    master=f"local[{{cpus}}]",
    shuffle_partitions=cpus,
    adaptive=False,
)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet(emb_path).repartition(cpus).cache()
n_vec = emb.count()                     # warm, untimed
docs = spark.read.parquet(doc_path).repartition(cpus).cache()
n_doc = docs.count()
res = {{"cpus": cpus}}
best = None
for _ in range(2):
    t0 = time.monotonic()
    asg, _cent = kmeans(emb, k=64, iters=2)
    asg.agg(F.count(F.lit(1))).collect()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
res["kmeans_sec"] = round(best, 3)
# 3 assign passes (2 refine + final) over n_vec vectors
res["kmeans_aps"] = round(3 * n_vec / best)
best = None
for _ in range(2):
    t0 = time.monotonic()
    gopher_quality(docs).agg(F.sum(F.col("n_words"))).collect()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
res["gopher_sec"] = round(best, 3)
res["gopher_dps"] = round(n_doc / best)
print(json.dumps(res))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=300_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--doc-len", type=int, default=60)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--n", type=int, default=8, help="small side; big side is 4N")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    with tempfile.TemporaryDirectory() as td:
        emb_path = os.path.join(td, "emb.parquet")
        doc_path = os.path.join(td, "docs.parquet")
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gunrock_spark.session import build_session; "
            "from pyspark.sql import functions as F; "
            "s = build_session('gen'); "
            "from gunrock_spark.functions.hashing import h60; "
            # embeddings: dim h60-derived doubles in [-1, 1)
            "e = s.range(%d).select(F.col('id').alias('vec_id'), F.transform("
            "F.sequence(F.lit(0), F.lit(%d)), lambda d: (F.pmod(h60("
            "F.concat_ws(':', F.lit('emb'), F.col('id'), d)), F.lit(2000001)) "
            "- F.lit(1000000)) / F.lit(1000000.0)).alias('embedding')); "
            "e.write.parquet(%r); "
            # documents: Zipfian token soup (same recipe as curation_scaling)
            "d = s.range(%d).select(F.col('id').alias('doc_id'), "
            "F.explode(F.sequence(F.lit(0), F.lit(%d))).alias('p')); "
            "h = h60(F.concat_ws(':', F.lit('cs'), F.col('doc_id'), F.col('p'))); "
            "rank = (F.pmod(h, F.lit(%d)) * F.pmod(h, F.lit(%d))) / F.lit(%d); "
            "d.groupBy('doc_id').agg(F.concat_ws(' ', F.collect_list("
            "F.concat(F.lit('t'), rank.cast('long').cast('string')))).alias('text'))"
            ".write.parquet(%r)"
            % (
                repo,
                args.vecs,
                args.dim - 1,
                emb_path,
                args.docs,
                args.doc_len - 1,
                args.vocab,
                args.vocab,
                args.vocab,
                doc_path,
            )
        )
        subprocess.run([sys.executable, "-c", gen], check=True)

        script = os.path.join(td, "runner.py")
        with open(script, "w") as f:
            f.write(RUNNER.format(repo=repo))

        results = {}
        for cpus in (args.n, 4 * args.n):
            out = subprocess.run(
                [sys.executable, script, str(cpus), emb_path, doc_path],
                check=True,
                capture_output=True,
                text=True,
            ).stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(out)

        lo, hi = results[args.n], results[4 * args.n]
        print(
            json.dumps(
                {
                    "metric": "newops_scaling_efficiency",
                    "kmeans_value": round(
                        (hi["kmeans_aps"] / lo["kmeans_aps"]) / 4.0, 3
                    ),
                    "gopher_value": round(
                        (hi["gopher_dps"] / lo["gopher_dps"]) / 4.0, 3
                    ),
                    "unit": "x",
                    "vecs": args.vecs,
                    "docs": args.docs,
                    "n_cpus": args.n,
                    "runs": results,
                }
            )
        )


if __name__ == "__main__":
    main()

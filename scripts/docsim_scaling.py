"""Two-parallelism scaling study for the sparse TF-IDF similarity
join (pipeline/text.sparse_cosine_pairs) — the same N -> 4N evidence
protocol as scripts/scaling.py, with candidate pairs/sec as the
throughput unit (the term-self-join candidate volume IS the work:
Σ_t C(posting(t), 2) over surviving terms).

Each measurement is a fresh subprocess (fresh JVM, nothing shared);
the synthetic corpus is generated once — a deterministic Zipfian
token soup (token ids h60-drawn per (doc, position) from rank ~
hash^2-skewed vocabulary, so posting lists are heavy-tailed like real
text). Writes BENCH.md-ready JSON.

Usage: python scripts/docsim_scaling.py [--docs 120000] [--n 2]
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
cpus = int(sys.argv[1]); path = sys.argv[2]
min_df, max_df = int(sys.argv[3]), int(sys.argv[4])
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
os.environ.setdefault("SPARK_DRIVER_MEM", f"{{min(96, max(32, 4 * cpus))}}g")
from gunrock_spark.session import build_session
from gunrock_spark.pipeline.text import sparse_cosine_pairs
from pyspark.sql import functions as F
spark = build_session(
    "docsim-scaling",
    master=f"local[{{cpus}}]",
    shuffle_partitions=cpus,
    adaptive=False,
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path).repartition(cpus).cache()
docs.count()                            # warm the input, untimed
# candidate volume (the work unit): sum over surviving terms of
# C(df, 2) — computed once from the token table, untimed
tok = docs.select(
    F.col("doc_id"),
    F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("t"),
)
dfq = (
    tok.distinct().groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
)
cand = int(dfq.agg(F.sum(F.expr("df * (df - 1) div 2")).alias("c")).collect()[0]["c"])
best = None
n_pairs = 0
for _ in range(2):                      # best-of-2
    t0 = time.monotonic()
    n_pairs = sparse_cosine_pairs(docs, min_df=min_df, max_df=max_df).count()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": cpus, "candidates": cand, "pairs": n_pairs,
                   "sec": round(best, 3),
                   "cps": round(cand / best)}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--doc-len", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--n", type=int, default=2, help="small side; big side is 4N")
    ap.add_argument("--min-df", type=int, default=2)
    ap.add_argument("--max-df", type=int, default=300)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "docs.parquet")
        # deterministic Zipf-ish soup: token rank = (h60 % V)^2 / V
        # (quadratic skew concentrates mass on low ranks)
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gunrock_spark.session import build_session; "
            "from pyspark.sql import functions as F; "
            "s = build_session('gen'); "
            "from gunrock_spark.functions.hashing import h60; "
            "d = s.range(%d).select(F.col('id').alias('doc_id'), "
            "F.explode(F.sequence(F.lit(0), F.lit(%d))).alias('p')); "
            "h = h60(F.concat_ws(':', F.lit('ds'), F.col('doc_id'), F.col('p'))); "
            "rank = (F.pmod(h, F.lit(%d)) * F.pmod(h, F.lit(%d))) / F.lit(%d); "
            "d.groupBy('doc_id').agg(F.concat_ws(' ', F.collect_list("
            "F.concat(F.lit('t'), rank.cast('long').cast('string')))).alias('text'))"
            ".write.parquet(%r)"
            % (repo, args.docs, args.doc_len - 1, args.vocab, args.vocab,
               args.vocab, path)
        )
        subprocess.run([sys.executable, "-c", gen], check=True)

        script = os.path.join(td, "runner.py")
        with open(script, "w") as f:
            f.write(RUNNER.format(repo=repo))

        results = {}
        for cpus in (args.n, 4 * args.n):
            out = subprocess.run(
                [sys.executable, script, str(cpus), path,
                 str(args.min_df), str(args.max_df)],
                check=True,
                capture_output=True,
                text=True,
            ).stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(out)

        lo, hi = results[args.n], results[4 * args.n]
        eff = (hi["cps"] / lo["cps"]) / 4.0
        print(
            json.dumps(
                {
                    "metric": "docsim_scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "x",
                    "docs": args.docs,
                    "doc_len": args.doc_len,
                    "vocab": args.vocab,
                    "min_df": args.min_df,
                    "max_df": args.max_df,
                    "runs": {str(k): v for k, v in results.items()},
                },
                sort_keys=True,
            )
        )


if __name__ == "__main__":
    main()

"""Two-parallelism scaling study for the final-session curation ops —
Naive-Bayes classifier train+score (pipeline/classify.py) and bigram
LM train+score (pipeline/lm.py) — the same N -> 4N evidence protocol
as scripts/scaling.py / docsim_scaling.py, with scored tokens (resp.
bigrams) per second as the throughput unit.

Each measurement is a fresh subprocess (fresh JVM, nothing shared);
the corpus is the same deterministic Zipfian token soup as
docsim_scaling.py, with an alternating source label so both NB
classes are populated.

Usage: python scripts/curation_scaling.py [--docs 200000] [--n 8]
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
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
# EQUAL, modest heap on both sides: the corpus is small relative to the
# graph scaling studies, and an oversized (96g) first-run heap spends
# 10+ s page-faulting fresh pages, poisoning the N-vs-4N comparison.
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
from gunrock_spark.session import build_session
from gunrock_spark.pipeline.classify import nb_score, nb_train
from gunrock_spark.pipeline.lm import bigram_lm, bigram_lm_score
from pyspark.sql import functions as F
spark = build_session(
    "curation-scaling",
    master=f"local[{{cpus}}]",
    shuffle_partitions=cpus,
    adaptive=False,
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path).repartition(cpus).cache()
docs.count()                            # warm the input, untimed
res = {{"cpus": cpus}}
best = None
for _ in range(2):                      # best-of-2, train+score timed
    t0 = time.monotonic()
    model = nb_train(docs, F.col("source") == "a")
    n_tok = int(
        nb_score(docs, model).agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
    )
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
res["nb_sec"] = round(best, 3)
res["nb_tokens"] = n_tok
res["nb_tps"] = round(n_tok / best)
best = None
for _ in range(2):
    t0 = time.monotonic()
    model = bigram_lm(docs)
    n_bi = int(
        bigram_lm_score(docs, model)
        .agg(F.sum("n_bigrams").alias("s")).collect()[0]["s"]
    )
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
res["bigram_sec"] = round(best, 3)
res["bigram_pairs"] = n_bi
res["bigram_pps"] = round(n_bi / best)
print(json.dumps(res))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--doc-len", type=int, default=60)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--n", type=int, default=8, help="small side; big side is 4N")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "docs.parquet")
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from gunrock_spark.session import build_session; "
            "from pyspark.sql import functions as F; "
            "s = build_session('gen'); "
            "from gunrock_spark.functions.hashing import h60; "
            "d = s.range(%d).select(F.col('id').alias('doc_id'), "
            "F.explode(F.sequence(F.lit(0), F.lit(%d))).alias('p')); "
            "h = h60(F.concat_ws(':', F.lit('cs'), F.col('doc_id'), F.col('p'))); "
            "rank = (F.pmod(h, F.lit(%d)) * F.pmod(h, F.lit(%d))) / F.lit(%d); "
            "d.groupBy('doc_id').agg(F.concat_ws(' ', F.collect_list("
            "F.concat(F.lit('t'), rank.cast('long').cast('string')))).alias('text'))"
            ".select('doc_id', 'text', F.when(F.col('doc_id') %% 2 == 0, 'a')"
            ".otherwise('b').alias('source'))"
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
                [sys.executable, script, str(cpus), path],
                check=True,
                capture_output=True,
                text=True,
            ).stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(out)

        lo, hi = results[args.n], results[4 * args.n]
        print(
            json.dumps(
                {
                    "metric": "curation_scaling_efficiency",
                    "nb_value": round((hi["nb_tps"] / lo["nb_tps"]) / 4.0, 3),
                    "bigram_value": round(
                        (hi["bigram_pps"] / lo["bigram_pps"]) / 4.0, 3
                    ),
                    "unit": "x",
                    "docs": args.docs,
                    "doc_len": args.doc_len,
                    "vocab": args.vocab,
                    "n_cpus": args.n,
                    "runs": results,
                }
            )
        )


if __name__ == "__main__":
    main()

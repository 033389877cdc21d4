"""spark-submit event-analytics driver — the events family's cluster
entry point (companion to jobs/pagerank.py for graphs and
jobs/corpus.py for documents).

One op per invocation over an events parquet (``event_id``, ``ts``,
``user_id``, ``event_type``, ``value``), writing result parquet plus a
one-line JSON manifest on stdout (rows in/out, elapsed — the same Info
contract as the other drivers).

Usage (cluster):
  python scripts/make_pyfiles.py                 # -> dist/gunrock_spark.zip
  spark-submit --py-files dist/gunrock_spark.zip \
      jobs/events.py --input s3://bucket/events.parquet \
      --op transitions --out s3://bucket/markov

Ops:
  transitions  first-order Markov transition matrix per event type
  retention    retention-cohort triangle (first-seen day x offset)
  funnel       ordered first-touch funnel over --steps
  sessionize   gap-based batch sessionization (--gap-ms)
  hourly       tumbling hourly rollup per event type
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="events parquet")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument(
        "--op",
        required=True,
        choices=["transitions", "retention", "funnel", "sessionize", "hourly"],
    )
    ap.add_argument("--user-col", default="user_id")
    ap.add_argument("--type-col", default="event_type")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--id-col", default="event_id")
    ap.add_argument("--steps", default="view,click,purchase",
                    help="funnel: comma-separated ordered event types")
    ap.add_argument("--gap-ms", type=int, default=1_800_000,
                    help="sessionize: inactivity gap in milliseconds")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from gunrock_spark.session import build_session

    spark = SparkSession.getActiveSession() or build_session("gunrock-events-job")
    t0 = time.monotonic()
    events = spark.read.parquet(args.input)
    n_in = events.count()

    if args.op == "transitions":
        from gunrock_spark.pipeline.events import event_transitions

        out = event_transitions(
            events, user_col=args.user_col, type_col=args.type_col,
            ts_col=args.ts_col, id_col=args.id_col,
        )
    elif args.op == "retention":
        from gunrock_spark.pipeline.events import retention_cohorts

        out = retention_cohorts(
            events, user_col=args.user_col, ts_col=args.ts_col
        )
    elif args.op == "funnel":
        from gunrock_spark.pipeline.events import funnel_counts

        out = funnel_counts(
            events, steps=args.steps.split(","), user_col=args.user_col,
            type_col=args.type_col, ts_col=args.ts_col,
        )
    elif args.op == "sessionize":
        from gunrock_spark.streaming.sessions import sessionize_batch

        out = sessionize_batch(
            events, gap_ms=args.gap_ms, key_col=args.type_col,
            ts_col=args.ts_col,
        )
    else:  # hourly
        out = events.groupBy(
            F.date_trunc("hour", F.col(args.ts_col)).alias("hour"),
            F.col(args.type_col),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )

    out.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "op": args.op,
                "rows_in": n_in,
                "rows_out": n_out,
                "out": args.out,
                "elapsed_sec": round(time.monotonic() - t0, 3),
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Local simulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count + column names + sorted values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from gunrock_spark.session import build_session
from gunrock_spark.sources.tables import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        got = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(got)} rows (no oracle)")
            continue
        want = con.sql(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        ok_cols = list(g.columns) == list(w.columns)
        ok_rows = len(g) == len(w)
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as e:
                print(f"--- {name} value diff: {str(e)[:400]}")
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{name:28s} {status}  spark={len(g)}r cols={list(g.columns)} "
                f"duck={len(w)}r cols={list(w.columns)}"
            )
        else:
            print(f"{name:28s} {status}  {len(g)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

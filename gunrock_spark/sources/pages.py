"""Pages-table source: Iceberg catalog tables or raw Parquet paths.

The north-rule input is "an Iceberg table of Common-Crawl-style web
pages with columns (url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)". On a production cluster that table lives
in an Iceberg catalog and is addressed by name
(``catalog.db.pages``); the engine reads it through Spark's DSv2
``spark.table`` path so Iceberg gives snapshot isolation, hidden
partitioning, and partition/file pruning for free. In this sandbox no
Iceberg runtime jar is installed, so the same entry point reads plain
Parquet directories — the physical scan Spark performs is the same
columnar, predicate-pushing parquet read either way; Iceberg adds
metadata-level pruning on top, it does not change the dataframe
contract.

Why ``spark.table`` and not ``spark.read.format("iceberg").load``:
the table-identifier route works for ANY catalog the session is
configured with (Iceberg, Hive, Unity, in-memory temp views), so the
engine stays format-agnostic and the deployment chooses the catalog
via ``spark.sql.catalog.*`` conf — no engine-code change between
sandbox and cluster.

Schema is validated on read: downstream ingestion
(:mod:`gunrock_spark.ingest.links`) assumes exactly the north-rule
columns, and failing fast with the actual-vs-expected schema beats a
mid-job AnalysisException three joins deep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The north-rule pages schema (name -> Spark simpleString type).
PAGES_SCHEMA = {
    "url": "string",
    "warc_ts": "timestamp",
    "html": "binary",
    "text": "string",
    "lang": "string",
}


def _validate_pages_schema(df: DataFrame, source: str) -> DataFrame:
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in PAGES_SCHEMA if c not in actual]
    wrong = {
        c: (actual[c], t)
        for c, t in PAGES_SCHEMA.items()
        if c in actual and actual[c] != t
    }
    if missing or wrong:
        raise ValueError(
            f"pages source {source!r} does not match the north-rule schema "
            f"(url string, warc_ts timestamp, html binary, text string, "
            f"lang string): missing={missing}, wrong-typed={wrong}"
        )
    # Project to exactly the contract columns in contract order so
    # downstream code (and column pruning) sees a stable shape even if
    # the physical table carries extra columns.
    return df.select(*PAGES_SCHEMA)


def _infer_fmt(source: str) -> str:
    """Path-looking sources (contain ``/``, end in ``.parquet``, or
    exist on the local filesystem — e.g. a bare relative directory
    name) are parquet; other bare identifiers are catalog tables."""
    if "/" in source or source.endswith(".parquet"):
        return "parquet"
    if os.path.exists(source):
        return "parquet"
    return "table"


def read_pages(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
) -> DataFrame:
    """Load the pages table from an Iceberg/catalog table name or a
    Parquet path, schema-validated against the north-rule contract.

    ``fmt`` is usually inferred: a source containing ``/`` (or ending
    in ``.parquet``) is a filesystem path read as Parquet; anything
    else is a catalog table identifier resolved via ``spark.table``
    (which is how Iceberg tables are addressed once
    ``spark.sql.catalog.<name>`` is configured). Pass
    ``fmt="parquet"`` / ``fmt="table"`` to force.
    """
    if fmt is None:
        fmt = _infer_fmt(source)
    if fmt == "parquet":
        # absolutize scheme-less local paths: the JVM resolves relative
        # paths against ITS cwd, which need not match Python's
        if "://" not in source and os.path.exists(source):
            source = os.path.abspath(source)
        df = spark.read.parquet(source)
    elif fmt == "table":
        try:
            df = spark.table(source)
        except Exception as exc:  # AnalysisException: table not found
            raise ValueError(
                f"pages source {source!r} resolved as a catalog table "
                f"identifier but could not be read ({exc}); if it is a "
                f"filesystem path, pass fmt='parquet'"
            ) from exc
    else:
        raise ValueError(f"unknown pages source format {fmt!r}")
    return _validate_pages_schema(df, source)


def write_pages(
    pages: DataFrame,
    target: str,
    fmt: str | None = None,
    mode: str = "error",
) -> None:
    """Write a pages table to a catalog table (Iceberg when the
    catalog is an Iceberg catalog) or a Parquet path. Table writes go
    through ``saveAsTable``, which resolves against the target's
    catalog — on an Iceberg catalog that is an atomic metadata commit
    (create/append/replace), on the built-in session catalog a plain
    managed table; ``mode`` keeps its DataFrameWriter semantics
    (``append`` is the daily incremental-crawl write). Path writes
    are plain Parquet."""
    pages = _validate_pages_schema(pages, target)
    if fmt is None:
        fmt = _infer_fmt(target)
    if fmt == "parquet":
        pages.write.mode(mode).parquet(target)
    elif fmt == "table":
        pages.write.mode(mode).saveAsTable(target)
    else:
        raise ValueError(f"unknown pages target format {fmt!r}")

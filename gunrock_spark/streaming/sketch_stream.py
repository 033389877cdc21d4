"""Streaming Count-Min maintenance — a live heavy-hitter table over a
continuously-crawled corpus.

The batch sketch (pipeline/sketches.py) is a commutative monoid
(counters add), which is exactly what a streaming aggregation needs:
each micro-batch builds its own depth x width sketch and MERGES it
into the stored one. Merging is NOT idempotent (a replayed batch
would double-count), so the store keeps the last applied batch_id and
skips replays — the same exactly-once discipline as
incremental_link_ingestion's dictionary swap; with Structured
Streaming's sequential, monotone batch_ids a single `<=` check makes
the foreachBatch effectively-once.

State is O(depth x width) forever, whatever the corpus size — the
reason to sketch the stream instead of re-running term_counts over
an ever-growing corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from gunrock_spark.pipeline.sketches import cms_build, cms_merge

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _resolved(path: str):
    """(pyarrow FileSystem, fs-local path) — the same resolution the
    CSR block store uses, so an out_dir on HDFS/S3 gets its marker and
    version cleanup on THAT filesystem, not silently on the driver's
    local disk (which would break exactly-once replay detection and
    load_sketch on a cluster). Unsupported schemes fail loudly."""
    from gunrock_spark.engine.csr_blocks import _resolve_fs

    return _resolve_fs(path)


def _latest(out_dir: str) -> tuple[int, str | None]:
    """(last applied batch_id, committed sketch path)."""
    fs, root = _resolved(out_dir)
    try:
        with fs.open_input_stream(root.rstrip("/") + "/_LATEST") as f:
            m = json.loads(f.read().decode("utf-8"))
        return m["batch_id"], m["path"]
    except (OSError, ValueError, KeyError):
        return -1, None


def _commit_marker(out_dir: str, batch_id: int, version_path: str) -> None:
    """Write marker to a temp name, then rename over _LATEST — atomic
    on local/HDFS (POSIX rename semantics); object stores emulate the
    move as copy+delete, which is still safe here because the marker
    is only ever read whole-file and a torn read parses as no-marker."""
    fs, root = _resolved(out_dir)
    marker = root.rstrip("/") + "/_LATEST"
    tmp = marker + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(json.dumps({"batch_id": batch_id, "path": version_path}).encode("utf-8"))
    fs.move(tmp, marker)


def load_sketch(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The last COMMITTED sketch (crash-orphaned versions invisible)."""
    _, path = _latest(out_dir)
    if path is None:
        return None
    return spark.read.parquet(path)


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> bool:
    """Merge one micro-batch into the stored sketch; returns False for
    replays (batch_id <= last committed) — counters must never
    double-add.

    Crash-safe order: the merged sketch is written to a NEW versioned
    directory, then the marker (batch_id + path) is swung atomically
    via os.replace. A crash after the data write but before the
    marker leaves an orphan version the marker never points to — the
    replayed batch re-merges FROM THE OLD committed sketch, so counts
    are never applied twice (the checkpoint.py commit discipline).
    """
    last_id, prior_path = _latest(out_dir)
    if batch_id <= last_id:
        return False
    if batch.isEmpty():
        return False
    fs, root = _resolved(out_dir)
    fs.create_dir(root, recursive=True)
    delta = cms_build(batch, text_col=text_col, depth=depth, width=width, seed=seed)
    prior = None if prior_path is None else spark.read.parquet(prior_path)
    merged = delta if prior is None else cms_merge(prior, delta)
    version = out_dir.rstrip("/") + f"/sketch_v{batch_id}"
    merged.write.mode("overwrite").parquet(version)
    _commit_marker(out_dir, batch_id, version)
    if prior_path is not None:  # retire the superseded version
        try:
            pfs, ppath = _resolved(prior_path)
            pfs.delete_dir(ppath)
        except Exception:
            pass
    return True


def incremental_cms(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
    available_now: bool = True,
):
    """Stream ``pages_dir``/*.parquet into a persistent CMS at
    ``out_dir``/sketch. Returns the StreamingQuery (awaited when
    ``available_now``)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_batch(
            spark, batch, batch_id, out_dir,
            text_col=text_col, depth=depth, width=width, seed=seed,
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming HyperLogLog — live distinct-count over the crawl stream
# ---------------------------------------------------------------------------
#
# The register table (pipeline/sketches.hll_registers) is a MAX-merge
# monoid, and max is idempotent — a replayed batch cannot corrupt the
# registers the way a replayed CMS merge double-counts. The batch_id
# guard is still kept: it makes replays free (no rewrite, one version
# on disk) and keeps the two sketches' operational contracts
# identical, so one runbook covers both.


def apply_hll_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    col: str = "url",
    m: int = 64,
    seed: str = "hll",
) -> bool:
    """Max-merge one micro-batch's HLL registers into the stored
    table; returns False for replays (batch_id <= last committed).
    Same crash-safe versioned-commit order as :func:`apply_batch`."""
    from gunrock_spark.pipeline.sketches import hll_merge, hll_registers

    last_id, prior_path = _latest(out_dir)
    if batch_id <= last_id:
        return False
    if batch.isEmpty():
        return False
    fs, root = _resolved(out_dir)
    fs.create_dir(root, recursive=True)
    delta = hll_registers(batch, col=col, m=m, seed=seed)
    prior = None if prior_path is None else spark.read.parquet(prior_path)
    merged = delta if prior is None else hll_merge(prior, delta)
    version = out_dir.rstrip("/") + f"/sketch_v{batch_id}"
    merged.write.mode("overwrite").parquet(version)
    _commit_marker(out_dir, batch_id, version)
    if prior_path is not None:
        try:
            pfs, ppath = _resolved(prior_path)
            pfs.delete_dir(ppath)
        except Exception:
            pass
    return True


def incremental_hll(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    col: str = "url",
    m: int = 64,
    seed: str = "hll",
    available_now: bool = True,
):
    """Stream ``pages_dir``/*.parquet into a persistent m-register HLL
    at ``out_dir`` (default: distinct urls — the crawl's unique-page
    counter, O(m) state forever). Returns the StreamingQuery (awaited
    when ``available_now``)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_hll_batch(
            spark, batch, batch_id, out_dir, col=col, m=m, seed=seed
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()

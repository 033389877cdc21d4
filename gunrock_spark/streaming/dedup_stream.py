"""Streaming MinHash-LSH near-dup index — incremental near-duplicate
detection over a continuously-crawled corpus.

The batch pipeline (pipeline/dedup.py) re-shingles the whole corpus
per run; a crawl ingests a few million NEW pages against billions of
SEEN ones, so the streaming shape is an append-only signature/bucket
index plus a per-batch candidate join:

  per micro-batch:
    sign the new docs (O(H) per doc) and bucket them (O(bands));
    candidates = new-buckets ⋈ stored-buckets  (new vs old)
               ∪ new-buckets ⋈ new-buckets     (new vs new);
    verify candidates by SIGNATURE AGREEMENT
    (pipeline.dedup.signature_agreement_pairs) — no shingle storage,
    the property that makes the index O(H)-per-doc forever;
    append the new signatures/buckets and the emitted pairs.

Exactly-once: every append lands in a ``batch=<id>`` directory, and a
``_LATEST`` marker records the last COMMITTED batch id. Readers (and
the candidate join) filter ``batch <= last``, so crash-orphaned
directories are invisible; a replayed batch overwrites its own
directories and re-commits. The marker goes through the same
pyarrow-fs resolution as the CSR block store, so an out_dir on
HDFS/S3 gets its marker on THAT filesystem.

Union-over-batches of the emitted pairs equals the batch
``signature_near_duplicates`` over the full corpus: a pair is
emitted exactly once, in the batch where its LATER doc arrives
(pinned by tests/test_streaming.py).

Re-crawls (a doc id recurring in a later batch — normal for a corpus
keyed by url) are LATEST-WINS: within a batch the lexicographically
largest non-id column struct is kept per id (for the pages schema
that is the newest ``warc_ts``), and the candidate join / signature
verify supersede a re-seen id's stored rows with the newest batch's
— stale signatures never produce pairs, and ``sig_all`` holds exactly
one signature per id. Already-emitted (id_a, id_b) pairs are
anti-joined away, preserving emitted-exactly-once under re-crawls;
a pair is flagged at FIRST collision and not retracted if a later
re-crawl diverges the two docs (retraction would need a compaction
pass over the pair store, out of scope for the append-only index).

Scale note: the candidate join reads the stored bucket table each
batch; production deployments should bucket the store by
(band, bucket) (graph/io.py's Hive-bucketed store pattern) so the
join prunes to matching buckets instead of scanning the index.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from gunrock_spark.pipeline.dedup import (
    LSH_BANDS,
    NUM_MINHASHES,
    lsh_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    signature_agreement_pairs,
)

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _resolved(path: str):
    from gunrock_spark.engine.csr_blocks import _resolve_fs

    return _resolve_fs(path)


def _latest(out_dir: str) -> int:
    fs, root = _resolved(out_dir)
    try:
        with fs.open_input_stream(root.rstrip("/") + "/_LATEST") as f:
            return json.loads(f.read().decode("utf-8"))["batch_id"]
    except (OSError, ValueError, KeyError):
        return -1


def _commit_marker(out_dir: str, batch_id: int) -> None:
    fs, root = _resolved(out_dir)
    marker = root.rstrip("/") + "/_LATEST"
    tmp = marker + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(json.dumps({"batch_id": batch_id}).encode("utf-8"))
    fs.move(tmp, marker)


def _read_committed(
    spark: SparkSession,
    out_dir: str,
    table: str,
    last: int,
    keep_batch: bool = False,
) -> DataFrame | None:
    """All rows of ``table`` from committed batches (batch <= last);
    None when the store is empty. Orphans from a crashed batch have
    batch > last and are pruned at the partition level."""
    if last < 0:
        return None
    base = out_dir.rstrip("/") + f"/{table}"
    try:
        df = spark.read.option("basePath", base).parquet(base + "/batch=*")
    except Exception:
        return None
    df = df.where(F.col("batch") <= last)
    return df if keep_batch else df.drop("batch")


def _dedup_batch(batch: DataFrame, id_col: str) -> DataFrame:
    """One row per id within a micro-batch, deterministically: keep the
    lexicographically largest struct of the non-id columns (for the
    pages schema, whose first payload column is ``warc_ts``, that is
    the newest crawl). One map-side-combined groupBy, no window."""
    others = [c for c in batch.columns if c != id_col]
    if not others:
        return batch.distinct()
    packed = batch.groupBy(id_col).agg(F.max(F.struct(*others)).alias("_r"))
    return packed.select(
        id_col, *[F.col(f"_r.{c}").alias(c) for c in others]
    )


def _latest_rows(indexed: DataFrame, new_ids: DataFrame) -> DataFrame:
    """Supersede re-seen ids in a committed (…, id, batch) table:
    keep each id's newest committed batch, and drop ids re-signed by
    the CURRENT batch entirely (their fresh rows ride alongside).
    Cost: one partial-agg groupBy over the index's (id, batch) pairs
    plus two id-keyed joins — the same order as the candidate join
    that follows; a production deployment would fold this into the
    (band, bucket)-bucketed store compaction."""
    latest = indexed.groupBy("id").agg(F.max("batch").alias("batch"))
    return (
        indexed.join(latest, ["id", "batch"])
        .join(new_ids, "id", "left_anti")
        .drop("batch")
    )


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
) -> bool:
    """Index one micro-batch and emit its near-dup pairs; returns
    False for replays (batch_id <= last committed).

    Crash-safe order: sigs/buckets/pairs directories are written
    first (mode=overwrite, so a retried batch replaces its own
    orphans), the marker is swung last. id pairs are normalized
    (id_a < id_b) whichever side is older.
    """
    last = _latest(out_dir)
    if batch_id <= last:
        return False
    if batch.isEmpty():
        return False
    fs, root = _resolved(out_dir)
    fs.create_dir(root, recursive=True)

    batch = _dedup_batch(batch, id_col)
    sh = shingles(batch, id_col, text_col, n)
    sig_new = minhash_signatures(sh, num_hashes).persist()
    buckets_new = lsh_buckets(sig_new, bands, num_hashes).persist()
    new_ids = sig_new.select("id")

    # new vs new (within-batch)
    cand = lsh_candidate_pairs(buckets_new)
    sig_all = sig_new
    buckets_old = _read_committed(
        spark, out_dir, "buckets", last, keep_batch=True
    )
    if buckets_old is not None:
        buckets_old = _latest_rows(buckets_old, new_ids)
        nb = buckets_new.select(
            F.col("band").alias("b1"),
            F.col("bucket").alias("k1"),
            F.col("id").alias("id_n"),
        )
        ob = buckets_old.select(
            F.col("band").alias("b2"),
            F.col("bucket").alias("k2"),
            F.col("id").alias("id_o"),
        )
        cross = (
            nb.join(
                ob,
                (F.col("b1") == F.col("b2"))
                & (F.col("k1") == F.col("k2"))
                & (F.col("id_n") != F.col("id_o")),
            )
            .select(
                F.least("id_n", "id_o").alias("id_a"),
                F.greatest("id_n", "id_o").alias("id_b"),
            )
            .distinct()
        )
        cand = cand.unionByName(cross).distinct()
        sig_all = sig_new.unionByName(
            _latest_rows(
                _read_committed(
                    spark, out_dir, "sigs", last, keep_batch=True
                ),
                new_ids,
            )
        )

    pairs = signature_agreement_pairs(sig_all, cand, num_hashes).where(
        F.col("est_jaccard") >= threshold
    )
    prev_pairs = _read_committed(spark, out_dir, "pairs", last)
    if prev_pairs is not None:
        # emitted-exactly-once under re-crawls: a pair already flagged
        # in an earlier batch is not re-emitted when a re-crawl of one
        # side collides again
        pairs = pairs.join(
            prev_pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        )

    sig_new.write.mode("overwrite").parquet(
        out_dir.rstrip("/") + f"/sigs/batch={batch_id}"
    )
    buckets_new.write.mode("overwrite").parquet(
        out_dir.rstrip("/") + f"/buckets/batch={batch_id}"
    )
    pairs.write.mode("overwrite").parquet(
        out_dir.rstrip("/") + f"/pairs/batch={batch_id}"
    )
    _commit_marker(out_dir, batch_id)
    sig_new.unpersist()
    buckets_new.unpersist()
    return True


def read_pairs(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """(id_a, id_b, est_jaccard) across all COMMITTED batches."""
    return _read_committed(spark, out_dir, "pairs", _latest(out_dir))


def incremental_near_dups(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
    available_now: bool = True,
):
    """Stream ``pages_dir``/*.parquet into a persistent near-dup
    index at ``out_dir``. Returns the StreamingQuery (awaited when
    ``available_now``)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_batch(
            spark,
            batch,
            batch_id,
            out_dir,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()

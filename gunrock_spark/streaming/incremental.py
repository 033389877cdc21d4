"""Incremental link ingestion — Structured Streaming over arriving
pages, maintaining a stable url→id dictionary and an append-only
edge table.

The reference is batch-only (SURVEY.md §2.3: no streaming); this is
the engine's forward extension for continuously-crawled corpora: new
WARC partitions land in a directory, `readStream` picks them up, and
``foreachBatch`` runs the SAME batch extraction
(`ingest.links.extract_links`) plus a dictionary merge:

- existing urls keep their ids FOREVER (graph state snapshots stay
  valid across ingests — the checkpoint/resume contract extends to
  the growing graph);
- new urls get ids ``old_max + dense_rank(url)`` — deterministic for
  a given batch.

At 100 TB scale the dictionary is a |V|-sized table; the merge is one
left-anti join + one bounded sort per micro-batch, and the edge
append is partitioned parquet. Exactly-once comes from the streaming
checkpoint (source offsets) + idempotent per-batch overwrite of the
dictionary snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from gunrock_spark.ingest.links import extract_links

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def merge_dictionary(existing: DataFrame | None, new_urls: DataFrame) -> DataFrame:
    """Merge new urls into the dictionary, preserving existing ids.
    ``new_urls``: DataFrame[url]. Returns the full (url, v) table."""
    if existing is None:
        w = Window.orderBy("url")
        return new_urls.distinct().select(
            "url", (F.row_number().over(w) - 1).cast("long").alias("v")
        )
    fresh = new_urls.distinct().join(existing.select("url"), "url", "left_anti")
    base = existing.agg(F.coalesce(F.max("v"), F.lit(-1))).collect()[0][0]
    w = Window.orderBy("url")
    assigned = fresh.select(
        "url", (F.lit(base) + F.row_number().over(w)).cast("long").alias("v")
    )
    return existing.unionByName(assigned)


def _load_dictionary(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def incremental_link_ingestion(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start (and by default drain) a streaming ingestion:
    ``pages_dir``/*.parquet (north-rule page schema) → ``out_dir``/
    {dictionary, edges}. Returns the StreamingQuery (already awaited
    when ``available_now``)."""
    dict_path = os.path.join(out_dir, "dictionary")
    edges_path = os.path.join(out_dir, "edges")
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")

    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        links = batch.select(
            "url", F.explode(extract_links("html")).alias("target_url")
        ).persist()
        urls = links.select("url").unionByName(
            links.select(F.col("target_url").alias("url"))
        )
        merged = merge_dictionary(_load_dictionary(spark, dict_path), urls)
        # write via tmp + swap-read (parquet overwrite of a table we
        # are reading would clobber it mid-scan)
        tmp = dict_path + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        merged2 = spark.read.parquet(tmp)
        merged2.write.mode("overwrite").parquet(dict_path)
        try:  # local-fs tmp cleanup (object stores: lifecycle rule)
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        except Exception:
            pass
        dictionary = spark.read.parquet(dict_path)
        src_ids = dictionary.withColumnRenamed("v", "src")
        dst_ids = dictionary.select(
            F.col("url").alias("target_url"), F.col("v").alias("dst")
        )
        edges = (
            links.join(src_ids, "url")
            .join(dst_ids, "target_url")
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        edges.write.mode("append").parquet(edges_path)
        links.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def current_edges(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated (src, dst) table — cross-batch duplicates
    removed at read (batch-level dedup happens at write)."""
    return spark.read.parquet(os.path.join(out_dir, "edges")).dropDuplicates(
        ["src", "dst"]
    )

"""Graph I/O — Matrix Market ingest/export + EdgeTable snapshots.

Mirrors the reference's graphio surface (SURVEY.md §1.6):

- ``read_mtx`` ⇔ ``ReadMarketStream`` (gunrock/graphio/market.cuh:
  192-461): 1-based COO text; ``%%MatrixMarket ... symmetric``
  emits both directions (market.cuh:241-242,413-421); ``skew``
  negates the reverse value (market.cuh:206,243,421); missing edge
  values on a weighted read are filled deterministically with
  ``h60(src:dst) % 64`` — the reproducible analog of the reference's
  seeded ``rand() % 64`` (market.cuh:363).
- ``write_mtx`` ⇔ ``Csr::WriteToMtxFile`` (gunrock/csr.cuh:365-401).
- ``save_edge_table``/``load_edge_table`` ⇔ the binary CSR snapshot
  cache (write gunrock/csr.cuh:244-266, read :412-451): parse/clean
  once, reload partitioned+sorted without re-cleaning.

The .mtx text parse runs through Spark's distributed text reader —
comment/header lines are filtered per-partition, so a 100 GB .mtx
parses in parallel (the reference streams it single-threaded).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from gunrock_spark.functions.hashing import h60
from gunrock_spark.graph.edge_table import EdgeTable


def read_mtx(
    spark: SparkSession,
    path: str,
    weighted: bool | None = None,
    num_partitions: int | None = None,
) -> EdgeTable:
    """Parse a Matrix Market coordinate file into a cleaned EdgeTable.

    ``weighted=None`` auto-detects from the header (``pattern`` ⇒
    unweighted). Vertex ids are converted to 0-based longs."""
    header = spark.read.text(path).limit(1).collect()[0][0].lower()
    has_banner = header.startswith("%%matrixmarket")
    # headerless files (the reference's dataset/small/test_*.mtx ship
    # without a banner) are general; weight auto-detect from the body
    symmetric = has_banner and ("symmetric" in header or "skew" in header)
    skew = has_banner and "skew" in header

    lines = spark.read.text(path).where(
        ~F.col("value").startswith("%") & (F.trim("value") != "")
    )
    if weighted is None:
        if has_banner:
            weighted = "pattern" not in header
        else:
            sample = lines.limit(2).collect()
            weighted = len(sample) > 1 and len(sample[1][0].split()) >= 3
    # first non-comment line is the dims line "rows cols nnz" — drop
    # it by excluding the unique line with 3 fields equal to the dims.
    # Robust approach: zipWithIndex on the filtered lines.
    indexed = lines.rdd.zipWithIndex().toDF(["row", "idx"])
    body = indexed.where(F.col("idx") > 0).select(F.col("row.value").alias("value"))
    parts = F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
    parsed = body.select(
        (parts.getItem(0).cast("long") - 1).alias("src"),
        (parts.getItem(1).cast("long") - 1).alias("dst"),
        F.get(parts, 2).cast("double").alias("weight"),  # NULL when absent
    )
    if weighted:
        # fill missing values deterministically (reference: rand()%64
        # under a fixed seed, market.cuh:363)
        fill = (
            h60(F.concat_ws(":", F.col("src"), F.col("dst"))) % 64
        ).cast("double")
        parsed = parsed.withColumn("weight", F.coalesce("weight", fill))
        e = parsed.select("src", "dst", "weight")
        if symmetric:
            rev_w = F.when(F.lit(skew), -F.col("weight")).otherwise(F.col("weight"))
            e = e.unionByName(
                parsed.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    rev_w.alias("weight"),
                )
            )
        return EdgeTable.from_df(e, weight="weight", num_partitions=num_partitions)
    e = parsed.select("src", "dst")
    if symmetric:
        e = e.unionByName(parsed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return EdgeTable.from_df(e, num_partitions=num_partitions)


def read_snap_edges(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    num_partitions: int | None = None,
) -> EdgeTable:
    """Parse a SNAP-style edge list (the de-facto public graph
    interchange format: one ``src<ws>dst[<ws>weight]`` pair per line,
    ``#``-prefixed comment lines, arbitrary whitespace) into a cleaned
    EdgeTable. Vertex ids are taken as-is (SNAP files are 0- or
    1-based; the engine never assumes density). Fully distributed —
    the text scan parallelizes per HDFS/parquet-style split, no
    driver-side parsing."""
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    parts = F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
    parsed = lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        F.get(parts, 2).cast("double").alias("weight"),
    )
    if weighted:
        return EdgeTable.from_df(
            parsed.select("src", "dst", "weight"),
            weight="weight",
            num_partitions=num_partitions,
        )
    return EdgeTable.from_df(
        parsed.select("src", "dst"), num_partitions=num_partitions
    )


def write_snap_edges(graph: EdgeTable, path: str) -> None:
    """Write the cleaned edge set as a SNAP-style tab-separated edge
    list — ``src\\tdst`` per line, plus a third ``weight`` column when
    the graph is weighted (so a weighted write/read round-trip through
    :func:`read_snap_edges` is lossless). A DISTRIBUTED text write
    (one part file per partition, matching how multi-TB edge lists are
    actually shipped); no ``#`` comment header is emitted — a header
    line has no well-defined home across part files."""
    cols = [F.col("src"), F.col("dst")]
    if graph.weighted:
        cols.append(F.col("weight"))
    e = graph.edges.select(F.concat_ws("\t", *cols).alias("value"))
    e.write.mode("overwrite").text(path)


# Single-file text exports above this many lines refuse and point at
# the sharded writer: one writer task streaming 10^11 rows is not an
# export, it's a stall (VERDICT r4 #4).
MAX_SINGLE_FILE_ROWS = 100_000_000


def _guard_single_file(n_rows: int, what: str, sharded_fn: str) -> None:
    if n_rows > MAX_SINGLE_FILE_ROWS:
        raise ValueError(
            f"{what}: {n_rows} lines exceeds the single-file export "
            f"cap ({MAX_SINGLE_FILE_ROWS}); use {sharded_fn} (directory "
            "of range-ordered parts + manifest) for graphs this size"
        )


def _write_single_text(lines: DataFrame, path: str) -> None:
    """Write a (section int, k1 long, k2 long, line string) DataFrame
    as ONE sorted text file at ``path`` — a single-partition Spark
    text write plus a rename, never a driver-side collect: the export
    streams through one writer task instead of materializing every
    row in driver memory (the reference's writers are likewise
    single-stream, csr.cuh:333-401). Local/file:// paths only (these
    are interop text formats, not the engine's parquet snapshots)."""
    import glob
    import shutil

    local = path[len("file://"):] if path.startswith("file://") else path
    # absolutize BEFORE handing the tmp dir to the JVM writer: Spark's
    # JVM resolves relative paths against ITS cwd, while the glob/rename
    # below uses Python's — the same mismatch read_pages fixed (a
    # relative output path crashed on glob()[0] or wrote elsewhere)
    local = os.path.abspath(local)
    tmp = local + "._spark_tmp"
    (
        lines.repartition(1)
        .sortWithinPartitions("section", "k1", "k2")
        .select("line")
        .write.mode("overwrite")
        .text(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*"))[0]
    os.replace(part, local)
    shutil.rmtree(tmp, ignore_errors=True)


def _write_sharded_text(
    lines: DataFrame,
    path: str,
    num_shards: int,
    manifest_extra: dict | None = None,
) -> None:
    """Directory-of-parts export for graphs too large for one writer
    task: ``repartitionByRange`` over the same (section, k1, k2) sort
    key the single-file writer uses, sorted within each part — so
    concatenating the part files in filename order reproduces the
    single-file byte stream exactly (part-00000 holds the lowest key
    range). A ``_MANIFEST.json`` records the shard count, format, and
    any caller metadata; readers and shippers iterate parts
    independently — the 10^11-edge export path."""
    (
        lines.repartitionByRange(num_shards, "section", "k1", "k2")
        .sortWithinPartitions("section", "k1", "k2")
        .select("line")
        .write.mode("overwrite")
        .text(path)
    )
    manifest = {
        "format_version": 1,
        "num_shards": num_shards,
        "ordered_by": ["section", "k1", "k2"],
        "concat_in_filename_order": True,
    }
    manifest.update(manifest_extra or {})
    # same pyarrow-fs resolution as the CSR block store, so an
    # hdfs://... or s3://... export gets its manifest on THAT
    # filesystem, not the driver's local disk
    from gunrock_spark.engine.csr_blocks import _resolve_fs

    fs, root = _resolve_fs(path)
    with fs.open_output_stream(root.rstrip("/") + "/_MANIFEST.json") as f:
        f.write(json.dumps(manifest).encode("utf-8"))


def write_mtx_sharded(
    graph: EdgeTable, path: str, num_shards: int | None = None
) -> None:
    """Sharded :func:`write_mtx`: ``path`` becomes a DIRECTORY of
    range-ordered part files plus ``_MANIFEST.json``; concatenating
    the parts in filename order yields the exact single-file .mtx."""
    spark = graph.edges.sparkSession
    if num_shards is None:
        num_shards = spark.sparkContext.defaultParallelism
    m = graph.num_edges()
    max_id = graph.vertices.agg(F.max("v")).collect()[0][0] or 0
    dims = max_id + 1
    kind = "real" if graph.weighted else "pattern"
    header = spark.createDataFrame(
        [
            (0, 0, 0, f"%%MatrixMarket matrix coordinate {kind} general"),
            (0, 0, 1, f"{dims} {dims} {m}"),
        ],
        schema="section int, k1 long, k2 long, line string",
    )
    cols = [
        (F.col("src") + 1).cast("string"),
        (F.col("dst") + 1).cast("string"),
    ]
    if graph.weighted:
        cols.append(F.col("weight").cast("string"))
    body = graph.edges.select(
        F.lit(1).alias("section"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
        F.concat_ws(" ", *cols).alias("line"),
    )
    _write_sharded_text(
        header.unionByName(body),
        path,
        num_shards,
        {"format": "mtx", "dims": dims, "num_edges": m, "kind": kind},
    )


def write_mtx(graph: EdgeTable, path: str) -> None:
    """Export as 1-based Matrix Market coordinate text (general
    symmetry — the cleaned table is directional), single file, edges
    sorted by (src, dst). Distributed pipeline + one writer task; no
    driver collect (Csr::WriteToMtxFile analog, gunrock/csr.cuh:
    365-401)."""
    spark = graph.edges.sparkSession
    m = graph.num_edges()
    _guard_single_file(m + 2, "write_mtx", "write_mtx_sharded")
    max_id = graph.vertices.agg(F.max("v")).collect()[0][0] or 0
    dims = max_id + 1  # ids are dense-or-sparse longs; matrix dim = max+1
    kind = "real" if graph.weighted else "pattern"
    header = spark.createDataFrame(
        [
            (0, 0, 0, f"%%MatrixMarket matrix coordinate {kind} general"),
            (0, 0, 1, f"{dims} {dims} {m}"),
        ],
        schema="section int, k1 long, k2 long, line string",
    )
    cols = [
        (F.col("src") + 1).cast("string"),
        (F.col("dst") + 1).cast("string"),
    ]
    if graph.weighted:
        cols.append(F.col("weight").cast("string"))
    body = graph.edges.select(
        F.lit(1).alias("section"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
        F.concat_ws(" ", *cols).alias("line"),
    )
    _write_single_text(header.unionByName(body), path)


def save_edge_table(graph: EdgeTable, path: str) -> None:
    """Snapshot the CLEANED edge table + metadata (the binary CSR
    cache analog): reload skips the clean/dedup pass."""
    graph.edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    graph.degrees.write.mode("overwrite").parquet(os.path.join(path, "degrees"))
    meta = {
        "weighted": graph.weighted,
        "num_edges": graph.num_edges(),
        "num_vertices": graph.num_vertices(),
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_edge_table(
    spark: SparkSession, path: str, num_partitions: int | None = None
) -> EdgeTable:
    """Reload a snapshot written by :func:`save_edge_table` — already
    clean, so no re-cleaning (csr.cuh:412-451 fast path)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    e = spark.read.parquet(os.path.join(path, "edges"))
    if num_partitions:
        e = e.repartition(num_partitions, "src").sortWithinPartitions("src")
    g = EdgeTable(e.persist(), weighted=meta["weighted"])
    g._num_edges = meta["num_edges"]
    g._num_vertices = meta["num_vertices"]
    g._degrees = spark.read.parquet(os.path.join(path, "degrees")).persist()
    return g


def write_ligra_adj(graph: EdgeTable, path: str) -> None:
    """Export as a Ligra AdjacencyGraph text file (the reference's
    Csr::WriteToLigraFile, gunrock/csr.cuh:333-363): header, n, m,
    n row-offsets, m column indices (CSR order: dst sorted within
    src). Offsets are a running degree sum computed in the same
    single writer partition the text write already needs — the export
    streams; nothing is collected to the driver."""
    from pyspark.sql import Window

    spark = graph.edges.sparkSession
    n = (graph.vertices.agg(F.max("v")).collect()[0][0] or 0) + 1
    m = graph.num_edges()
    _guard_single_file(n + m + 3, "write_ligra_adj", "write_ligra_adj_sharded")
    header = spark.createDataFrame(
        [(0, 0, 0, "AdjacencyGraph"), (0, 0, 1, str(n)), (0, 0, 2, str(m))],
        schema="section int, k1 long, k2 long, line string",
    )
    out_deg = graph.edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    dense = spark.range(n).select(F.col("id").alias("v"))
    # exclusive prefix sum over the dense 0..n-1 vertex range; the
    # global window is one |V|-row task — the same task the
    # single-file write serializes through anyway (export utility)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        dense.join(out_deg, "v", "left")
        .select("v", F.coalesce("deg", F.lit(0)).alias("deg"))
        .select(
            F.lit(1).alias("section"),
            F.col("v").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.coalesce(F.sum("deg").over(w), F.lit(0)).cast("string").alias("line"),
        )
    )
    cols = graph.edges.select(
        F.lit(2).alias("section"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
        F.col("dst").cast("string").alias("line"),
    )
    _write_single_text(header.unionByName(offsets).unionByName(cols), path)


def write_ligra_adj_sharded(
    graph: EdgeTable, path: str, num_shards: int | None = None
) -> None:
    """Sharded :func:`write_ligra_adj`: directory of range-ordered
    parts + ``_MANIFEST.json``; concatenating parts in filename order
    reproduces the single-file AdjacencyGraph byte stream. Unlike the
    single-file path, the row offsets come from the DISTRIBUTED
    two-level scan (pipeline/packing.py ``doc_offsets``) instead of a
    one-task global window, so the export scales with the cluster."""
    from gunrock_spark.pipeline.packing import doc_offsets

    spark = graph.edges.sparkSession
    if num_shards is None:
        num_shards = spark.sparkContext.defaultParallelism
    n = (graph.vertices.agg(F.max("v")).collect()[0][0] or 0) + 1
    m = graph.num_edges()
    header = spark.createDataFrame(
        [(0, 0, 0, "AdjacencyGraph"), (0, 0, 1, str(n)), (0, 0, 2, str(m))],
        schema="section int, k1 long, k2 long, line string",
    )
    out_deg = graph.edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    dense = spark.range(n).select(F.col("id").alias("v"))
    counts = dense.join(out_deg, "v", "left").select(
        "v", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    offsets = doc_offsets(counts, id_col="v").select(
        F.lit(1).alias("section"),
        F.col("v").alias("k1"),
        F.lit(0).cast("long").alias("k2"),
        F.col("start").cast("string").alias("line"),
    )
    cols = graph.edges.select(
        F.lit(2).alias("section"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
        F.col("dst").cast("string").alias("line"),
    )
    _write_sharded_text(
        header.unionByName(offsets).unionByName(cols),
        path,
        num_shards,
        {"format": "ligra-adj", "n": n, "m": m},
    )


def read_ligra_adj(
    spark: SparkSession, path: str, num_partitions: int | None = None
) -> EdgeTable:
    """Parse a Ligra AdjacencyGraph text file (the inverse of
    :func:`write_ligra_adj`; format: header line, n, m, n row-offsets,
    m column indices) into a cleaned EdgeTable.

    Scale shape: line numbering via one ``zipWithIndex`` pass (the
    read_mtx ingest pattern), then each vertex's offset interval is
    EXPLODED into (position, src) rows — total m rows, linear — and
    equi-joined to the column-index rows on position. No range join,
    no driver-side adjacency materialization."""
    lines = (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .rdd.zipWithIndex()
        .toDF(["row", "idx"])
        .select(F.trim(F.col("row.value")).alias("value"), "idx")
    )
    lines = lines.persist()
    try:
        head = {
            int(r["idx"]): r["value"] for r in lines.where(F.col("idx") < 3).collect()
        }
        if head.get(0) != "AdjacencyGraph":
            raise ValueError(f"not a Ligra AdjacencyGraph file: {path}")
        n, m = int(head[1]), int(head[2])
        offsets = lines.where(
            (F.col("idx") >= 3) & (F.col("idx") < 3 + n)
        ).select(
            (F.col("idx") - 3).alias("v"), F.col("value").cast("long").alias("off")
        )
        # degree via the NEXT vertex's offset — an equi-join on v+1,
        # not a global window; the last vertex's interval ends at m
        nxt = offsets.select(
            (F.col("v") - 1).alias("v"), F.col("off").alias("next_off")
        )
        spans = (
            offsets.join(nxt, "v", "left")
            .select(
                "v", "off", F.coalesce("next_off", F.lit(int(m))).alias("next_off")
            )
            .where(F.col("next_off") > F.col("off"))
        )
        positions = spans.select(
            F.col("v").alias("src"),
            F.explode(
                F.sequence(F.col("off"), F.col("next_off") - 1)
            ).alias("p"),
        )
        targets = lines.where(F.col("idx") >= 3 + n).select(
            (F.col("idx") - 3 - n).alias("p"), F.col("value").cast("long").alias("dst")
        )
        e = positions.join(targets, "p").select("src", "dst")
        return EdgeTable.from_df(e, num_partitions=num_partitions)
    finally:
        lines.unpersist()


def save_edge_table_clustered(
    graph: EdgeTable,
    labels: DataFrame,
    path: str,
    num_buckets: int = 64,
) -> None:
    """Community-bucketed edge store — the Spark-native analog of the
    reference's cluster/METIS partitioners (gunrock/app/cp/
    cp_partitioner.cuh, app/metisp/metis_partitioner.cuh): edges land
    in the bucket of their SOURCE vertex's community label, so most
    intra-community edges share a bucket directory.

    ``labels`` is any (v, label) table (connected-components or
    label-propagation output). Physical layout: parquet
    ``partitionBy("cbucket")`` with ``cbucket = pmod(hash(label),
    num_buckets)`` — bounded directory count regardless of community
    count, and a reader restricted to one community touches
    ~1/num_buckets of the files via partition pruning (plus the label
    filter pushed to the remaining parquet). Community-restricted
    analytics (induced-subgraph queries, per-community modularity/TC)
    scan a fraction of the store instead of all of it; that is the
    locality the reference's cluster partitioner buys, re-expressed
    as storage pruning rather than GPU placement."""
    lab = labels.select(F.col("v").alias("src"), F.col("label"))
    cols = ["src", "dst"] + (["weight"] if graph.weighted else [])
    (
        graph.edges.join(lab, "src", "left")
        .select(
            *cols,
            F.coalesce("label", F.lit(-1)).alias("label"),
            F.pmod(F.hash(F.coalesce("label", F.lit(-1))), F.lit(num_buckets)).alias(
                "cbucket"
            ),
        )
        .repartition(num_buckets, "cbucket")
        .write.mode("overwrite")
        .partitionBy("cbucket")
        .parquet(path)
    )


def read_clustered_edges(
    spark: SparkSession,
    path: str,
    community: int | None = None,
    num_buckets: int = 64,
) -> DataFrame:
    """Read a clustered edge store; ``community`` restricts to one
    community's out-edges — the cbucket predicate prunes whole
    partition directories BEFORE the scan and the label equality is
    pushed into the remaining parquet footers. ``num_buckets`` must
    match the value used at save time."""
    df = spark.read.parquet(path)
    if community is not None:
        from pyspark.sql import Row

        bucket = (
            spark.createDataFrame([Row(label=int(community))])
            .select(F.pmod(F.hash("label"), F.lit(num_buckets)).alias("b"))
            .collect()[0]["b"]
        )
        df = df.where((F.col("cbucket") == int(bucket)) & (F.col("label") == community))
    return df


def save_edge_table_bucketed(
    graph: EdgeTable,
    table: str,
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Hive-bucketed edge store: ``bucketBy(num_buckets, src) +
    sortBy(src)`` via ``saveAsTable`` — the storage-level twin of
    EdgeTable's in-memory CSR-analog layout (hash-partition by src,
    sort within partitions). A table read back from this store
    carries its bucketing spec into the physical plan, so EVERY
    src-keyed aggregation and EVERY src-src self-join over it runs
    WITHOUT an Exchange on the bucketed side(s) — the shuffle is paid
    once at write time and amortized over every later job, exactly
    the co-located-join layout a standing 100 TB edge table should
    ship in (the plan gate in tests/test_plans.py asserts the absent
    Exchange). ``path`` makes it an external table (tests use a tmp
    dir); bucket count should match the cluster's target parallelism
    class, not the data size."""
    cols = ["src", "dst"] + (["weight"] if graph.weighted else [])
    writer = (
        graph.edges.select(*cols)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "src")
        .sortBy("src")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed edge store — MUST go through the catalog
    (``spark.table``), not ``read.parquet``: only the catalog carries
    the bucketing spec that lets the planner drop the Exchange."""
    return spark.table(table)

"""Per-partition CSR-block gather-scatter — the Arrow/pandas physical
strategy for the advance+reduce pattern.

The reference's advance kernels gather per-src state and scatter
per-dst partial sums inside one GPU block over a CSR slice
(gunrock/oprtr/edge_map_partitioned/kernel.cuh:514; fused reduce
oprtr/advance/kernel_policy.cuh:81-98). The Spark analog:

  1. BUILD (once per graph): assign every edge to a block
     ``pmod(hash(src), P)``, write one Parquet file per block
     (``partitionBy("block")``), sorted by src — the CSR slices.
  2. PER ITERATION: group the |V|-row state by the same block hash
     and ``applyInPandas``. Each call reads its CSR slice from the
     block store — once: a worker-local cache keyed (path, block)
     keeps the decoded numpy arrays across iterations (Spark reuses
     Python workers by default), so after iteration 1 only the state
     rows cross the Arrow boundary. This is the part a naive
     cogroup(edges, state) design gets wrong: it re-transfers all
     |E| edges JVM→Python every iteration (measured 3x slower than
     the JVM join at 33M edges).
  3. Inside a block: vectorized gather (C-speed hash merge of state
     onto edge srcs) + scatter (per-dst partial sum) — no per-row
     Python. The per-block partials (bounded by distinct dsts per
     block) shuffle once for the final ``groupBy(dst).sum`` — the
     map-side combine of the join strategy, made explicit.

On a real cluster the block store must live on storage all executors
see (HDFS/S3/alluxio — the same place the edge table already lives);
in local mode any tmp dir works. ``pagerank(..., impl="blocks")``
selects this path; results are identical to the join implementation
up to float64 summation-order ULP noise.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import pandas as pd

from pyspark.sql import DataFrame, functions as F


class LRUBytesCache:
    """Byte-bounded LRU for worker-local decoded block slices.

    The r1/r2 design cached every slice a worker ever touched, so a
    long-lived Python worker could eventually hold all P slices of a
    graph (~half the edge set) — the residency assumption that capped
    triangle counting at AUTO_BLOCKS_MAX_EDGES (VERDICT r2 #1). But
    residency-of-all-P was only ever a cache POLICY: each blocks task
    needs just the one or two slices it is processing, so bounding the
    cache in bytes and refetching evicted slices from the block store
    turns per-worker memory from O(|E|) into O(budget + 2 slices) —
    correctness is untouched, only refetch I/O changes.

    Keys are (store_path, block, kind); values any object with a
    caller-supplied byte size. Budget comes from
    ``SPARK_GRAFT_BLOCK_CACHE_MB`` (read per put, so one process can
    change it between runs; default 512 MB per worker — local[32]
    worst-cases at ~16 GB of slice cache on the 128 GiB sandbox, and
    on a real cluster the budget rides executor memory). Eviction is
    least-recently-used; a single entry larger than the whole budget
    stays resident while it is the most recent (the task that loaded
    it still needs it) and is dropped on the next insert.
    """

    def __init__(self) -> None:
        self._entries: OrderedDict = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    @staticmethod
    def budget_bytes() -> int:
        return int(float(os.environ.get("SPARK_GRAFT_BLOCK_CACHE_MB", "512")) * 1e6)

    def get(self, key):
        entry = self._entries.get(key)
        if entry is None:
            self.misses += 1
            return None
        self._entries.move_to_end(key)
        self.hits += 1
        return entry[0]

    def put(self, key, value, nbytes: int) -> None:
        if key in self._entries:
            self._bytes -= self._entries.pop(key)[1]
        self._entries[key] = (value, int(nbytes))
        self._bytes += int(nbytes)
        budget = self.budget_bytes()
        while self._bytes > budget and len(self._entries) > 1:
            _, (_, b) = self._entries.popitem(last=False)
            self._bytes -= b
            self.evictions += 1

    def evict_other_stores(self, store_path: str) -> None:
        """Drop slices of other (older) block stores: a new build
        always writes a new path, so foreign-path entries are dead."""
        for k in [k for k in self._entries if k[0] != store_path]:
            self._bytes -= self._entries.pop(k)[1]
            self.evictions += 1

    @property
    def total_bytes(self) -> int:
        return self._bytes

    def __len__(self) -> int:
        return len(self._entries)


# worker-local slice cache shared by every blocks-strategy consumer:
# (store_path, block, "frame") -> pandas DataFrame[src, dst] (the
# gather-scatter path) and (store_path, block, "csr") -> numpy CSR
# triple (the triangle-count path). Lives for the life of the Python
# worker process; a store is immutable once written (build-once
# contract, unique uuid path per build), so entries never go stale —
# they are evicted only by the byte budget or by a newer store path.
_BLOCK_CACHE = LRUBytesCache()


def _resolve_fs(store_path: str):
    """(pyarrow FileSystem, fs-local path) for a block-store root.

    Plain local paths use LocalFileSystem; scheme'd URIs (hdfs://,
    s3://, file://, ...) resolve through pyarrow.fs.FileSystem.from_uri
    so the CLUSTER deployment documented in the module docstring
    (shared HDFS/S3 store via SPARK_GRAFT_BLOCK_STORE) actually reads
    its blocks instead of falling into a missing-local-dir branch and
    silently returning empty frames. Unsupported schemes FAIL here —
    loudly — rather than producing all-zero gather results."""
    from pyarrow import fs as pafs

    if "://" in store_path:
        try:
            return pafs.FileSystem.from_uri(store_path)
        except Exception as exc:
            raise RuntimeError(
                f"block store root {store_path!r} carries a URI scheme that "
                f"pyarrow.fs cannot open ({exc}); use a local path or an "
                f"hdfs://-/s3://-style URI pyarrow supports"
            ) from exc
    return pafs.LocalFileSystem(), store_path


def build_block_store(edges: DataFrame, num_blocks: int, path: str) -> str:
    """Write the CSR-slice block store: one Parquet directory per
    ``block = pmod(hash(src), num_blocks)``, each sorted by src.
    Returns ``path``. Build once per graph (the COO→CSR analog,
    gunrock/csr.cuh:534-697). ``path`` must be readable by
    :func:`_resolve_fs` on every executor — validated up front so a
    bad scheme fails at build time, not as silent empty reads."""
    _resolve_fs(path)  # fail fast on unreadable schemes
    (
        edges.select(
            "src", "dst", F.pmod(F.hash("src"), F.lit(num_blocks)).alias("block")
        )
        .repartition(num_blocks, "block")
        .sortWithinPartitions("src")
        .write.mode("overwrite")
        .partitionBy("block")
        .parquet(path)
    )
    return path


def remove_block_store(path: str, store_path: str | None = None) -> None:
    """Best-effort recursive delete of a block store (driver-side
    cleanup of the per-run uuid subdirectory) and of THIS node's
    shared decoded-slice cache for it (on a multi-node cluster each
    node's scratch is cleaned by its own TTL policy — the cache dir
    is keyed by the store's uuid path, so a deleted store's slices
    are dead files, never wrong ones). ``path`` may be the store's
    PARENT temp dir; pass the uuid'd ``store_path`` too so the shm
    cache key (hashed from the store path workers actually read)
    resolves to the dir the workers published into."""
    try:
        filesystem, root = _resolve_fs(path)
        filesystem.delete_dir(root)
    except Exception:
        pass
    for p in {path, store_path or path}:
        d = _shm_store_dir(p)
        if d is not None:
            import shutil

            shutil.rmtree(d, ignore_errors=True)


def _shm_store_dir(store_path: str) -> str | None:
    """Node-local SHARED decoded-slice cache root for one block store,
    or None when disabled (``SPARK_GRAFT_SLICE_SHM_DIR=""``).

    Why this exists: the in-process LRU is private to each Python
    worker, so at local[32] (or 32 executor cores per node) the same
    slice is parquet-decoded up to 32×. Measured at rmat22/32 blocks:
    the TC pair stage spent 5.9k core-seconds decoding vs 2.0k
    computing, making 32 cores SLOWER than 8 (BENCH.md §3k-r5).
    Decoded slices are immutable numpy arrays, so they are published
    once per node as .npy files in tmpfs (/dev/shm when present) and
    every worker mmaps them — the kernel page cache shares one copy
    machine-wide, and eviction is the kernel's problem, not a
    per-process byte budget."""
    base = os.environ.get("SPARK_GRAFT_SLICE_SHM_DIR")
    if base == "":
        return None
    if base is None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        if base is None:
            import tempfile

            base = tempfile.gettempdir()
    import hashlib

    key = hashlib.sha1(store_path.encode()).hexdigest()[:16]
    return os.path.join(base, "gunrock_csr", key)


_SHM_ARRAYS = ("verts", "indptr", "dsts")

# --- store-level int32 marker -------------------------------------------
# Written by the DRIVER (after the store build, before any task reads a
# slice) when every vertex id of the graph fits int32. Consumers that
# decode slices into numpy (the TC intersection kernels) then halve
# their memory traffic by downcasting ids — a graph-GLOBAL decision,
# never per-slice, because probe ids from OTHER blocks must also fit.
# At 10^12-page scale ids exceed int32 and the marker is simply absent.

_INT32_MARKER = "_IDS_FIT_INT32"
_INT32_STORES: dict[str, bool] = {}


def mark_store_int32(store_path: str) -> None:
    """Driver-side: record that every vertex id in this store's graph
    fits int32 (one tiny marker file beside the block directories).
    ``SPARK_GRAFT_TC_INT32=0`` suppresses the marker (A/B switch)."""
    if os.environ.get("SPARK_GRAFT_TC_INT32", "1") == "0":
        return
    filesystem, root = _resolve_fs(store_path)
    with filesystem.open_output_stream(
        root.rstrip("/") + "/" + _INT32_MARKER
    ) as f:
        f.write(b"1")
    _INT32_STORES[store_path] = True


def store_ids_fit_int32(store_path: str) -> bool:
    """Worker-side: does the store carry the int32 marker? Checked
    once per store per process (uuid'd store paths are never reused)."""
    cached = _INT32_STORES.get(store_path)
    if cached is None:
        from pyarrow import fs as pafs

        try:
            filesystem, root = _resolve_fs(store_path)
            info = filesystem.get_file_info(
                root.rstrip("/") + "/" + _INT32_MARKER
            )
            cached = info.type == pafs.FileType.File
        except Exception:
            cached = False
        _INT32_STORES[store_path] = cached
    return cached


def shared_arrays_get(store_path: str, block: int, kind: str, names):
    """Mmap a published array set from the node-shared cache, or None.
    The ``_OK`` marker is written last (after atomic renames), so a
    present marker implies complete, immutable arrays."""
    import numpy as np

    d = _shm_store_dir(store_path)
    if d is None:
        return None
    bdir = os.path.join(d, f"{kind}{block}")
    if not os.path.exists(os.path.join(bdir, "_OK")):
        return None
    try:
        return tuple(
            np.load(os.path.join(bdir, f"{name}.npy"), mmap_mode="r")
            for name in names
        )
    except Exception:
        return None


def shared_arrays_put(store_path: str, block: int, kind: str, names, arrays) -> None:
    """Publish a decoded array set to the node-shared cache:
    write-to-temp + atomic rename per array, ``_OK`` marker last.
    A non-blocking flock elides duplicate builds — a loser neither
    waits nor writes (its in-memory copy serves the current task).
    Sets above ``SPARK_GRAFT_SHM_SLICE_MAX_MB`` (default 1024) are
    not published so tmpfs cannot be flooded by one huge block."""
    import numpy as np

    d = _shm_store_dir(store_path)
    if d is None:
        return
    cap = float(os.environ.get("SPARK_GRAFT_SHM_SLICE_MAX_MB", "1024")) * 1e6
    if sum(int(a.nbytes) for a in arrays) > cap:
        return
    bdir = os.path.join(d, f"{kind}{block}")
    if os.path.exists(os.path.join(bdir, "_OK")):
        return
    try:
        import fcntl

        os.makedirs(bdir, exist_ok=True)
        lock_path = os.path.join(bdir, "_LOCK")
        with open(lock_path, "w") as lock:
            try:
                fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                return  # another worker is publishing this slice
            if os.path.exists(os.path.join(bdir, "_OK")):
                return
            pid = os.getpid()
            for name, arr in zip(names, arrays):
                tmp = os.path.join(bdir, f".{name}.{pid}.npy")
                np.save(tmp, np.ascontiguousarray(arr))
                os.replace(tmp, os.path.join(bdir, f"{name}.npy"))
            marker = os.path.join(bdir, f"._OK.{pid}")
            with open(marker, "w"):
                pass
            os.replace(marker, os.path.join(bdir, "_OK"))
    except Exception:
        return  # shared cache is an optimization, never a failure


def shared_csr_get(store_path: str, block: int):
    """Mmap a published CSR slice (verts, indptr, dsts), or None."""
    return shared_arrays_get(store_path, block, "b", _SHM_ARRAYS)


def shared_csr_put(store_path: str, block: int, csr) -> None:
    """Publish a decoded CSR slice to the node-shared cache."""
    shared_arrays_put(store_path, block, "b", _SHM_ARRAYS, csr)


def _read_block(store_path: str, block: int) -> pd.DataFrame:
    """Uncached read of one CSR slice (DataFrame[src, dst], sorted by
    src as written). A block with no edges legitimately has no
    directory (partitionBy writes only non-empty partitions)."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    filesystem, root = _resolve_fs(store_path)
    block_dir = root.rstrip("/") + f"/block={block}"
    info = filesystem.get_file_info(block_dir)
    if info.type == pafs.FileType.Directory:
        return pq.read_table(
            block_dir, columns=["src", "dst"], filesystem=filesystem
        ).to_pandas()
    return pd.DataFrame(
        {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
    )


def _load_block(store_path: str, block: int) -> pd.DataFrame:
    """One edge frame (DataFrame[src, dst]) for a block, LRU-cached,
    decoded from parquet on a miss.

    Deliberately NOT routed through the node-shared slice cache that
    rescued the TC pair stage (BENCH.md §3k-r5): gather-scatter runs
    ONE task per block per iteration, so the decode volume is tiny
    (~|P| loads/iteration, ≈2.5 s of 32-core wall over 5 iterations
    at rmat22) and alternating fresh-JVM A/Bs at 5 AND 30 iterations
    measured the shm route neutral-to-slower (30-iter cells: parquet
    39.6–54.0 s vs shm 49.2–79.0 s — the tmpfs publish + mmap-copy
    overheads exceed the parquet decode it avoids at this task
    granularity). The TC path keeps the shared cache: its 1024
    (pair × salt) tasks per job re-touch slices ~64× each, a decode
    volume two orders of magnitude larger."""
    key = (store_path, block, "frame")
    cached = _BLOCK_CACHE.get(key)
    if cached is None:
        _BLOCK_CACHE.evict_other_stores(store_path)
        cached = _read_block(store_path, block)
        _BLOCK_CACHE.put(key, cached, int(cached.memory_usage(index=False).sum()))
    return cached


def gather_scatter_sums(
    store_path: str,
    state: DataFrame,
    value_col: str,
    num_blocks: int,
) -> DataFrame:
    """One advance+partial-reduce over the CSR block store: for each
    edge (src, dst) gather ``state[value_col]`` at src, partially sum
    per (block, dst), then globally sum per dst.
    ``state`` needs columns (v, ``value_col``). Returns
    DataFrame[dst, msg]."""

    def block_fn(key: tuple, sdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"dst": pd.Series(dtype="int64"), "msg": pd.Series(dtype="float64")}
        )
        if len(sdf) == 0:
            return empty
        edf = _load_block(store_path, int(key[0]))
        if len(edf) == 0:
            return empty
        joined = edf.merge(
            sdf.rename(columns={"v": "src"})[["src", value_col]],
            on="src",
            how="inner",
        )
        if len(joined) == 0:
            return empty
        partial = joined.groupby("dst", sort=False)[value_col].sum().reset_index()
        partial.columns = ["dst", "msg"]
        return partial

    sb = state.select(
        "v",
        F.col(value_col).alias(value_col),
        F.pmod(F.hash("v"), F.lit(num_blocks)).alias("block"),
    )
    partials = sb.groupby("block").applyInPandas(
        block_fn, schema="dst long, msg double"
    )
    return partials.groupBy("dst").agg(F.sum("msg").alias("msg"))

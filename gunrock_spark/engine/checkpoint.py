"""Resumable per-iteration state checkpoints with lineage + metrics.

The Spark analog of the reference's binary CSR snapshot cache
(gunrock/csr.cuh:244-266,412-451) applied to *iteration state*: each
checkpoint is a Parquet snapshot of the vertex-state DataFrame plus a
JSON manifest (iteration number, config hash, per-iteration metrics
lineage). A ``_LATEST`` pointer file names the newest complete
snapshot; a killed job resumes from it.

The checkpoint root may be any Hadoop-filesystem URI (hdfs://,
s3a://, file:// or a bare local path): the state parquet always goes
through Spark's Hadoop FS, and the manifest/pointer files use the
same FileSystem API when the root carries a scheme (plain ``open``
for bare local paths).

Crash-safety contract (ordering, not filesystem atomicity): state
parquet is written first, then its manifest, then the pointer — so
ANY manifest on disk references a complete snapshot. Local roots flip
the pointer with tmp + ``os.replace`` (atomic on POSIX); remote roots
overwrite-create it in one call (no delete-then-rename window — a
FileSystem.rename returning false would otherwise silently lose the
pointer). If the pointer is missing or torn anyway (e.g. a crash
mid-create on an object store), ``latest_iteration`` falls back to
scanning ``manifest_iter_*.json`` and resumes from the newest one —
the worst case is resuming from the previous snapshot, never a
corrupt one.

At 100 TB scale the state table is |V|-sized (orders of magnitude
smaller than the edge table), so a per-iteration Parquet write is cheap
relative to the per-iteration shuffle — and it doubles as the lineage
cut that keeps Catalyst plans from growing exponentially across
iterations.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession


def _is_remote(path: str) -> bool:
    return "://" in path and not path.startswith("file://")


class _HadoopFS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem for the
    manifest/pointer small-file I/O (state parquet uses Spark's own
    writers)."""

    def __init__(self, spark: SparkSession, root: str):
        self._jvm = spark._jvm
        jpath = self._jvm.org.apache.hadoop.fs.Path(root)
        self._fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str | None:
        p = self._p(path)
        if not self._fs.exists(p):
            return None
        stream = self._fs.open(p)
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")

    def glob_paths(self, pattern: str) -> list[str]:
        statuses = self._fs.globStatus(self._p(pattern))
        if statuses is None:
            return []
        return [s.getPath().toString() for s in statuses]


class CheckpointManager:
    def __init__(self, root: str, config: dict | None = None):
        self.root = root
        self.config = config or {}
        self.config_hash = hashlib.sha256(
            json.dumps(self.config, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]
        self._remote = _is_remote(root)
        if not self._remote:
            os.makedirs(self._local(root), exist_ok=True)

    @staticmethod
    def _local(path: str) -> str:
        return path[len("file://"):] if path.startswith("file://") else path

    def _join(self, name: str) -> str:
        return self.root.rstrip("/") + "/" + name

    # -- paths ---------------------------------------------------------
    def _state_path(self, iteration: int) -> str:
        return self._join(f"state_iter_{iteration:06d}")

    def _manifest_path(self, iteration: int) -> str:
        return self._join(f"manifest_iter_{iteration:06d}.json")

    @property
    def _latest_path(self) -> str:
        return self._join("_LATEST")

    # -- small-file I/O (scheme-aware) ----------------------------------
    def _write_text(self, spark: SparkSession, path: str, text: str) -> None:
        if self._remote:
            _HadoopFS(spark, self.root).write_text(path, text)
        else:
            with open(self._local(path), "w") as f:
                f.write(text)

    def _read_text(self, spark: SparkSession | None, path: str) -> str | None:
        if self._remote:
            if spark is None:
                spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "reading a remote checkpoint manifest needs an active SparkSession"
                )
            return _HadoopFS(spark, self.root).read_text(path)
        try:
            with open(self._local(path)) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def _flip_pointer(self, spark: SparkSession, iteration: int) -> None:
        if self._remote:
            # Single overwrite-create: never a window with no pointer.
            # A torn write is healed by the manifest-scan fallback.
            _HadoopFS(spark, self.root).write_text(
                self._latest_path, str(iteration)
            )
        else:
            tmp = self._latest_path + ".tmp"
            with open(self._local(tmp), "w") as f:
                f.write(str(iteration))
            os.replace(self._local(tmp), self._local(self._latest_path))

    def _manifest_iterations(self, spark: SparkSession | None) -> list[int]:
        """Iterations with a manifest on disk (every manifest references
        a complete snapshot, by write ordering). Sorted ascending."""
        import re

        pattern = self._join("manifest_iter_*.json")
        if self._remote:
            if spark is None:
                spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "scanning a remote checkpoint root needs an active SparkSession"
                )
            names = _HadoopFS(spark, self.root).glob_paths(pattern)
        else:
            import glob

            names = glob.glob(self._local(pattern))
        its = []
        for n in names:
            # \d+ (not \d{6}): the :06d zero-padding grows past six
            # digits at iteration >= 1,000,000; such manifests must
            # stay visible to the pointer-loss healing scan.
            m = re.search(r"manifest_iter_(\d+)\.json$", n)
            if m:
                its.append(int(m.group(1)))
        return sorted(its)

    # -- save / load ---------------------------------------------------
    def save(self, state: DataFrame, iteration: int, metrics: list[dict]) -> DataFrame:
        """Write state + manifest; returns the re-read (lineage-free)
        DataFrame so callers continue from the snapshot, not the plan."""
        spark = state.sparkSession
        path = self._state_path(iteration)
        state.write.mode("overwrite").parquet(path)
        manifest = {
            "iteration": iteration,
            "config": self.config,
            "config_hash": self.config_hash,
            "state_path": path,
            "metrics": metrics,
        }
        self._write_text(
            spark, self._manifest_path(iteration), json.dumps(manifest, default=str)
        )
        self._flip_pointer(spark, iteration)
        return spark.read.parquet(path)

    def latest_iteration(self, spark: SparkSession | None = None) -> int | None:
        text = self._read_text(spark, self._latest_path)
        if text is not None:
            try:
                return int(text.strip())
            except ValueError:
                pass  # torn pointer write — heal via manifest scan
        its = self._manifest_iterations(spark)
        return its[-1] if its else None

    def load_latest(self, spark: SparkSession) -> tuple[DataFrame, int, list[dict]] | None:
        """Resume point: (state_df, iteration, metrics-so-far) or None.
        Refuses a snapshot written under a different config hash."""
        it = self.latest_iteration(spark)
        if it is None:
            return None
        text = self._read_text(spark, self._manifest_path(it))
        if text is None:
            # pointer names an iteration whose manifest is gone
            # (retention cleanup / partial copy): fall back to the
            # newest manifest actually present.
            its = [
                i for i in self._manifest_iterations(spark) if i != it
            ]
            if not its:
                return None
            it = its[-1]
            text = self._read_text(spark, self._manifest_path(it))
            if text is None:
                raise FileNotFoundError(
                    f"checkpoint manifest vanished during resume scan: "
                    f"{self._manifest_path(it)}"
                )
        manifest = json.loads(text)
        if manifest["config_hash"] != self.config_hash:
            raise ValueError(
                "checkpoint config mismatch: snapshot %s vs current %s"
                % (manifest["config_hash"], self.config_hash)
            )
        return spark.read.parquet(manifest["state_path"]), it, manifest["metrics"]

"""Engine-wide deterministic hashing + tokenization primitives.

``h60(expr)`` — a 60-bit integer hash: the first 15 hex digits of
md5(utf8(x)) parsed base-16. Chosen over xxhash64/crc because it is
reproducible IN ANY ENGINE (DuckDB: ``('0x' || substr(md5(x),1,15))
::BIGINT``; Python: ``int(hashlib.md5(b).hexdigest()[:15], 16)``) —
the correctness harness runs the same formula on both sides, the
analog of the reference's seeded-rand reproducibility contract
(gunrock/graphio/market.cuh:363 fills missing values with rand()%64
under a fixed seed).

All column functions here are pure Catalyst expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path (input_hint: no
per-row Python).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

# token = maximal [A-Za-z0-9]+ run — the BPE-ish word regex shared by
# tokenization, shingling, fingerprinting and the DuckDB oracles.
TOKEN_RE = "[A-Za-z0-9]+"


def h60(col: Column | str) -> Column:
    """60-bit md5-prefix hash of a string column (long)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


def h60_py(s: str | bytes) -> int:
    """Driver-side h60 (for deterministic plane/centroid generation)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def tokens(col: Column | str) -> Column:
    """array<string> of TOKEN_RE matches (JVM regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)

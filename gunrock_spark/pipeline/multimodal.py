"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub: ``decoder="fake"`` (default) derives
deterministic features from the payload bytes so the Spark-side
plumbing — schema, mapInPandas batching, partitioning — is real and
testable; ``decoder="real"`` raises NotImplementedError until a codec
library (PIL/torchaudio/pyav) is importable.

Schema contract:
    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, duration_ms int,
                      codec string>)

All heavy work runs inside ``mapInPandas`` — one Arrow batch in, one
out, vectorized numpy over the batch, never per-row Python dispatch
from the JVM.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("decode_ok", BooleanType()),
    ]
)

_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = md5-chained bytes)."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = b"".join(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).digest() for j in range(4)
        )
        meta = (
            64 + (i % 8) * 16 if kind == "image" else None,
            48 + (i % 8) * 16 if kind == "image" else None,
            1000 + i * 37 if kind in ("audio", "video") else None,
            {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: bytes -> [0,1)^dim."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(dim / max(len(arr), 1)))
    return (np.tile(arr, reps)[:dim] / 255.0).astype(np.float32)


def decode_features(
    media: DataFrame, decoder: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """(media_id, feature array<float>, decode_ok) via mapInPandas.

    ``decoder="real"`` is the production hook — STUBBED: raises
    NotImplementedError unless PIL is importable (no codec libs in
    this container)."""
    if decoder == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real decode requires an image codec library (PIL); "
                "not available in this container — use decoder='fake'"
            ) from e
    elif decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_features(bytes(p), dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": [f is not None for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """(media_id, frame_idx, ts_ms) — sampled frame timeline per
    video/audio row from meta.duration_ms (decode itself stubbed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_ts = [], [], []
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                dur = None if meta is None else meta["duration_ms"]
                if dur is None:
                    continue
                n_frames = int(dur) // every_ms + 1
                for j in range(n_frames):
                    out_id.append(mid)
                    out_idx.append(j)
                    out_ts.append(j * every_ms)
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "ts_ms": out_ts}
            )

    return media.mapInPandas(batches, schema=_FRAMES_SCHEMA)

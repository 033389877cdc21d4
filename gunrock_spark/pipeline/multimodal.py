"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

Decode support is split by what the container can honestly do:

- ``decoder="real"`` DECODES uncompressed formats with pure numpy —
  PPM (P6) images and WAV (RIFF/PCM16) audio need no codec library,
  just header parsing + ``np.frombuffer``. Features are computed from
  the actual pixels/samples (channel-mean grid for images, frame-RMS
  envelope for audio). Rows whose codec needs an external library
  (png/jpeg/h264/...) come back ``decode_ok=false`` — the
  clearly-marked residual stub; plug PIL/pyav into ``_decode_one``
  when the image ships codecs.
- ``decoder="fake"`` derives deterministic features from the payload
  bytes without decoding — the plumbing-test path.

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
import struct
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

WAV_RATE = 8000  # synthesized sample rate (Hz)


# ---------------------------------------------------------------------------
# real payload synthesis (uncompressed formats, deterministic)
# ---------------------------------------------------------------------------


def _make_ppm(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels.tobytes()


def _make_wav(duration_ms: int, seed: int, rate: int = WAV_RATE) -> bytes:
    """Minimal RIFF/WAVE, one PCM16 mono channel: a seeded-frequency
    sine (deterministic, genuinely decodable audio)."""
    n = rate * duration_ms // 1000
    freq = 200 + (seed % 17) * 60
    t = np.arange(n, dtype=np.float64) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def synthesize_media(
    spark: SparkSession, n: int = 64, seed: int = 42, real_payloads: bool = False
) -> DataFrame:
    """Deterministic media table. ``real_payloads`` writes genuinely
    decodable PPM images / WAV audio (video keeps an opaque h264-coded
    payload — the residual-stub row kind); default keeps the cheap
    md5-chained bytes for plumbing tests."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        w = 64 + (i % 8) * 16 if kind == "image" else None
        h = 48 + (i % 8) * 16 if kind == "image" else None
        dur = 1000 + i * 37 if kind in ("audio", "video") else None
        if real_payloads and kind == "image":
            payload, codec = _make_ppm(w, h, seed + i), "ppm"
        elif real_payloads and kind == "audio":
            payload, codec = _make_wav(dur, seed + i), "wav"
        else:
            payload = b"".join(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).digest() for j in range(4)
            )
            codec = {"image": "png", "audio": "pcm", "video": "h264"}[kind]
        rows.append((i, kind, bytearray(payload), (w, h, dur, codec)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# pure-numpy decoders (no codec libraries)
# ---------------------------------------------------------------------------


def _decode_ppm(payload: bytes) -> np.ndarray | None:
    """P6 PPM -> (H, W, 3) uint8, or None if malformed."""
    try:
        if not payload.startswith(b"P6"):
            return None
        # header: magic, width, height, maxval — whitespace separated,
        # comments (#...) allowed
        fields: list[bytes] = []
        i = 2
        while len(fields) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(payload[i:j])
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = (int(f) for f in fields)
        if maxval != 255:
            return None
        raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        return raw.reshape(h, w, 3)
    except (ValueError, IndexError):
        return None


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """RIFF/WAVE PCM16 mono -> (rate, int16 samples), or None."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, rate, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
                (bits,) = struct.unpack("<H", body[14:16])
                if fmt_tag != 1 or channels != 1 or bits != 16:
                    return None
            elif cid == b"data":
                data = np.frombuffer(body, dtype="<i2")
            pos += 8 + size + (size & 1)
        if rate is None or data is None:
            return None
        return rate, data
    except (struct.error, ValueError, IndexError):
        return None


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Channel-mean pooling over a grid — a real (if simple) visual
    descriptor of the decoded pixels, resized to ``dim``."""
    h, w, _ = img.shape
    g = max(1, int(np.sqrt(dim // 3)))
    ys = np.linspace(0, h, g + 1, dtype=int)
    xs = np.linspace(0, w, g + 1, dtype=int)
    cells = [
        img[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean(axis=(0, 1)) / 255.0
        for r in range(g)
        for c in range(g)
    ]
    flat = np.concatenate(cells)
    reps = int(np.ceil(dim / flat.size))
    return np.tile(flat, reps)[:dim].astype(np.float32)


def _audio_features(rate: int, samples: np.ndarray, dim: int) -> np.ndarray:
    """Frame-RMS envelope (dim frames) over the decoded waveform."""
    x = samples.astype(np.float64) / 32768.0
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, x.size, dim + 1, dtype=int)
    rms = [
        float(np.sqrt(np.mean(x[a:b] ** 2))) if b > a else 0.0
        for a, b in zip(edges[:-1], edges[1:])
    ]
    return np.asarray(rms, dtype=np.float32)


def _decode_one(payload: bytes, codec: str | None, dim: int) -> np.ndarray | None:
    """Real decode dispatch. Uncompressed formats decode here with
    numpy; compressed codecs (png/jpeg/h264/...) are the RESIDUAL
    STUB — return None (decode_ok=false) until PIL/pyav exist in the
    image."""
    if codec == "ppm":
        img = _decode_ppm(payload)
        return None if img is None else _image_features(img, dim)
    if codec == "wav":
        dec = _decode_wav(payload)
        return None if dec is None else _audio_features(*dec, dim)
    return None


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: bytes -> [0,1)^dim."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(dim / max(len(arr), 1)))
    return (np.tile(arr, reps)[:dim] / 255.0).astype(np.float32)


def decode_features(
    media: DataFrame, decoder: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """(media_id, feature array<float>, decode_ok) via mapInPandas.

    ``decoder="real"`` decodes PPM/WAV payloads with pure numpy and
    featurizes the actual content; rows needing an unavailable codec
    return decode_ok=false. ``decoder="fake"`` featurizes raw bytes
    (no decode), decode_ok=true wherever a payload exists."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                if p is None:
                    feats.append(None)
                elif decoder == "fake":
                    feats.append(_fake_features(bytes(p), dim))
                else:
                    codec = None if m is None else m["codec"]
                    feats.append(_decode_one(bytes(p), codec, dim))
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
    video/audio row from meta.duration_ms (video frame DECODE needs a
    codec library; the timeline itself is metadata arithmetic)."""

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

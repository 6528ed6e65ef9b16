"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata structs;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages so a
1000-executor cluster streams batches through Python workers without
materializing whole partitions. The actual codecs (PIL/ffmpeg/torchaudio) are
NOT available in this container — the decode step is stubbed with a
deterministic fake behind ``use_fake_decoder=True`` (default) or raises
``NotImplementedError``; the Spark-side plumbing (schema, batching,
partition sizing) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # 'image'|'audio'|'video'
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

_FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _fake_decode_features(payload: bytes | None) -> list[float]:
    """Deterministic stand-in for decode→embed: md5-seeded pseudo-features.
    Replace with a real decoder (PIL/torchvision) where libs exist."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    h = hashlib.md5(bytes(payload)).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    return [float(x) for x in rng.rand(_FEATURE_DIM).astype(np.float32)]


def extract_features(df: DataFrame, use_fake_decoder: bool = True,
                     batch_rows_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract media rows via ``mapInPandas``.

    The iterator-of-batches shape means constant memory per task regardless
    of partition size; tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
    to bound decoded-payload memory (large blobs → smaller batches).
    """
    if not use_fake_decoder:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg — not installed in this "
            "environment; pass use_fake_decoder=True for the plumbing path")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                "feature": pdf["payload"].map(_fake_decode_features),
            })
            yield out

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(df: DataFrame, target_w: int = 32, target_h: int = 32,
                  use_fake_decoder: bool = True) -> DataFrame:
    """Decode→resize→re-encode image rows via ``mapInPandas``.

    Non-image rows are filtered JVM-side BEFORE the Python stage (predicate
    stays in the scan, Python only sees image payloads). The fake resizer
    emits a deterministic ``target_w*target_h*3``-byte payload derived from
    the source bytes; a real impl swaps ``_fake_resize`` for PIL
    ``Image.resize`` with the same signature."""
    if not use_fake_decoder:
        raise NotImplementedError(
            "real image resize needs PIL — not installed; pass "
            "use_fake_decoder=True for the plumbing path")
    n_out = target_w * target_h * 3

    def _fake_resize(payload) -> bytes | None:
        if payload is None:
            return None
        seed = hashlib.md5(bytes(payload)).digest()
        reps = (n_out + len(seed) - 1) // len(seed)
        return (seed * reps)[:n_out]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": np.int32(target_w),
                "height": np.int32(target_h),
                "payload": pdf["payload"].map(_fake_resize),
            })

    return df.where(F.col("kind") == "image").mapInPandas(run, schema=_RESIZED_SCHEMA)


_FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 32,
                  use_fake_decoder: bool = True) -> DataFrame:
    """Sample video frames at a fixed stride via ``mapInPandas`` — the
    1:N (row → frames) exploding shape: each Arrow batch of video rows
    yields one output batch carrying all its frames, so frame count per
    task is bounded by ``maxRecordsPerBatch × max_frames`` regardless of
    partition size. Frames land at t = 0, every_ms, 2·every_ms … ≤
    duration_ms, capped at ``max_frames``. The fake decoder emits the
    16-byte md5 of (payload, frame_idx) per frame; a real impl swaps in
    ffmpeg/pyav keyframe extraction with the same signature."""
    if not use_fake_decoder:
        raise NotImplementedError(
            "real frame sampling needs ffmpeg/pyav — not installed; pass "
            "use_fake_decoder=True for the plumbing path")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                # nullable long arrives as float64 NaN in pandas, not None
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                n = min(dur // every_ms + 1, max_frames)
                base = b"" if payload is None else bytes(payload)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(hashlib.md5(base + i.to_bytes(4, "little")).digest())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "ts_ms": pd.Series(tss, dtype="int64"),
                "frame": pd.Series(frames, dtype=object),
            })

    return df.where(F.col("kind") == "video").mapInPandas(run, schema=_FRAMES_SCHEMA)


def synthetic_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append((i, kind, bytearray(payload), f"application/x-{kind}",
                     64 + i % 512 if kind == "image" else None,
                     64 + i % 256 if kind == "image" else None,
                     1000 * (i % 90) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

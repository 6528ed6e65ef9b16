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

"""Multimodal decode-stage plumbing: resize and frame-sampling mapInPandas
ops (extensions/multimodal.py). The codecs are documented stubs; what these
tests pin is the Spark-side contract — schemas, JVM-side kind filtering,
1:N row explosion bounds, determinism of the fake decode."""

import hashlib

import pytest
from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.extensions.multimodal import (
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_resize_images_only_and_fixed_payload(spark):
    media = synthetic_media(spark, n=48)
    out = resize_images(media, target_w=8, target_h=8)
    rows = out.collect()
    # only image rows (i % 3 == 0) survive, each with a 8*8*3-byte payload
    assert sorted(r.media_id for r in rows) == [i for i in range(48) if i % 3 == 0]
    assert all(r.width == 8 and r.height == 8 for r in rows)
    assert all(len(r.payload) == 8 * 8 * 3 for r in rows)


def test_resize_deterministic(spark):
    media = synthetic_media(spark, n=9)
    a = {r.media_id: bytes(r.payload) for r in resize_images(media, 4, 4).collect()}
    b = {r.media_id: bytes(r.payload) for r in resize_images(media, 4, 4).collect()}
    assert a == b


def test_resize_kind_filter_is_jvm_side(spark):
    """The kind filter must run BEFORE the Python stage (scan-side), not
    inside it — audio/video payloads never cross the Arrow boundary."""
    plan = resize_images(synthetic_media(spark, n=9))._jdf.queryExecution() \
        .executedPlan().toString()
    py_at = plan.find("MapInPandas")
    filter_at = plan.find("Filter")
    assert py_at != -1 and filter_at != -1
    # child operators print BELOW their parent: filter must be deeper
    assert filter_at > py_at, plan


def test_sample_frames_counts_and_stride(spark):
    media = synthetic_media(spark, n=30)
    out = sample_frames(media, every_ms=1000, max_frames=32)
    got = {}
    for r in out.collect():
        got.setdefault(r.media_id, []).append((r.frame_idx, r.ts_ms, bytes(r.frame)))
    # videos are i % 3 == 2 with duration 1000*(i%90)
    assert sorted(got) == [i for i in range(30) if i % 3 == 2]
    for mid, frames in got.items():
        n_expected = min((mid % 90) + 1, 32)
        frames.sort()
        assert [f[0] for f in frames] == list(range(n_expected))
        assert all(ts == idx * 1000 for idx, ts, _ in frames)
        assert all(len(fr) == 16 for _, _, fr in frames)


def test_sample_frames_cap(spark):
    media = synthetic_media(spark, n=120)  # durations up to 89 s
    out = sample_frames(media, every_ms=1000, max_frames=8)
    counts = out.groupBy("media_id").count().collect()
    assert max(r["count"] for r in counts) == 8


def test_real_decoder_paths_are_gated(spark):
    """Real decode now EXISTS for PPM/WAV (test_multimodal_codecs pins the
    exact values); what stays environment-gated: frame sampling (video
    needs ffmpeg — eager raise), and real-mode resize over a format PPM
    can't express (raises inside the worker)."""
    with pytest.raises(NotImplementedError):
        sample_frames(None, use_fake_decoder=False)
    from source_flink_cdc_3_5_0_spark.extensions.multimodal import MEDIA_SCHEMA
    jpeg = spark.createDataFrame(
        [(1, "image", bytearray(b"\xff\xd8\xff jpeg-ish"), "image/jpeg",
          2, 2, None)], MEDIA_SCHEMA)
    with pytest.raises(Exception):
        resize_images(jpeg, use_fake_decoder=False).collect()

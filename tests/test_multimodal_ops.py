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
    """Real decode EXISTS for PPM/WAV/PNG/baseline-JPEG and MJPEG-AVI
    frame sampling (test_multimodal_codecs / test_jpeg_codec pin values);
    what stays environment-gated raises inside the worker: real-mode
    frame sampling over a non-AVI container (MP4 needs ffmpeg) and
    real-mode resize over a format the resizer can't re-encode."""
    from source_flink_cdc_3_5_0_spark.extensions.multimodal import MEDIA_SCHEMA
    mp4 = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00 ftypmp42 opaque"),
          "video/mp4", None, None, 1000)], MEDIA_SCHEMA)
    with pytest.raises(Exception):
        sample_frames(mp4, use_fake_decoder=False).collect()
    truncated_jpeg = spark.createDataFrame(
        [(1, "image", bytearray(b"\xff\xd8\xff jpeg-ish"), "image/jpeg",
          2, 2, None)], MEDIA_SCHEMA)
    with pytest.raises(Exception):
        resize_images(truncated_jpeg, use_fake_decoder=False).collect()


class TestFrameAudioEnergy:
    def _wav(self, samples):
        import io
        import wave

        import numpy as np
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
        return bytearray(buf.getvalue())

    def _media(self, spark, rows):
        from source_flink_cdc_3_5_0_spark.extensions.multimodal import MEDIA_SCHEMA
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_exact_frames(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.multimodal import (
            frame_audio_energy)
        # 8 samples, frame 4 hop 2 -> frames at 0,2,4
        x = [1, -2, 3, -4, 5, -6, 7, -8]
        media = self._media(spark, [
            (1, "audio", self._wav(x), "audio/wav", None, None, 1)])
        rows = sorted(frame_audio_energy(media, frame_len=4, hop=2).collect())
        assert [(r.frame_idx, r.energy, r.peak) for r in rows] == [
            (0, 1 + 4 + 9 + 16, 4),
            (1, 9 + 16 + 25 + 36, 6),
            (2, 25 + 36 + 49 + 64, 8),
        ]
        assert all(r.n_samples == 4 for r in rows)

    def test_non_audio_and_undecodable_skipped(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.multimodal import (
            frame_audio_energy)
        media = self._media(spark, [
            (1, "image", bytearray(b"P6 garbage"), "x", 4, 4, None),
            (2, "audio", bytearray(b"not a riff"), "x", None, None, 1),
            (3, "audio", None, "x", None, None, 1),
            (4, "audio", self._wav([100] * 4), "audio/wav", None, None, 1),
        ])
        rows = frame_audio_energy(media, frame_len=4, hop=4).collect()
        assert [r.media_id for r in rows] == [4]
        assert rows[0].energy == 4 * 100 * 100

    def test_kind_filter_is_jvm_side(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.multimodal import (
            frame_audio_energy)
        plan = frame_audio_energy(synthetic_media(spark, n=9)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.find("Filter") > plan.find("MapInPandas") != -1


class TestImageAhash:
    def _ppm_media(self, spark, arrays):
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.multimodal import (
            MEDIA_SCHEMA, _encode_ppm)
        rows = [(i, "image", bytearray(_encode_ppm(np.asarray(a, dtype=np.uint8))),
                 "image/x-portable-pixmap", None, None, None)
                for i, a in enumerate(arrays)]
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_brightness_invariance(self, spark):
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.multimodal import image_ahash
        rng = np.random.RandomState(7)
        base = rng.randint(0, 200, size=(8, 8, 3))
        media = self._ppm_media(spark, [base, base + 17, base + 55])
        hashes = {r.media_id: r.ahash_bits for r in image_ahash(media).collect()}
        assert len(hashes) == 3
        assert hashes[0] == hashes[1] == hashes[2]
        assert set(hashes[0]) <= {"0", "1"} and len(hashes[0]) == 64

    def test_different_patterns_differ(self, spark):
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.multimodal import image_ahash
        rng = np.random.RandomState(11)
        a = rng.randint(0, 255, size=(8, 8, 3))
        b = rng.randint(0, 255, size=(8, 8, 3))
        hashes = {r.media_id: r.ahash_bits
                  for r in image_ahash(self._ppm_media(spark, [a, b])).collect()}
        assert hashes[0] != hashes[1]

    def test_pooling_matches_downscaled_image(self, spark):
        """A 16x16 image whose 2x2 blocks are constant must hash like the
        8x8 image of block values (integer average-pool exactness)."""
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.multimodal import image_ahash
        rng = np.random.RandomState(3)
        small = rng.randint(0, 255, size=(8, 8, 3))
        big = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
        hashes = {r.media_id: r.ahash_bits
                  for r in image_ahash(self._ppm_media(spark, [small, big])).collect()}
        assert hashes[0] == hashes[1]

    def test_undecodable_and_tiny_skipped(self, spark):
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.multimodal import (
            MEDIA_SCHEMA, image_ahash)
        rows = [(1, "image", bytearray(b"JFIF..."), "image/jpeg", None, None, None),
                (2, "image", None, "x", None, None, None)]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        tiny = self._ppm_media(spark, [np.zeros((4, 4, 3))])  # < 8x8 grid
        assert image_ahash(media).count() == 0
        assert image_ahash(tiny).count() == 0

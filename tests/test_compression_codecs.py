"""The round-11 compression codecs behind the Kafka consume path:
pure-Python snappy (raw block + xerial framing, spec-pinned) and the
liblz4 frame binding (CLI cross-validated both directions)."""

import os
import shutil
import struct
import subprocess
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from source_flink_cdc_3_5_0_spark.common import (  # noqa: E402
    lz4_binding, snappy_codec)


# ---------------------------------------------------------------------------
# snappy: known answers from google/snappy format_description.txt
# ---------------------------------------------------------------------------


def test_snappy_known_answer_literal_and_copy():
    # varint(8) + literal len 4 "abcd" + copy-1 offset 4 len 4
    wire = bytes([0x08, 0x0C]) + b"abcd" + bytes([0x01, 0x04])
    assert snappy_codec.decompress_raw(wire) == b"abcdabcd"


def test_snappy_known_answer_overlapping_rle():
    # "a" then copy offset 1 len 7 — RLE via overlap, byte-serial
    wire = bytes([0x08, 0x00]) + b"a" + bytes([((7 - 4) << 2) | 1, 0x01])
    assert snappy_codec.decompress_raw(wire) == b"a" * 8


def test_snappy_corrupt_surfaces_named():
    with pytest.raises(ValueError, match="snappy"):
        snappy_codec.decompress_raw(bytes([0x08, 0x0C]) + b"ab")  # short
    with pytest.raises(ValueError, match="offset"):
        # copy before any output exists
        snappy_codec.decompress_raw(bytes([0x04, 0x01, 0x09]))
    with pytest.raises(ValueError, match="declared"):
        # length mismatch: declares 9, decodes 8
        wire = bytes([0x09, 0x0C]) + b"abcd" + bytes([0x01, 0x04])
        snappy_codec.decompress_raw(wire)


def test_snappy_xerial_framing():
    blob = b"framed " * 9000  # > one 32 KiB block
    wire = snappy_codec.compress(blob)
    assert wire[:8] == snappy_codec.XERIAL_MAGIC
    assert struct.unpack_from(">II", wire, 8) == (1, 1)
    assert snappy_codec.decompress(wire) == blob
    # bare raw blocks (non-xerial producers) decode through the same
    # entry point
    assert snappy_codec.decompress(snappy_codec.compress_raw(blob)) == blob


@given(st.binary(max_size=5000))
@settings(max_examples=120, deadline=None)
def test_snappy_roundtrip_property(data):
    assert snappy_codec.decompress_raw(snappy_codec.compress_raw(data)) \
        == data
    assert snappy_codec.decompress(snappy_codec.compress(data)) == data


def test_snappy_actually_compresses():
    blob = b"the quick brown fox jumps over the lazy dog " * 500
    assert len(snappy_codec.compress_raw(blob)) < len(blob) // 5


# ---------------------------------------------------------------------------
# lz4: liblz4 frame binding
# ---------------------------------------------------------------------------

needs_lz4 = pytest.mark.skipif(not lz4_binding.available(),
                               reason="no liblz4 on this host")


@needs_lz4
def test_lz4_frame_magic_and_roundtrip():
    frame = lz4_binding.compress(b"hello")
    assert frame[:4] == b"\x04\x22\x4d\x18"  # LZ4 frame magic LE
    assert lz4_binding.decompress(frame) == b"hello"


@needs_lz4
@given(st.binary(max_size=5000))
@settings(max_examples=100, deadline=None)
def test_lz4_roundtrip_property(data):
    assert lz4_binding.decompress(lz4_binding.compress(data)) == data


@needs_lz4
def test_lz4_corrupt_surfaces_named():
    frame = bytearray(lz4_binding.compress(b"payload " * 100))
    frame[10] ^= 0xFF
    with pytest.raises(ValueError, match="lz4"):
        lz4_binding.decompress(bytes(frame))
    with pytest.raises(ValueError, match="truncated|lz4"):
        lz4_binding.decompress(bytes(lz4_binding.compress(b"x" * 500))[:-3])


@needs_lz4
@pytest.mark.skipif(shutil.which("lz4") is None,
                    reason="no lz4 CLI on this host")
def test_lz4_cli_cross_validation(tmp_path):
    """Independent-implementation check, both directions — the
    PG-round-8 lesson that known-answer self-tests can share a bug with
    their own writer."""
    blob = b"cross validate " * 1000
    p = tmp_path / "f"
    p.write_bytes(blob)
    subprocess.run(["lz4", "-q", str(p), str(p) + ".lz4"], check=True)
    assert lz4_binding.decompress((tmp_path / "f.lz4").read_bytes()) == blob
    (tmp_path / "g.lz4").write_bytes(lz4_binding.compress(blob))
    subprocess.run(["lz4", "-dq", str(tmp_path / "g.lz4"),
                    str(tmp_path / "g")], check=True)
    assert (tmp_path / "g").read_bytes() == blob

"""Minimal ctypes binding to the system liblz4 (LZ4 FRAME format).

Kafka's ``compression.type=lz4`` wraps each record batch's records
section in an LZ4 *frame* (magic 0x184D2204 — the format
KafkaLZ4BlockOutputStream writes for message format v1+; the legacy
broken-HC variant only ever applied to v0 messages, which predate the
v2 batches this client speaks). No Python lz4 package ships in this
environment, but the C library does (``liblz4.so.1`` is a base-system
dependency), and it exports the frame API:

- ``LZ4F_compressFrame`` / ``LZ4F_compressFrameBound`` (producer side),
- ``LZ4F_createDecompressionContext`` + ``LZ4F_decompress`` loop
  (consumer side — handles header parsing, block checksums and the
  end mark internally),
- ``LZ4F_isError`` / ``LZ4F_getErrorName`` for honest error surfaces.

When no liblz4 exists on the host, ``available()`` is False and the
Kafka consume path falls back to its named refusal — never a silent
skip or a garbage-varint crash.

Reference parity: the Kafka clients the reference's kafka connector
rides (`flink-cdc-pipeline-connector-kafka`) use net.jpountz.lz4 for
the same frames.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    name = ctypes.util.find_library("lz4")
    candidates = [name] if name else []
    candidates += ["liblz4.so.1", "liblz4.so", "liblz4.dylib"]
    for cand in candidates:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            lib.LZ4F_isError.restype = ctypes.c_uint
            lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
            lib.LZ4F_getErrorName.restype = ctypes.c_char_p
            lib.LZ4F_getErrorName.argtypes = [ctypes.c_size_t]
            lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
            lib.LZ4F_compressFrameBound.argtypes = [
                ctypes.c_size_t, ctypes.c_void_p]
            lib.LZ4F_compressFrame.restype = ctypes.c_size_t
            lib.LZ4F_compressFrame.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
            lib.LZ4F_createDecompressionContext.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
            lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
            lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
            lib.LZ4F_decompress.restype = ctypes.c_size_t
            lib.LZ4F_decompress.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


_LZ4F_VERSION = 100  # LZ4F_VERSION of the stable frame API


def available() -> bool:
    return _load() is not None


def compress(data: bytes) -> bytes:
    """bytes -> one LZ4 frame (default preferences: 64 KiB independent
    blocks, no content checksum — the shape the Java clients write)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("no liblz4 on this host")
    bound = lib.LZ4F_compressFrameBound(len(data), None)
    buf = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(buf, bound, data, len(data), None)
    if lib.LZ4F_isError(n):
        raise ValueError("lz4 frame compress failed: %s"
                         % lib.LZ4F_getErrorName(n).decode())
    return buf.raw[:n]


#: LZ4's worst-case expansion is bounded by a 64 KiB block decoding
#: from a handful of bytes (~255:1 per token run); 300:1 over the whole
#: frame is far past anything a real frame achieves, so the output cap
#: rejects corrupt streams instead of growing without bound.
_MAX_RATIO = 300


def decompress(data: bytes) -> bytes:
    """One LZ4 frame -> bytes, via the LZ4F streaming decoder (handles
    the header, block sizes, checksums and end mark internally). Corrupt
    frames raise ValueError with liblz4's own error name; output growth
    beyond LZ4's plausible expansion of the input is refused."""
    lib = _load()
    if lib is None:
        raise RuntimeError("no liblz4 on this host")
    ctx = ctypes.c_void_p()
    err = lib.LZ4F_createDecompressionContext(
        ctypes.byref(ctx), _LZ4F_VERSION)
    if lib.LZ4F_isError(err):
        raise ValueError("lz4 context: %s"
                         % lib.LZ4F_getErrorName(err).decode())
    try:
        if not data:
            raise ValueError("empty input is not an lz4 frame")
        out = bytearray()
        src = ctypes.create_string_buffer(bytes(data), len(data))
        src_off = 0
        chunk = ctypes.create_string_buffer(1 << 16)
        cap = max(len(data), 64) * _MAX_RATIO
        while src_off < len(data):
            dst_sz = ctypes.c_size_t(len(chunk))
            src_sz = ctypes.c_size_t(len(data) - src_off)
            hint = lib.LZ4F_decompress(
                ctx, chunk, ctypes.byref(dst_sz),
                ctypes.byref(src, src_off), ctypes.byref(src_sz), None)
            if lib.LZ4F_isError(hint):
                raise ValueError(
                    "lz4 frame decompress failed: %s"
                    % lib.LZ4F_getErrorName(hint).decode())
            out += chunk.raw[:dst_sz.value]
            if len(out) > cap:
                raise ValueError(
                    "lz4 frame inflated past %d bytes from a %d-byte "
                    "input (corrupt stream?)" % (cap, len(data)))
            if src_sz.value == 0 and dst_sz.value == 0:
                raise ValueError("lz4 frame stalled mid-stream "
                                 "(truncated input?)")
            src_off += src_sz.value
            if hint == 0 and src_off < len(data):
                raise ValueError(
                    "trailing bytes after the lz4 frame end mark")
        if hint != 0:
            raise ValueError("truncated lz4 frame (decoder expected "
                             "%d more bytes)" % hint)
        return bytes(out)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)

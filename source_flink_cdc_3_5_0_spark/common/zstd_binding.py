"""Minimal ctypes binding to the system libzstd (decompress + compress).

MySQL 8's ``binlog_transaction_compression=ON`` wraps every transaction
in a TRANSACTION_PAYLOAD event whose payload is a standard zstd frame
(RFC 8878) — ZSTD is the only compression algorithm the server offers,
so decoding it is the difference between supporting such servers and a
blanket refusal. No Python zstd package ships in this environment, but
the C library does (``libzstd.so.1`` is a base-system dependency almost
everywhere); this binding uses only the stable simple API:

- ``ZSTD_decompress`` (+ ``ZSTD_getFrameContentSize`` when the caller
  doesn't know the decompressed size),
- ``ZSTD_compress`` / ``ZSTD_compressBound`` (fixture/encoder side),
- ``ZSTD_isError`` / ``ZSTD_getErrorName`` for honest error surfaces.

When no libzstd exists on the host, ``available()`` is False and the
binlog decoder falls back to its named refusal — never a silent skip.

Reference parity: the jar (`mysql-binlog-connector-java`) decompresses
payload events with zstd-jni; same library, different binding.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_CONTENTSIZE_UNKNOWN = 2**64 - 1  # ZSTD_CONTENTSIZE_UNKNOWN (-1)
_CONTENTSIZE_ERROR = 2**64 - 2    # ZSTD_CONTENTSIZE_ERROR   (-2)

_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    name = ctypes.util.find_library("zstd")
    candidates = [name] if name else []
    candidates += ["libzstd.so.1", "libzstd.so", "libzstd.dylib"]
    for cand in candidates:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_getErrorName.restype = ctypes.c_char_p
            lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
            lib.ZSTD_decompress.restype = ctypes.c_size_t
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t]
            lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
            lib.ZSTD_getFrameContentSize.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


#: zstd's worst-case expansion is bounded by the RLE block form: 3 bytes
#: of input inflate to at most 128 KiB of output (~43691:1). Anything a
#: corrupt size field declares beyond that cannot be a real frame, so
#: the buffer allocation is rejected by NAME instead of dying on a
#: multi-terabyte create_string_buffer (review r10 finding #4).
_MAX_RATIO = 44_000


def decompress(data: bytes, expected_size: int | None = None) -> bytes:
    """One zstd frame -> bytes. ``expected_size`` (the payload event's
    uncompressed-size field) sizes the buffer; otherwise the frame
    header's content size is used. Corrupt frames raise ValueError with
    libzstd's own error name; an implausible declared size (beyond
    zstd's worst-case expansion of the input) is refused before any
    allocation."""
    lib = _load()
    if lib is None:
        raise RuntimeError("no libzstd on this host")
    size = expected_size
    if size is None:
        got = lib.ZSTD_getFrameContentSize(data, len(data))
        if got in (_CONTENTSIZE_UNKNOWN, _CONTENTSIZE_ERROR):
            raise ValueError(
                "zstd frame does not declare its content size and the "
                "caller supplied none")
        size = got
    if size > max(len(data), 1) * _MAX_RATIO:
        raise ValueError(
            "declared decompressed size %d exceeds zstd's maximum "
            "expansion of the %d-byte frame (corrupt size field?)"
            % (size, len(data)))
    buf = ctypes.create_string_buffer(size)
    n = lib.ZSTD_decompress(buf, size, data, len(data))
    if lib.ZSTD_isError(n):
        raise ValueError("zstd decompress failed: %s" %
                         lib.ZSTD_getErrorName(n).decode())
    return buf.raw[:n]


def compress(data: bytes, level: int = 3) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("no libzstd on this host")
    bound = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(buf, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise ValueError("zstd compress failed: %s" %
                         lib.ZSTD_getErrorName(n).decode())
    return buf.raw[:n]

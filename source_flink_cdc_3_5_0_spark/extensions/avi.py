"""Minimal AVI (RIFF) container demuxer/muxer for MJPEG video — pure
stdlib ``struct``, no ffmpeg.

Motion-JPEG-in-AVI is the simplest real video format: a RIFF container
whose ``movi`` list carries one complete JPEG per ``00dc``/``00db``
chunk.  With the baseline JPEG codec (``extensions/jpeg.py``) this makes
REAL video frame sampling possible end-to-end in this container —
demux → pick frames by timestamp → each frame is a decodable JPEG.

Supported: single-video-stream AVIs with frames in stream 0
(``00dc``/``00db`` chunks, optionally nested in ``rec `` lists),
``avih`` microseconds-per-frame timing.  Anything else (multiple
streams, ODML extensions beyond what's skipped structurally, non-RIFF
data) returns ``None`` honestly.  The muxer writes exactly this profile
and exists so the tests exercise real container bytes.
"""

from __future__ import annotations

import struct


def demux_avi_mjpeg(payload: bytes) -> tuple[int, list[bytes]] | None:
    """AVI bytes -> (us_per_frame, [frame bytes, ...]), or None."""
    try:
        return _demux(bytes(payload))
    except Exception:
        return None


def _demux(d: bytes) -> tuple[int, list[bytes]] | None:
    if len(d) < 12 or d[0:4] != b"RIFF" or d[8:12] != b"AVI ":
        return None
    us_per_frame = 0
    frames: list[bytes] = []

    def walk(start: int, end: int):
        nonlocal us_per_frame
        i = start
        while i + 8 <= end:
            fourcc = d[i:i + 4]
            size = struct.unpack("<I", d[i + 4:i + 8])[0]
            body = i + 8
            if body + size > end:
                raise ValueError("chunk overruns container")
            if fourcc == b"LIST":
                walk(body + 4, body + size)       # skip the list type tag
            elif fourcc == b"avih":
                if size < 4:
                    raise ValueError("short avih")
                us_per_frame = struct.unpack("<I", d[body:body + 4])[0]
            elif fourcc in (b"00dc", b"00db"):
                frames.append(d[body:body + size])
            i = body + size + (size & 1)          # chunks pad to even

    # clamp to the actual byte count: a truncated download keeps its
    # chunk headers intact but the declared RIFF size overshoots — the
    # overrun check must fire against reality, not the header's claim
    walk(12, min(8 + struct.unpack("<I", d[4:8])[0], len(d)))
    if us_per_frame <= 0 or not frames:
        return None
    return us_per_frame, frames


def mux_avi_mjpeg(frames: list[bytes], fps: int = 10,
                  width: int = 0, height: int = 0) -> bytes:
    """[JPEG bytes, ...] -> minimal single-stream MJPEG AVI."""
    if fps <= 0 or not frames:
        raise ValueError("need at least one frame and fps > 0")
    us_per_frame = 1_000_000 // fps

    avih = struct.pack("<14I", us_per_frame, 0, 0, 0, len(frames), 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl_list = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl

    movi = bytearray(b"movi")
    for f in frames:
        movi += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi += b"\x00"
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)

    body = b"AVI " + hdrl_list + movi_list
    return b"RIFF" + struct.pack("<I", len(body)) + body

"""JPEG codec — pure numpy + stdlib, no libjpeg/PIL.

Completes the real-codec set (PPM, WAV, PNG in ``multimodal.py``): the
container has no imaging libraries, so both directions are implemented
from the spec (ITU-T T.81):

- ``decode_jpeg``: baseline sequential DCT (SOF0/1) AND progressive DCT
  (SOF2) — 8-bit, grayscale or YCbCr (4:4:4 / 4:2:0 / 4:2:2 and any h/v
  factor ≤ 2), restart markers, multiple DHT/DQT segments; progressive
  covers spectral selection AND successive approximation for both DC and
  AC (per-scan table redefinition, interleaved DC scans, EOB runs,
  AC refinement correction bits — Annex G).  Arithmetic-coded, 12-bit
  and hierarchical streams return ``None`` honestly.
- ``encode_jpeg``: baseline encoder (quality-scaled Annex-K quantization
  tables, standard Annex-K Huffman tables, 4:4:4) used by the tests to
  produce real compressed streams to decode — decode∘encode round-trips
  are asserted by PSNR, plus DC-exactness on solid-color images.
- ``encode_jpeg_progressive``: progressive encoder (DC + AC successive
  approximation, spectral-selection scans, cross-block EOB runs) whose
  streams must decode BIT-IDENTICALLY to the baseline encode of the same
  image — the two paths reconstruct the same quantized coefficients, so
  the tests assert exact array equality, not PSNR.

Scale posture: identical to the PNG path — decode runs inside the Arrow
``mapInPandas`` batch; payload bytes never transit a shuffle.  The
entropy decoder is a Python bit-loop (fine for the thumbnail-scale
fixtures the sandbox exercises; a production deployment swaps this one
function for libjpeg-turbo behind the same ``decode_jpeg`` signature).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared DCT basis (orthonormal 8x8)
# ---------------------------------------------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C *= np.sqrt(2 / 8)
_C[0, :] *= np.sqrt(0.5)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K quantization tables (luminance, chrominance)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K Huffman specs: (bits-per-length[1..16], values)
_HUFF_SPECS = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]),
}


def _build_codes(bits, values):
    """(code, length) per value, canonical Huffman order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """length -> {code: value} lookup for the decoder."""
    table: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            table.setdefault(length, {})
            for _ in range(bits[length - 1]):
                table[length][code] = values[k]
                code += 1
                k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing; restart
    markers terminate the current run (caller resets DC predictors)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt
                    self.pos += 2
                    continue
                else:           # EOI or other marker: stop consuming
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Consume a pending RSTn and realign to a byte boundary.  The
        RST may be in either place: already swallowed into ``marker`` by
        ``_fill``'s read-ahead, or still un-consumed at ``pos`` (when the
        interval's entropy bytes exactly filled the accumulator) — handle
        both, else the next interval decodes from zero-padding."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None and self.pos + 1 < len(self.data) \
                and self.data[self.pos] == 0xFF \
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        self.marker = None


def _decode_huff(reader: _BitReader, table) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        row = table.get(length)
        if row is not None and code in row:
            return row[code]
    return None


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (grayscale replicated), or
    None for non-JPEG / unsupported variants / corrupt streams."""
    try:
        return _decode_jpeg_inner(bytes(payload))
    except Exception:
        return None


def _decode_jpeg_inner(d: bytes) -> np.ndarray | None:
    if len(d) < 4 or d[0:2] != b"\xFF\xD8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[str, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(d):
        if d[i] != 0xFF:
            return None
        # legal 0xFF fill padding before a marker (T.81 B.1.1.2)
        while i + 2 < len(d) and d[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(d):            # the skip moved past the loop guard
            return None
        marker = d[i + 1]
        if marker == 0xD9:      # EOI before SOS
            return None
        seglen = struct.unpack(">H", d[i + 2:i + 4])[0]
        seg = d[i + 4:i + 2 + seglen]
        if marker == 0xDB:      # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    return None     # 16-bit tables unsupported
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(seg[j + 1:j + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:    # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                values = list(seg[j + 17:j + 17 + n])
                huff[("dc" if tc == 0 else "ac", th)] = \
                    _build_decode_table(bits, values)
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None         # lossless / arithmetic / hierarchical
        elif marker == 0xDD:    # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:    # SOS
            if frame is None:
                return None
            if frame["progressive"]:
                return _decode_progressive(d, i, frame, qt, huff,
                                           restart_interval)
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 15)
            return _decode_scan(d, i + 2 + seglen, frame, qt, huff, sel,
                                restart_interval)
        i += 2 + seglen
    return None


def _decode_scan(d, pos, frame, qt, huff, sel, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        return None
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw)))

    reader = _BitReader(d, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.align_restart()
                pred = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(reader, huff[("dc", dc_t)],
                                            huff[("ac", ac_t)])
                        if blk is None:
                            return None
                        pred[ci] += blk[0]
                        coeff = np.zeros(64)
                        coeff[:] = blk
                        coeff[0] = pred[ci]
                        mat = np.zeros(64)
                        mat[_ZIGZAG] = coeff
                        px = _idct2(mat.reshape(8, 8) * q) + 128
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    return _planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _planes_to_rgb(planes, comps, hmax, vmax, h, w):
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(out[0], 0, 255)
        return np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128, out[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoding (SOF2, Annex G) — coefficient accumulation over scans
# ---------------------------------------------------------------------------

def _decode_progressive(d, sos_at, frame, qt, huff, restart_interval):
    """Decode a progressive frame starting at its FIRST SOS marker
    (``sos_at`` points at the 0xFF).  Walks every scan to EOI,
    accumulating quantized coefficients per block (zigzag order), honoring
    between-scan DHT/DQT/DRI redefinition, then dequantizes + IDCTs once.
    ``qt``/``huff`` arrive holding the tables defined before the first
    scan and keep evolving."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        return None
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for c in comps:
        coefs.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int32))
    i = sos_at
    while i + 4 <= len(d):
        if d[i] != 0xFF:
            return None
        while i + 2 < len(d) and d[i + 1] == 0xFF:
            i += 1
        marker = d[i + 1]
        if marker == 0xD9:      # EOI: all scans consumed
            break
        if i + 4 > len(d):
            return None
        seglen = struct.unpack(">H", d[i + 2:i + 4])[0]
        seg = d[i + 4:i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    return None
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(seg[j + 1:j + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                values = list(seg[j + 17:j + 17 + n])
                huff[("dc" if tc == 0 else "ac", th)] = \
                    _build_decode_table(bits, values)
                j += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next((k for k, cc in enumerate(comps)
                           if cc["id"] == cs), None)
                if ci is None:
                    return None
                scan_comps.append((ci, tt >> 4, tt & 15))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            end = _decode_prog_scan(
                d, i + 2 + seglen, frame, scan_comps, ss, se, ah, al,
                huff, restart_interval, coefs, mcux, mcuy)
            if end is None:
                return None
            i = end
            continue
        i += 2 + seglen

    # reconstruct: dequantize + IDCT every block
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            return None
        bv, bh = coefs[ci].shape[:2]
        plane = np.zeros((bv * 8, bh * 8))
        for by in range(bv):
            for bx in range(bh):
                mat = np.zeros(64)
                mat[_ZIGZAG] = coefs[ci][by, bx]
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _idct2(mat.reshape(8, 8) * q) + 128
        planes.append(plane)
    return _planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _next_marker(d, pos):
    """First non-stuffing, non-RST marker position at/after ``pos``."""
    while pos + 1 < len(d):
        if d[pos] == 0xFF and d[pos + 1] != 0x00 \
                and not (0xD0 <= d[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return len(d)


def _decode_prog_scan(d, pos, frame, scan_comps, ss, se, ah, al, huff,
                      restart_interval, coefs, mcux, mcuy):
    """One progressive scan over the coefficient arrays; returns the
    byte offset of the next marker, or None on a broken stream.  DC
    scans (ss==0) may interleave components in MCU order; AC scans are
    single-component in that component's own block raster (Annex G)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if ss == 0 and se != 0:
        return None             # DC and AC never share a scan
    if ss > 0 and len(scan_comps) != 1:
        return None
    reader = _BitReader(d, pos)
    state = {"eobrun": 0, "pred": [0] * len(comps)}

    def check_restart(unit_count):
        if restart_interval and unit_count and \
                unit_count % restart_interval == 0:
            reader.align_restart()
            state["pred"] = [0] * len(comps)
            state["eobrun"] = 0

    if ss == 0:                 # DC scan (possibly interleaved)
        interleaved = len(scan_comps) > 1
        n = 0
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    check_restart(n)
                    n += 1
                    for (ci, dc_t, _ac_t) in scan_comps:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[ci][my * c["v"] + by,
                                                mx * c["h"] + bx]
                                if not _dc_unit(reader, huff, dc_t, ah,
                                                al, state, ci, blk):
                                    return None
        else:
            (ci, dc_t, _ac_t) = scan_comps[0]
            c = comps[ci]
            # block grid of a NON-interleaved scan: ceil(comp_size/8)
            cw = -(-frame["w"] * c["h"] // hmax)
            chh = -(-frame["h"] * c["v"] // vmax)
            bw, bh = -(-cw // 8), -(-chh // 8)
            for by in range(bh):
                for bx in range(bw):
                    check_restart(n)
                    n += 1
                    blk = coefs[ci][by, bx]
                    if not _dc_unit(reader, huff, dc_t, ah, al, state,
                                    ci, blk):
                        return None
    else:                       # AC scan: single component, own raster
        (ci, _dc_t, ac_t) = scan_comps[0]
        c = comps[ci]
        cw = -(-frame["w"] * c["h"] // hmax)
        chh = -(-frame["h"] * c["v"] // vmax)
        bw, bh = -(-cw // 8), -(-chh // 8)
        table = huff.get(("ac", ac_t))
        if table is None:
            return None
        n = 0
        for by in range(bh):
            for bx in range(bw):
                check_restart(n)
                n += 1
                blk = coefs[ci][by, bx]
                ok = (_ac_first_unit(reader, table, ss, se, al, state, blk)
                      if ah == 0 else
                      _ac_refine_unit(reader, table, ss, se, al, state,
                                      blk))
                if not ok:
                    return None
    return _next_marker(d, reader.pos)


def _dc_unit(reader, huff, dc_t, ah, al, state, ci, blk) -> bool:
    if ah == 0:                 # first DC scan: diff << Al
        table = huff.get(("dc", dc_t))
        if table is None:
            return False
        t = _decode_huff(reader, table)
        if t is None or t > 11:
            return False
        diff = _extend(reader.read_bits(t), t) if t else 0
        state["pred"][ci] += diff
        blk[0] = state["pred"][ci] << al
    else:                       # refinement: one appended bit
        if reader.read_bit():
            blk[0] |= 1 << al
    return True


def _ac_first_unit(reader, table, ss, se, al, state, blk) -> bool:
    """AC spectral-selection first scan (G.1.2.2, libjpeg AC_first)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return True
    k = ss
    while k <= se:
        rs = _decode_huff(reader, table)
        if rs is None:
            return False
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                state["eobrun"] = eobrun - 1    # current block included
                return True
            k += 16             # ZRL
            continue
        k += r
        if k > se:
            return False
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return True


def _ac_refine_unit(reader, table, ss, se, al, state, blk) -> bool:
    """AC successive-approximation refinement (G.1.2.3, libjpeg
    AC_refine): correction bits for history-nonzero coefficients, new
    ±1<<Al coefficients, EOB runs that still carry correction bits."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(reader, table)
            if rs is None:
                return False
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    state["eobrun"] = eobrun
                    break       # tail below handles this block's band rest
            elif s == 1:
                newval = p1 if reader.read_bit() else m1
            else:
                return False
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit():
                        if (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if newval:
                            blk[k] = newval
                        break
                    r -= 1
                k += 1
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit():
                    if (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1
    return True


def _decode_block(reader, dc_table, ac_table):
    """One 8x8 block's zigzag coefficients; [0] is the DC *difference*."""
    t = _decode_huff(reader, dc_table)
    if t is None or t > 11:
        return None
    diff = _extend(reader.read_bits(t), t) if t else 0
    coeff = np.zeros(64)
    coeff[0] = diff
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_table)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break               # EOB
        k += r
        if k > 63:
            return None
        coeff[k] = _extend(reader.read_bits(s), s)
        k += 1
    return coeff


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4) — produces real streams for the tests
# ---------------------------------------------------------------------------

class _SymbolCounter:
    """Pass-1 sink for progressive scans: records which Huffman symbols
    each table emits (bit payloads ignored)."""

    def __init__(self):
        self.symbols: dict[int, set[int]] = {}

    def symbol(self, tbl: int, sym: int):
        self.symbols.setdefault(tbl, set()).add(sym)

    def bits(self, v: int, n: int):
        pass


class _ScanWriter:
    """Pass-2 sink: emits real codes from the per-scan tables."""

    def __init__(self, wtr: "_BitWriter", codes: dict[int, dict]):
        self.wtr = wtr
        self.codes = codes

    def symbol(self, tbl: int, sym: int):
        code, ln = self.codes[tbl][sym]
        self.wtr.write(code, ln)

    def bits(self, v: int, n: int):
        if n:
            self.wtr.write(v & ((1 << n) - 1), n)


def _flat_huff_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A VALID (not optimal) DHT for exactly these symbols: all codes one
    length L with 2^L > n, so the all-ones code stays unused (T.81
    requires it).  Compression is irrelevant here — correctness of the
    scan structure is what the tests exercise."""
    vals = sorted(symbols)
    n = max(1, len(vals))
    length = 1
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)    # pad with 1s per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


def _cat(v: int) -> int:
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JFIF bytes (4:4:4).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    N MCUs (DC predictors reset, bitstream byte-aligned) — exercises the
    decoder's restart path with real streams."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]
    qy = _quality_scale(_QY.reshape(8, 8), quality)
    qc = _quality_scale(_QC.reshape(8, 8), quality)
    qts = [qy] if gray else [qy, qc]

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in enumerate(qts):
        z = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + z.tobytes()
    nc = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    specs = [("dc", 0), ("ac", 0)] if gray else \
        [("dc", 0), ("ac", 0), ("dc", 1), ("ac", 1)]
    enc_tables = {}
    for kind, tid in specs:
        bits, values = _HUFF_SPECS[(kind, tid)]
        enc_tables[(kind, tid)] = _build_codes(bits, values)
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values)) \
            + bytes([(0 if kind == "dc" else 0x10) | tid]) \
            + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3F\x00"

    wtr = _BitWriter()
    pred = [0] * nc
    bh, bw = -(-h // 8), -(-w // 8)
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)
    mcu_idx = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = [0] * nc
            mcu_idx += 1
            for ci in range(nc):
                q = qts[0] if ci == 0 else qts[1]
                dct = enc_tables[("dc", 0 if ci == 0 else 1)]
                act = enc_tables[("ac", 0 if ci == 0 else 1)]
                blk = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128
                coeff = np.round(_dct2(blk) / q).astype(int)
                zz = coeff.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _cat(diff)
                code, ln = dct[t]
                wtr.write(code, ln)
                if t:
                    v = diff if diff >= 0 else diff + (1 << t) - 1
                    wtr.write(v, t)
                run = 0
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s = _cat(v)
                    code, ln = act[(run << 4) | s]
                    wtr.write(code, ln)
                    ev = v if v >= 0 else v + (1 << s) - 1
                    wtr.write(ev, s)
                    run = 0
                if last < 63:
                    code, ln = act[0x00]
                    wtr.write(code, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — real multi-scan streams for the tests
# ---------------------------------------------------------------------------

def _quantized_blocks(arr: np.ndarray, quality: int):
    """Shared front half of both encoders: (planes -> per-component
    quantized zigzag coefficient arrays, 4:4:4), plus the quant tables."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]
    qy = _quality_scale(_QY.reshape(8, 8), quality)
    qc = _quality_scale(_QC.reshape(8, 8), quality)
    qts = [qy] if gray else [qy, qc]
    bh, bw = -(-h // 8), -(-w // 8)
    coefs = []
    for ci, p in enumerate(planes):
        pp = np.empty((bh * 8, bw * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        q = qts[0] if ci == 0 else qts[1]
        cc = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                blk = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128
                cc[by, bx] = np.round(
                    _dct2(blk) / q).astype(int).reshape(-1)[_ZIGZAG]
        coefs.append(cc)
    return coefs, qts, h, w, bh, bw, gray


def _prog_dc_first(sink, coefs, scan_cis, al, bh, bw):
    pred = [0] * len(coefs)
    for by in range(bh):
        for bx in range(bw):
            for ci in scan_cis:
                tbl = 0 if ci == 0 else 1
                v = int(coefs[ci][by, bx, 0]) >> al   # arithmetic shift
                diff = v - pred[ci]
                pred[ci] = v
                t = _cat(diff)
                sink.symbol(tbl, t)
                if t:
                    ev = diff if diff >= 0 else diff + (1 << t) - 1
                    sink.bits(ev, t)


def _prog_dc_refine(sink, coefs, scan_cis, al, bh, bw):
    for by in range(bh):
        for bx in range(bw):
            for ci in scan_cis:
                sink.bits((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)


class _EobState:
    def __init__(self):
        self.run = 0
        self.carried: list[int] = []

    def flush(self, sink, tbl):
        if self.run > 0:
            nbits = 0
            t = self.run
            while t > 1:
                t >>= 1
                nbits += 1
            sink.symbol(tbl, nbits << 4)
            if nbits:
                sink.bits(self.run, nbits)
            self.run = 0
        for b in self.carried:
            sink.bits(b, 1)
        self.carried = []


def _prog_ac_first(sink, blocks, ss, se, al, tbl, eob):
    """AC spectral-selection first scan over a component's blocks (raster
    order); ``eob`` carries the cross-block EOB run."""
    for blk in blocks:
        r = 0
        wrote = False
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            eob.flush(sink, tbl)
            while r > 15:
                sink.symbol(tbl, 0xF0)
                r -= 16
            s = _cat(t)
            sink.symbol(tbl, (r << 4) | s)
            sv = t if v >= 0 else -t
            ev = sv if sv >= 0 else sv + (1 << s) - 1
            sink.bits(ev, s)
            r = 0
            wrote = True
        if r > 0 or not wrote:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush(sink, tbl)


def _prog_ac_refine(sink, blocks, ss, se, al, tbl, eob):
    """AC successive-approximation refinement (libjpeg
    encode_mcu_AC_refine shape): ±1<<Al for newly-nonzero coefficients,
    buffered correction bits for history-nonzero ones, EOB runs carrying
    the buffered bits."""
    for blk in blocks:
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eobi = 0          # index AFTER the last newly-nonzero coef
        for i, t in enumerate(absv):
            if t == 1:
                eobi = i + 1
        r = 0
        cur: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eobi:
                eob.flush(sink, tbl)
                sink.symbol(tbl, 0xF0)
                r -= 16
                for b in cur:
                    sink.bits(b, 1)
                cur = []
            if t > 1:
                cur.append(t & 1)
                continue
            eob.flush(sink, tbl)
            sink.symbol(tbl, (r << 4) | 1)
            sink.bits(1 if int(blk[ss + i]) >= 0 else 0, 1)
            for b in cur:
                sink.bits(b, 1)
            cur = []
            r = 0
        if r > 0 or cur:
            eob.run += 1
            eob.carried.extend(cur)
            if eob.run == 0x7FFF:
                eob.flush(sink, tbl)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> PROGRESSIVE (SOF2) JFIF bytes, 4:4:4:
    DC first at Al=1 (interleaved) + DC refinement, per-component AC
    spectral-selection first scans at Al=1 (the luma band split in two)
    + AC refinement scans to Al=0 — successive approximation on BOTH
    coefficient classes with cross-block EOB runs, so every decoder path
    of Annex G is exercised.  Decodes bit-identically to the baseline
    encode of the same image (same quantized coefficients)."""
    coefs, qts, h, w, bh, bw, gray = _quantized_blocks(arr, quality)
    nc = 1 if gray else 3

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in enumerate(qts):
        z = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + z.tobytes()
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])

    if gray:
        scans = [
            ("dc_first", [0], 0, 0, 0, 1),
            ("ac_first", [0], 1, 63, 0, 1),
            ("dc_refine", [0], 0, 0, 1, 0),
            ("ac_refine", [0], 1, 63, 1, 0),
        ]
    else:
        scans = [
            ("dc_first", [0, 1, 2], 0, 0, 0, 1),
            ("ac_first", [0], 1, 5, 0, 1),
            ("ac_first", [1], 1, 63, 0, 1),
            ("ac_first", [2], 1, 63, 0, 1),
            ("ac_first", [0], 6, 63, 0, 1),
            ("dc_refine", [0, 1, 2], 0, 0, 1, 0),
            ("ac_refine", [0], 1, 63, 1, 0),
            ("ac_refine", [1], 1, 63, 1, 0),
            ("ac_refine", [2], 1, 63, 1, 0),
        ]

    def run_scan(kind, cis, ss, se, ah, al, sink):
        if kind == "dc_first":
            _prog_dc_first(sink, coefs, cis, al, bh, bw)
        elif kind == "dc_refine":
            _prog_dc_refine(sink, coefs, cis, al, bh, bw)
        else:
            ci = cis[0]
            tbl = 0 if ci == 0 else 1
            blocks = [coefs[ci][by, bx]
                      for by in range(bh) for bx in range(bw)]
            eob = _EobState()
            if kind == "ac_first":
                _prog_ac_first(sink, blocks, ss, se, al, tbl, eob)
            else:
                _prog_ac_refine(sink, blocks, ss, se, al, tbl, eob)
            eob.flush(sink, tbl)

    for (kind, cis, ss, se, ah, al) in scans:
        counter = _SymbolCounter()
        run_scan(kind, cis, ss, se, ah, al, counter)
        codes: dict[int, dict] = {}
        is_dc = kind.startswith("dc")
        for tbl, syms in sorted(counter.symbols.items()):
            bits, vals = _flat_huff_table(syms)
            codes[tbl] = _build_codes(bits, vals)
            out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) \
                + bytes([(0 if is_dc else 0x10) | tbl]) \
                + bytes(bits) + bytes(vals)
        out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(cis), len(cis))
        for ci in cis:
            tbl = 0 if ci == 0 else 1
            td = tbl if is_dc else 0
            ta = 0 if is_dc else tbl
            out += bytes([ci + 1, (td << 4) | ta])
        out += bytes([ss, se, (ah << 4) | al])
        wtr = _BitWriter()
        run_scan(kind, cis, ss, se, ah, al, _ScanWriter(wtr, codes))
        wtr.flush()
        out += wtr.out
    out += b"\xFF\xD9"
    return bytes(out)

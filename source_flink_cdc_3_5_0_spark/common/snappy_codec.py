"""Pure-Python snappy codec: the raw block format plus the xerial
stream framing Kafka's Java client wraps it in.

Kafka's ``compression.type=snappy`` compresses each record batch's
records section with snappy-java (xerial), whose stream format is:
8-byte magic ``\\x82SNAPPY\\x00`` + u32be version + u32be
compat-version, then chunks of u32be length + one raw snappy block
each. The raw block format is public
(google/snappy ``format_description.txt``): a varint uncompressed
length followed by literal/copy elements.

No snappy library (C or Python) ships in this environment, and the
format is simple enough that a from-scratch decoder is the honest
path — the alternative was a named refusal on every
``compression.type=snappy`` topic, one of the most common production
configurations.

The compressor emits literals plus greedy hash-matched copies — every
output is a valid snappy stream (the format does not mandate optimal
matching), decodable by any conformant decoder, and the decoder is
pinned against hand-built known-answer vectors from the spec.
"""

from __future__ import annotations

import struct

XERIAL_MAGIC = b"\x82SNAPPY\x00"


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint overruns 32 bits")


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress_raw(data: bytes) -> bytes:
    """One raw snappy block -> bytes (format_description.txt)."""
    expect, pos = _read_varint(data, 0)
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(data):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(data):
                raise ValueError("snappy literal overruns the block")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = 4 + ((tag >> 2) & 0x7)
            if pos >= len(data):
                raise ValueError("truncated snappy copy-1")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > len(data):
                raise ValueError("truncated snappy copy-2")
            off = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > len(data):
                raise ValueError("truncated snappy copy-4")
            off = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(
                "snappy copy offset %d outside the %d bytes produced"
                % (off, len(out)))
        start = len(out) - off
        if off >= ln:
            out += out[start:start + ln]
        else:
            # overlapping copy: byte-serial semantics == the off-byte
            # pattern repeated (RLE) — build it by repetition instead of
            # a per-byte loop
            pattern = bytes(out[start:])
            out += (pattern * (ln // off + 1))[:ln]
    if len(out) != expect:
        raise ValueError("snappy block declared %d bytes but decoded %d"
                         % (expect, len(out)))
    return bytes(out)


def compress_raw(data: bytes) -> bytes:
    """bytes -> one raw snappy block: greedy 4-byte hash matching with
    literal runs between matches (the classic snappy strategy, minus
    the tuning)."""
    out = bytearray(_write_varint(len(data)))

    def emit_literal(chunk: bytes) -> None:
        while chunk:
            part, chunk = chunk[:2**32 - 1], chunk[2**32 - 1:]
            n = len(part) - 1
            if n < 60:
                out.append(n << 2)
            else:
                nb = (n.bit_length() + 7) // 8
                out.append((59 + nb) << 2)
                out.extend(n.to_bytes(nb, "little"))
            out.extend(part)

    table: dict[bytes, int] = {}
    pos = lit_start = 0
    n = len(data)
    while pos + 4 <= n:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        # extend the match
        ln = 4
        while pos + ln < n and ln < 64 \
                and data[cand + ln] == data[pos + ln]:
            ln += 1
        if lit_start < pos:
            emit_literal(data[lit_start:pos])
        off = pos - cand
        if 4 <= ln <= 11 and off < 2048:
            out.append(((off >> 8) << 5) | ((ln - 4) << 2) | 1)
            out.append(off & 0xFF)
        else:
            out.append(((ln - 1) << 2) | 2)
            out += struct.pack("<H", off)
        pos += ln
        lit_start = pos
    if lit_start < n:
        emit_literal(data[lit_start:])
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Xerial-framed stream (what Kafka's snappy-java writes) or a bare
    raw block — both shapes appear in the wild."""
    if data[:8] == XERIAL_MAGIC:
        pos, out = 16, bytearray()  # skip magic + version + compat
        while pos < len(data):
            if pos + 4 > len(data):
                raise ValueError("truncated xerial chunk header")
            ln = struct.unpack_from(">I", data, pos)[0]
            pos += 4
            if pos + ln > len(data):
                raise ValueError("xerial chunk overruns the stream")
            out += decompress_raw(data[pos:pos + ln])
            pos += ln
        return bytes(out)
    return decompress_raw(data)


_XERIAL_BLOCK = 32 * 1024  # snappy-java's default block size


def compress(data: bytes) -> bytes:
    """bytes -> xerial-framed stream (version 1, compat 1, 32 KiB
    blocks — snappy-java's shape)."""
    out = bytearray(XERIAL_MAGIC + struct.pack(">II", 1, 1))
    for i in range(0, max(len(data), 1), _XERIAL_BLOCK):
        block = compress_raw(data[i:i + _XERIAL_BLOCK])
        out += struct.pack(">I", len(block)) + block
    return bytes(out)

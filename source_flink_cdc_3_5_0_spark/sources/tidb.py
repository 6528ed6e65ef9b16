"""TiDB CDC source: TiKV row-key / row-value codecs + raw-KV changelog decode.

Parity targets (reference `flink-cdc-connect/flink-cdc-source-connectors/
flink-connector-tidb-cdc`). TiDB is the ONE legacy connector whose wire
format is NOT Debezium: it subscribes to TiKV's region CDC streams
(`org.tikv.cdc.CDCClient` / `RegionCDCClient.java`) and receives raw KV
events — `(op_type PUT|DELETE, key, value, old_value, commit_ts)` — whose
key is the TiKV record key and whose values are TiDB-encoded rows:

- **Change decode** — `table/RowDataTiKVChangeEventDeserializationSchema
  .java:59-105`: DELETE -> delete row decoded from ``old_value``; PUT with
  empty ``old_value`` -> insert from ``value``; PUT with an old value ->
  update-after from ``value``.  The handle (rowid) comes from
  `RowKey.decode(key)` and supplies the PK column when the PK is the
  integer handle (`pk_is_handle` tables store the PK only in the key).
- **Snapshot decode** — `table/RowDataTiKVSnapshotEventDeserializationSchema
  .java`: a region scan at a ts yields (key, value) pairs -> +I rows.
- **Key-range splitter** — `table/utils/TableKeyRangeUtils.java:39-66`:
  the signed-handle space is split evenly into `num` coprocessor ranges
  (`delta = (MAX - (MIN+1)) / num`, boundary `i` at `MIN + delta*i`), the
  first range starting at the table's min record key and the last ending
  at the beyond-max key (`_r` prefix incremented to `_s`).
  `isRecordKey` checks bytes 9:11 == ``_r`` (:72-74).

The byte-level codecs the reference gets from the tikv-client jar
(`org.tikv.common.codec.TableCodec/RowV2/RowDecoderV2`) are re-implemented
here FROM THE PUBLIC SPECS — TiDB's row formats are documented in the TiDB
design RFC "Proposal: A new storage row format for efficient decoding"
(docs/design/2018-07-19-row-format.md) and the v1 datum codec in
`tidb/util/codec/codec.go` (Apache-2.0):

- memcomparable signed ints (sign-bit flip, big-endian u64);
- Go (u)varints and zigzag;
- memcomparable byte groups (8-byte chunks, pad marker ``0xFF - pad``);
- order-preserving float encoding (non-negative: set sign bit; negative:
  flip all bits);
- MySQL packed time (``((year*13+month)<<5 | day) << 17 | hms) << 24 | us``,
  `tidb/types/time.go ToPackedUint`);
- row format **v1** ("old row"): alternating (colID varint-datum,
  value datum) pairs, datum flags Nil=0 Bytes=1 CompactBytes=2 Int=3
  Uint=4 Float=5 Decimal=6 Duration=7 Varint=8 Uvarint=9 Json=10;
- row format **v2**: ``0x80`` version byte, flags (bit0 = big), u16le
  not-null/null counts, sorted column-id arrays, u16le end-offset array,
  then cells (ints little-endian minimal-width, floats order-preserving
  8 B, strings raw);
- DECIMAL cells are ``[precision][frac]`` + the MySQL packed-decimal
  bytes (`codec.go EncodeDecimal` / `mydecimal.go WriteBin` — byte-
  identical to binlog NEWDECIMAL, so the codec is SHARED with
  `sources/mysql_binlog.py`); v1 prepends flag 6;
- JSON cells are the MySQL binary-JSON document (TypeCode + value,
  `types/json` mirrors `json_binary.cc`) — shared with
  `common/mysql_json.py`; v1 prepends flag 10 and sizes the datum by
  decoding it (the `json.PeekBytesAsJSON` analog: JSON datums carry no
  length prefix);
- DURATION cells are the int64 NANOSECOND count (Go ``time.Duration``,
  `codec.go` duration case): v1 flag 7 + memcomparable int64, v2 a
  minimal-width little-endian signed int.  The engine surface renders
  durations as ``[-]HH:MM:SS[.ffffff]`` strings (same convention the
  binlog TIME2 path uses).

Both an encoder and a decoder ship so every format round-trips in tests
(same approach as the in-repo PNG/JPEG codecs); the encoder is also how
scripted fixtures produce wire-true KV events without a TiKV cluster.

Scale posture: decode is an Arrow-batched ``mapInPandas`` stage (binary
wire parsing is the honest Python path, same as the media codecs); the
per-row state is one row's bytes; key-range chunking is O(num) driver
metadata.  Live PD/TiKV gRPC endpoints are environment-gated out — this
sandbox decodes captured or scripted KV event streams.
"""

from __future__ import annotations

import datetime
import decimal
import json as _json
import re as _re
import struct
from dataclasses import dataclass
from functools import cached_property
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

from ..common.events import BEFORE_COL, META_COL, OP_COL
from ..common.mysql_json import (decode_json, decode_json_at, dumps_json,
                                 encode_json)
from ..common.types import hms_text
from .base import SEQ_COL
# leaf module: nothing imports sources.tidb, so these cross-module codec
# imports (hot at µs/row on the decode path — previously function-local)
# cannot create a cycle
from .mysql_binlog import (decimal_bin_size, decode_newdecimal,
                           encode_newdecimal)

_SIGN = 1 << 63
_MASK = (1 << 64) - 1
_I64_MIN = -(1 << 63)
_I64_MAX = (1 << 63) - 1

# ---------------------------------------------------------------------------
# primitive codecs (tidb/util/codec/codec.go public semantics)
# ---------------------------------------------------------------------------


def encode_comparable_int(v: int) -> bytes:
    """Signed int64 -> memcomparable 8 bytes (sign bit flipped, big-endian)."""
    return struct.pack(">Q", (v & _MASK) ^ _SIGN)


def decode_comparable_int(buf: bytes, pos: int = 0) -> tuple[int, int]:
    x = struct.unpack_from(">Q", buf, pos)[0] ^ _SIGN
    return (x - (1 << 64) if x & _SIGN else x), pos + 8


def encode_uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def decode_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


def encode_varint(v: int) -> bytes:
    return encode_uvarint((v << 1) ^ (v >> 63))


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    uv, pos = decode_uvarint(buf, pos)
    return (uv >> 1) ^ -(uv & 1), pos


def encode_comparable_bytes(data: bytes) -> bytes:
    """Memcomparable byte groups: 8-byte chunks, marker ``0xFF - pad``."""
    out = bytearray()
    i = 0
    while True:
        group = data[i:i + 8]
        pad = 8 - len(group)
        out += group + b"\x00" * pad
        out.append(0xFF - pad)
        i += 8
        if pad > 0:
            return bytes(out)


def decode_comparable_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        group, marker = buf[pos:pos + 8], buf[pos + 8]
        pos += 9
        pad = 0xFF - marker
        out += group[:8 - pad]
        if pad > 0:
            return bytes(out), pos


def encode_comparable_float(f: float) -> bytes:
    u = struct.unpack(">Q", struct.pack(">d", f))[0]
    u = (u | _SIGN) if f >= 0 else (~u & _MASK)
    return struct.pack(">Q", u)


def decode_comparable_float(buf: bytes, pos: int = 0) -> tuple[float, int]:
    u = struct.unpack_from(">Q", buf, pos)[0]
    u = (u & ~_SIGN) if u & _SIGN else (~u & _MASK)
    return struct.unpack(">d", struct.pack(">Q", u & _MASK))[0], pos + 8


def pack_mysql_time(year: int, month: int, day: int, hour: int = 0,
                    minute: int = 0, second: int = 0, microsecond: int = 0
                    ) -> int:
    """`types/time.go ToPackedUint`: the uint64 a DATE/DATETIME datum holds."""
    ymd = ((year * 13 + month) << 5) | day
    hms = (hour << 12) | (minute << 6) | second
    return (((ymd << 17) | hms) << 24) | microsecond


def unpack_mysql_time(packed: int) -> tuple[int, int, int, int, int, int, int]:
    us = packed & 0xFFFFFF
    hms = (packed >> 24) & 0x1FFFF
    ymd = packed >> 41
    ym, day = ymd >> 5, ymd & 0x1F
    return (ym // 13, ym % 13, day,
            (hms >> 12) & 0x3F, (hms >> 6) & 0x3F, hms & 0x3F, us)


# ---------------------------------------------------------------------------
# record keys (tablecodec: 't' + int64(tableId) + '_r' + int64(handle))
# ---------------------------------------------------------------------------

RECORD_PREFIX_SEP = b"_r"


def encode_record_key(table_id: int, handle: int) -> bytes:
    return (b"t" + encode_comparable_int(table_id)
            + RECORD_PREFIX_SEP + encode_comparable_int(handle))


def decode_record_key(key: bytes) -> tuple[int, int]:
    if len(key) != 19 or key[:1] != b"t" or not is_record_key(key):
        raise ValueError("not a TiKV record key: %r" % key[:20])
    table_id, _ = decode_comparable_int(key, 1)
    handle, _ = decode_comparable_int(key, 11)
    return table_id, handle


def is_record_key(key: bytes) -> bool:
    """`TableKeyRangeUtils.isRecordKey`: bytes 9:11 are ``_r``."""
    return len(key) > 10 and key[9:11] == RECORD_PREFIX_SEP


def table_key_ranges(table_id: int, num: int) -> list[tuple[bytes, bytes]]:
    """Even handle-space split (`TableKeyRangeUtils.getTableKeyRanges`).

    ``delta = (Long.MAX - (Long.MIN+1)) / num``; boundary ``i`` sits at
    ``Long.MIN + delta*i``; the first range starts at the table's min
    record key and the last ends at beyond-max (``_r`` bumped to ``_s``).
    """
    if num <= 0:
        raise ValueError("Illegal value of num")
    prefix = b"t" + encode_comparable_int(table_id)
    min_key, beyond_max = prefix + b"_r", prefix + b"_s"
    if num == 1:
        return [(min_key, beyond_max)]
    delta = (_I64_MAX - (_I64_MIN + 1)) // num
    bound = lambda i: encode_record_key(table_id, _I64_MIN + delta * i)  # noqa: E731
    return [(min_key if i == 0 else bound(i),
             beyond_max if i == num - 1 else bound(i + 1))
            for i in range(num)]


# ---------------------------------------------------------------------------
# table metadata (the TableInfo slice decodeObjects needs)
# ---------------------------------------------------------------------------

#: spark type -> cell kind (unsigned integers become 'uint' via ti_column)
_KIND_BY_TYPE = {
    T.ByteType: "int", T.ShortType: "int", T.IntegerType: "int",
    T.LongType: "int", T.FloatType: "float", T.DoubleType: "float",
    T.StringType: "string", T.BinaryType: "bytes", T.DateType: "date",
    T.TimestampNTZType: "datetime",
}


@dataclass(frozen=True)
class TiColumn:
    col_id: int
    name: str
    spark_type: T.DataType
    kind: str
    pk_handle: bool = False


def ti_column(col_id: int, name: str, spark_type: T.DataType, *,
              unsigned: bool = False, pk_handle: bool = False,
              json: bool = False, duration: bool = False) -> TiColumn:
    if json or duration:
        # both surface as STRING on the engine side (canonical JSON text /
        # "[-]HH:MM:SS[.ffffff]"), so the TiDB kind must be chosen
        # explicitly — StringType alone means a VARCHAR cell
        if json and duration:
            raise ValueError("a column is json OR duration, not both")
        if not isinstance(spark_type, T.StringType):
            raise ValueError("json/duration columns surface as StringType")
        kind = "json" if json else "duration"
        return TiColumn(col_id, name, spark_type, kind, False)
    if isinstance(spark_type, T.DecimalType):
        kind = "decimal"
    else:
        kind = _KIND_BY_TYPE.get(type(spark_type))
    if kind is None:
        raise NotImplementedError(
            "TiDB cell codec gated for %s" % spark_type)
    if unsigned:
        if kind != "int":
            raise ValueError("unsigned only applies to integer columns")
        kind = "uint"
    if pk_handle and kind not in ("int", "uint"):
        raise ValueError("the handle PK is an integer rowid")
    return TiColumn(col_id, name, spark_type, kind, pk_handle)


@dataclass(frozen=True)
class TiTableInfo:
    table_id: int
    columns: tuple[TiColumn, ...]

    def payload_schema(self) -> T.StructType:
        return T.StructType([T.StructField(c.name, c.spark_type, True)
                             for c in self.columns])

    # cached_property (not @property): the row decoders hit these once
    # per ROW on the CDC hot path — µs/row parity work (optimization r11,
    # guide §1.2 per-task work).  Writes go through instance __dict__, so
    # they compose with frozen=True.
    @cached_property
    def handle_column(self) -> TiColumn | None:
        for c in self.columns:
            if c.pk_handle:
                return c
        return None

    @cached_property
    def value_columns(self) -> tuple[TiColumn, ...]:
        """Columns stored in the row VALUE (pk-is-handle lives in the key)."""
        return tuple(c for c in self.columns if not c.pk_handle)

    @cached_property
    def _by_col_id(self) -> dict:
        return {c.col_id: c for c in self.value_columns}

    @cached_property
    def _null_row(self) -> dict:
        return {c.name: None for c in self.value_columns}


# ---------------------------------------------------------------------------
# cell <-> python value (by column kind)
# ---------------------------------------------------------------------------


def duration_to_nanos(v) -> int:
    """``[-]HH:MM:SS[.ffffff]`` text (or a timedelta / raw nanosecond
    int) -> the signed int64 nanosecond count a DURATION datum stores."""
    if isinstance(v, datetime.timedelta):
        return round(v.total_seconds() * 1_000_000) * 1000
    if isinstance(v, int):
        return v
    m = _re.fullmatch(r"(-?)(\d+):(\d{1,2}):(\d{1,2})(?:\.(\d{1,6}))?",
                      str(v))
    if not m:
        raise ValueError("not a duration literal: %r" % (v,))
    sign, h, mi, s, frac = m.groups()
    if int(mi) > 59 or int(s) > 59:
        raise ValueError("not a duration literal: %r" % (v,))
    us = int((frac or "").ljust(6, "0"))
    n = ((int(h) * 3600 + int(mi) * 60 + int(s)) * 1_000_000 + us) * 1000
    return -n if sign else n


def nanos_to_duration(n: int) -> str:
    """Nanoseconds -> the shared ``[-]HH:MM:SS[.ffffff]`` render
    (common.types.hms_text — same convention as the binlog TIME2 path)."""
    neg, n = (True, -n) if n < 0 else (False, n)
    us, n = (n // 1000) % 1_000_000, n // 1_000_000_000
    return hms_text(neg, n // 3600, (n // 60) % 60, n % 60, us)


def _to_datum(col: TiColumn, v):
    """Python value -> (kind, wire value) for either row format."""
    if v is None:
        return None
    if col.kind == "date":
        return "uint", pack_mysql_time(v.year, v.month, v.day)
    if col.kind == "datetime":
        return "uint", pack_mysql_time(v.year, v.month, v.day, v.hour,
                                       v.minute, v.second, v.microsecond)
    if col.kind == "decimal":
        dt = col.spark_type
        return "decimal", (dt.precision, dt.scale, str(v))
    if col.kind == "json":
        return "json", (_json.loads(v) if isinstance(v, str) else v)
    if col.kind == "duration":
        return "duration", duration_to_nanos(v)
    if col.kind == "string":
        return "string", str(v)
    if col.kind == "bytes":
        return "bytes", bytes(v)
    if col.kind == "float":
        return "float", float(v)
    return col.kind, int(v)


def _from_wire(col: TiColumn, kind: str, v):
    """Wire value (+ its wire kind) -> python value for `col`."""
    if v is None:
        return None
    if col.kind in ("date", "datetime"):
        y, mo, d, h, mi, s, us = unpack_mysql_time(int(v))
        if col.kind == "date":
            return datetime.date(y, mo, d)
        return datetime.datetime(y, mo, d, h, mi, s, us)
    if col.kind == "decimal":
        return decimal.Decimal(v) if not isinstance(v, decimal.Decimal) \
            else v
    if col.kind == "json":
        return dumps_json(v)
    if col.kind == "duration":
        return nanos_to_duration(int(v))
    if col.kind == "string":
        return v.decode("utf-8") if isinstance(v, bytes) else str(v)
    if col.kind == "bytes":
        return bytes(v) if isinstance(v, bytes) else str(v).encode()
    if col.kind == "float":
        return float(v)
    return int(v)


# ---------------------------------------------------------------------------
# row format v1 ("old row": colID datum + value datum pairs)
# ---------------------------------------------------------------------------

_NIL, _BYTES, _COMPACT_BYTES = 0x00, 0x01, 0x02
_INT, _UINT, _FLOAT = 0x03, 0x04, 0x05
_DECIMAL, _DURATION = 0x06, 0x07
_VARINT, _UVARINT = 0x08, 0x09
_JSON = 0x0A


def _encode_datum(kind: str | None, v) -> bytes:
    if kind is None or v is None:
        return bytes([_NIL])
    if kind == "int":
        return bytes([_VARINT]) + encode_varint(v)
    if kind == "uint":
        return bytes([_UVARINT]) + encode_uvarint(v)
    if kind == "float":
        return bytes([_FLOAT]) + encode_comparable_float(v)
    if kind in ("string", "bytes"):
        data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return bytes([_COMPACT_BYTES]) + encode_varint(len(data)) + data
    if kind == "decimal":
        # codec.go EncodeDecimal: flag, precision, frac, WriteBin bytes
        # (byte-identical to the binlog NEWDECIMAL codec)
        prec, scale, text = v
        return (bytes([_DECIMAL, prec, scale])
                + encode_newdecimal(text, prec, scale))
    if kind == "duration":
        # codec.go duration case: EncodeInt of time.Duration nanoseconds
        return bytes([_DURATION]) + encode_comparable_int(v)
    if kind == "json":
        # codec.go json case: flag + TypeCode + binary value
        return bytes([_JSON]) + encode_json(v)
    raise NotImplementedError("datum codec gated for kind %r" % kind)


def _decode_datum(buf: bytes, pos: int):
    flag = buf[pos]
    pos += 1
    if flag == _NIL:
        return None, pos
    if flag == _VARINT:
        return decode_varint(buf, pos)
    if flag == _UVARINT:
        return decode_uvarint(buf, pos)
    if flag == _INT:
        return decode_comparable_int(buf, pos)
    if flag == _UINT:
        v = struct.unpack_from(">Q", buf, pos)[0]
        return v, pos + 8
    if flag == _FLOAT:
        return decode_comparable_float(buf, pos)
    if flag == _COMPACT_BYTES:
        n, pos = decode_varint(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated compact-bytes datum: need %d bytes, "
                             "have %d" % (n, len(buf) - pos))
        return bytes(buf[pos:pos + n]), pos + n
    if flag == _BYTES:
        return decode_comparable_bytes(buf, pos)
    if flag == _DECIMAL:
        prec, scale = buf[pos], buf[pos + 1]
        n = decimal_bin_size(prec, scale)
        if pos + 2 + n > len(buf):
            raise ValueError(
                "truncated DECIMAL(%d,%d) datum: need %d bytes, have %d"
                % (prec, scale, n, len(buf) - pos - 2))
        text = decode_newdecimal(buf[pos + 2:pos + 2 + n], prec, scale)
        return decimal.Decimal(text), pos + 2 + n
    if flag == _DURATION:
        return decode_comparable_int(buf, pos)
    if flag == _JSON:
        # JSON datums have no length prefix: the decode itself yields the
        # end position (json.PeekBytesAsJSON analog)
        return decode_json_at(buf, pos)
    raise NotImplementedError("datum flag 0x%02x gated" % flag)


def encode_row_v1(table: TiTableInfo, row: dict) -> bytes:
    """`tablecodec.EncodeOldRow`: (colID varint datum, value datum) pairs."""
    out = bytearray()
    for col in table.value_columns:
        d = _to_datum(col, row.get(col.name))
        out += _encode_datum("int", col.col_id)
        out += _encode_datum(*d) if d else bytes([_NIL])
    return bytes(out) if out else bytes([_NIL])


def decode_row_v1(table: TiTableInfo, buf: bytes) -> dict:
    by_id = table._by_col_id
    row = dict(table._null_row)
    if len(buf) <= 1:
        return row
    pos = 0
    while pos < len(buf):
        col_id, pos = _decode_datum(buf, pos)
        v, pos = _decode_datum(buf, pos)
        col = by_id.get(col_id)
        if col is not None:
            row[col.name] = _from_wire(col, col.kind, v)
    return row


# ---------------------------------------------------------------------------
# row format v2 (RFC 2018-07-19-row-format)
# ---------------------------------------------------------------------------

CODEC_VER = 0x80


def _v2_cell(kind: str, v) -> bytes:
    if kind in ("int", "duration"):
        # rowcodec encodes Duration as its nanosecond int64 (same
        # minimal-width little-endian layout as plain ints)
        for w in (1, 2, 4, 8):
            lo, hi = -(1 << (8 * w - 1)), (1 << (8 * w - 1)) - 1
            if lo <= v <= hi:
                return int(v).to_bytes(w, "little", signed=True)
    if kind == "uint":
        for w in (1, 2, 4, 8):
            if v < (1 << (8 * w)):
                return int(v).to_bytes(w, "little")
    if kind == "float":
        return encode_comparable_float(v)
    if kind in ("string", "bytes"):
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)
    if kind == "decimal":
        # rowcodec stores codec.EncodeDecimal output (no flag byte):
        # precision, frac, then the shared packed-decimal bytes
        prec, scale, text = v
        return bytes([prec, scale]) + encode_newdecimal(text, prec, scale)
    if kind == "json":
        # rowcodec stores TypeCode + binary value = the whole document
        return encode_json(v)
    raise NotImplementedError("v2 cell codec gated for kind %r" % kind)


def _v2_uncell(col: TiColumn, cell: bytes):
    k = col.kind if col.kind not in ("date", "datetime") else "uint"
    if k in ("int", "duration"):
        return _from_wire(col, k,
                          int.from_bytes(cell, "little", signed=True))
    if k == "uint":
        return _from_wire(col, k, int.from_bytes(cell, "little"))
    if k == "float":
        return decode_comparable_float(cell)[0]
    if k == "decimal":
        if len(cell) < 2:
            raise ValueError("truncated DECIMAL cell: %r" % (bytes(cell),))
        prec, scale = cell[0], cell[1]
        n = decimal_bin_size(prec, scale)
        if len(cell) != 2 + n:
            raise ValueError(
                "DECIMAL(%d,%d) cell is %d bytes, wire format needs %d"
                % (prec, scale, len(cell), 2 + n))
        return _from_wire(col, k, decode_newdecimal(cell[2:], prec, scale))
    if k == "json":
        return _from_wire(col, k, decode_json(bytes(cell)))
    return _from_wire(col, k, bytes(cell))


def encode_row_v2(table: TiTableInfo, row: dict) -> bytes:
    cells: list[tuple[int, bytes]] = []
    nulls: list[int] = []
    for col in table.value_columns:
        d = _to_datum(col, row.get(col.name))
        if d is None:
            nulls.append(col.col_id)
        else:
            cells.append((col.col_id, _v2_cell(*d)))
    cells.sort()
    nulls.sort()
    total = sum(len(c) for _, c in cells)
    big = total > 0xFFFF or any(
        cid > 0xFF for cid in [c for c, _ in cells] + nulls)
    id_fmt, off_fmt = ("<I", "<I") if big else ("<B", "<H")
    out = bytearray([CODEC_VER, 0x01 if big else 0x00])
    out += struct.pack("<HH", len(cells), len(nulls))
    for cid, _ in cells:
        out += struct.pack(id_fmt, cid)
    for cid in nulls:
        out += struct.pack(id_fmt, cid)
    end = 0
    for _, cell in cells:
        end += len(cell)
        out += struct.pack(off_fmt, end)
    for _, cell in cells:
        out += cell
    return bytes(out)


def decode_row_v2(table: TiTableInfo, buf: bytes) -> dict:
    if buf[0] != CODEC_VER:
        raise ValueError("not a v2 row (version byte 0x%02x)" % buf[0])
    big = buf[1] & 0x01
    n_notnull, n_null = struct.unpack_from("<HH", buf, 2)
    id_w, off_fmt, off_w = (4, "<I", 4) if big else (1, "<H", 2)
    header_len = 6 + (n_notnull + n_null) * id_w + n_notnull * off_w
    if len(buf) < header_len:
        raise ValueError(
            "truncated v2 row: %d-byte buffer, %d-byte header for "
            "%d+%d columns" % (len(buf), header_len, n_notnull, n_null))
    pos = 6
    ids = [int.from_bytes(buf[pos + i * id_w:pos + (i + 1) * id_w], "little")
           for i in range(n_notnull)]
    pos += (n_notnull + n_null) * id_w
    offs = [struct.unpack_from(off_fmt, buf, pos + i * off_w)[0]
            for i in range(n_notnull)]
    pos += n_notnull * off_w
    data_len = len(buf) - pos
    # flag bit 0x08 marks a row-level checksum suffix after the value
    # section (TiDB >= 6.x with tidb_enable_row_level_checksum=ON): cells
    # then tile a PREFIX of the data section and the trailing checksum
    # bytes are ignored; without the flag the offsets must tile exactly
    has_checksum = bool(buf[1] & 0x08)
    last = offs[-1] if offs else 0
    if any(a > b for a, b in zip(offs, offs[1:])) or (
            last > data_len if has_checksum else last != data_len):
        raise ValueError(
            "corrupt v2 row: cell offsets %r do not tile the %d-byte data "
            "section" % (offs, data_len))
    by_id = table._by_col_id
    row = dict(table._null_row)
    start = 0
    for cid, end in zip(ids, offs):
        cell = buf[pos + start:pos + end]
        start = end
        col = by_id.get(cid)
        if col is not None:
            row[col.name] = _v2_uncell(col, cell)
    return row


def decode_row(table: TiTableInfo, buf: bytes, handle: int) -> dict:
    """`TableCodec.decodeObjects` analog: sniff version, fill the handle PK."""
    row = (decode_row_v2(table, buf) if buf[:1] and buf[0] == CODEC_VER
           else decode_row_v1(table, buf))
    hc = table.handle_column
    if hc is not None:
        row[hc.name] = handle
    return row


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

#: one TiKV region-CDC row event (Cdcpb.Event.Row surface the reference
#: deserializer consumes: op_type, key, value, old_value, commit_ts).
TIDB_KV_SCHEMA = T.StructType([
    T.StructField("op_type", T.StringType(), False),
    T.StructField("key", T.BinaryType(), False),
    T.StructField("value", T.BinaryType(), True),
    T.StructField("old_value", T.BinaryType(), True),
    T.StructField("commit_ts", T.LongType(), False),
])


def _envelope_schema(table: TiTableInfo) -> T.StructType:
    payload = table.payload_schema()
    return T.StructType(list(payload.fields) + [
        T.StructField(OP_COL, T.StringType(), False),
        T.StructField(BEFORE_COL, payload, True),
        T.StructField(META_COL,
                      T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(SEQ_COL, T.LongType(), True),
    ])


def decode_tidb_kv(kv: DataFrame, table: TiTableInfo) -> DataFrame:
    """Raw TiKV CDC events -> engine changelog envelope.

    Reference switch (`RowDataTiKVChangeEventDeserializationSchema.java:
    67-105`): DELETE -> -D decoded from ``old_value``; PUT with empty
    ``old_value`` -> +I from ``value``; PUT with an old value -> +U from
    ``value``.  The reference emits UPDATE_AFTER only (it throws the old
    image away); we additionally surface it as ``__before`` since the wire
    carries it — downstream retract consumers then need no
    ChangelogNormalize pass.  Non-record keys (index keys) are skipped.
    ``__seq`` is ``commit_ts`` (TSO order); metadata carries table_id /
    handle / commit ts (TiKVReadableMetadata surface).
    """
    import pandas as pd

    schema = _envelope_schema(table)
    names = [f.name for f in schema.fields]
    payload_cols = [c.name for c in table.columns]

    tid_str = str(table.table_id)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # columnar accumulation (optimization r11, guide §1.2 per-task
        # work): append straight into per-column lists instead of one
        # dict per record re-pivoted column-by-column afterwards —
        # removes O(rows × cols) dict churn from the decode hot loop
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            ops, befores, metas, seqs = (cols[OP_COL], cols[BEFORE_COL],
                                         cols[META_COL], cols[SEQ_COL])
            for op_type, key, value, old, crts in zip(
                    pdf["op_type"], pdf["key"], pdf["value"],
                    pdf["old_value"], pdf["commit_ts"]):
                key = bytes(key)
                if not is_record_key(key):
                    continue
                _, handle = decode_record_key(key)
                old = bytes(old) if old is not None else b""
                if op_type == "DELETE":
                    row = decode_row(table, old, handle)
                    op, before = "-D", None
                elif op_type == "PUT":
                    row = decode_row(table, bytes(value), handle)
                    if old:
                        op, before = "+U", decode_row(table, old, handle)
                    else:
                        op, before = "+I", None
                else:
                    raise ValueError("Unknown Row Op Type: %r" % op_type)
                for c in payload_cols:
                    cols[c].append(row[c])
                ops.append(op)
                befores.append(
                    {c: before.get(c) for c in payload_cols}
                    if before is not None else None)
                metas.append({"table_id": tid_str,
                              "handle": str(handle),
                              "commit_ts": str(int(crts))})
                seqs.append(int(crts))
            yield pd.DataFrame(
                {n: pd.Series(cols[n], dtype=object) for n in names})

    return kv.mapInPandas(run, schema=schema)


def decode_tidb_snapshot(kv: DataFrame, table: TiTableInfo,
                         snapshot_ts: int | None = None) -> DataFrame:
    """Region-scan (key, value) pairs at a ts -> +I rows (snapshot schema)."""
    with_cols = kv
    if "op_type" not in kv.columns:
        with_cols = with_cols.withColumn("op_type", F.lit("PUT"))
    if "old_value" not in kv.columns:
        with_cols = with_cols.withColumn(
            "old_value", F.lit(None).cast("binary"))
    if "commit_ts" not in kv.columns:
        with_cols = with_cols.withColumn(
            "commit_ts", F.lit(snapshot_ts or 0).cast("long"))
    return decode_tidb_kv(
        with_cols.select(*[f.name for f in TIDB_KV_SCHEMA.fields]), table)


def encode_tidb_kv(df: DataFrame, table: TiTableInfo, *,
                   after_col: str = "after", before_col: str = "before",
                   op_type_col: str = "op_type",
                   commit_ts_col: str = "commit_ts",
                   value_version: int = 2,
                   old_value_version: int = 1) -> DataFrame:
    """Scripted images -> wire-true TiKV CDC events (the test/fixture path).

    Input rows carry an ``after`` struct (null for deletes), an optional
    ``before`` struct (old value), ``op_type`` PUT|DELETE and a
    ``commit_ts``.  ``value_version``/``old_value_version`` pick the row
    format per field (TiKV clusters migrate v1 -> v2 in place, so a CDC
    consumer sees both; defaults exercise v2 values with v1 old rows).
    """
    import pandas as pd

    enc = {1: encode_row_v1, 2: encode_row_v2}
    enc_value, enc_old = enc[value_version], enc[old_value_version]
    hc = table.handle_column
    if hc is None:
        raise ValueError("encode_tidb_kv needs a pk_handle column")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ops, keys, vals, olds, tss = [], [], [], [], []
            for op_type, after, before, crts in zip(
                    pdf[op_type_col], pdf[after_col], pdf[before_col],
                    pdf[commit_ts_col]):
                image = after if after is not None else before
                handle = int(image[hc.name])
                ops.append(str(op_type))
                keys.append(encode_record_key(table.table_id, handle))
                vals.append(enc_value(table, dict(after))
                            if after is not None else b"")
                olds.append(enc_old(table, dict(before))
                            if before is not None else b"")
                tss.append(int(crts))
            yield pd.DataFrame({
                "op_type": pd.Series(ops, dtype=object),
                "key": pd.Series(keys, dtype=object),
                "value": pd.Series(vals, dtype=object),
                "old_value": pd.Series(olds, dtype=object),
                "commit_ts": pd.Series(tss, dtype=object),
            })

    return df.mapInPandas(run, schema=TIDB_KV_SCHEMA)

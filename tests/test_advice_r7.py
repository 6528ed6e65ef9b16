"""Regression tests for the round-6 ADVICE findings (fixed in round 7).

1. binlog_socket.fetch_binlog_files: an existing spool file with the SAME
   byte size but DIFFERENT content must be rewritten (content-compared,
   not size-trusted), and identical files are excluded from the return.
2. ddl_parser: a double-quoted qualified part containing a
   backslash-escaped quote before a dot must split at the REAL dot
   (_split_qualified now mirrors _TOKEN_RE's escape rule).
3. LogMiner CSF guard: a CSF=1 chain whose first fragment is an EMPTY
   sql_redo still pins the chain position — a mismatched continuation
   row raises instead of splicing, and a dangling empty-fragment chain
   at EOF still raises.
"""

import json
import os

import pytest

from tests.test_advice_r6 import _logminer_lines_to_records, _redo_line


# ---------------------------------------------------------------- binlog TCP

def test_fetch_rewrites_same_size_different_content(tmp_path):
    from source_flink_cdc_3_5_0_spark.sources.binlog_socket import (
        BinlogTcpServer, fetch_binlog_files)

    served = tmp_path / "served"
    spool = tmp_path / "spool"
    served.mkdir()
    spool.mkdir()
    (served / "binlog.000001").write_bytes(b"NEW-BYTES-XY")
    # stale spool file, SAME size, different bytes
    (spool / "binlog.000001").write_bytes(b"OLD-BYTES-AB")

    with BinlogTcpServer(str(served)) as srv:
        fetched = fetch_binlog_files("127.0.0.1", srv.port, str(spool))
    assert fetched == ["binlog.000001"]
    assert (spool / "binlog.000001").read_bytes() == b"NEW-BYTES-XY"


def test_fetch_skips_identical_file_and_omits_from_return(tmp_path):
    from source_flink_cdc_3_5_0_spark.sources.binlog_socket import (
        BinlogTcpServer, fetch_binlog_files)

    served = tmp_path / "served"
    spool = tmp_path / "spool"
    served.mkdir()
    spool.mkdir()
    (served / "binlog.000001").write_bytes(b"SAME")
    (served / "binlog.000002").write_bytes(b"ONLY-ON-SERVER")
    (spool / "binlog.000001").write_bytes(b"SAME")
    before = os.stat(spool / "binlog.000001").st_mtime_ns

    with BinlogTcpServer(str(served)) as srv:
        fetched = fetch_binlog_files("127.0.0.1", srv.port, str(spool))
    # identical file untouched and excluded; new file fetched
    assert fetched == ["binlog.000002"]
    assert os.stat(spool / "binlog.000001").st_mtime_ns == before


# ---------------------------------------------------------------- DDL parser

def test_quoted_part_escapes_are_dialect_scoped():
    from source_flink_cdc_3_5_0_spark.common.ddl_parser import (
        _split_qualified, parse_ddl)

    # MySQL: "..." is a string form with backslash escapes — the escaped
    # quote must not close the part; split at the REAL dot
    assert _split_qualified('"a\\"b".c', "mysql") == ['"a\\"b"', "c"]
    # Oracle: "..." is an IDENTIFIER, no backslash escapes — an
    # identifier ending in a backslash still closes at its real quote
    # (the escape rule would swallow it and lose the schema split)
    assert _split_qualified('"A\\".C', "oracle") == ['"A\\"', "C"]
    [ev] = parse_ddl('TRUNCATE TABLE "INV"."A\\"', dialect="oracle")
    assert (ev.table_id.schema_name, ev.table_id.table_name) == \
        ("INV", "A\\")
    # backticked parts take no escapes in any dialect
    assert _split_qualified("`a.b`.c") == ["`a.b`", "c"]


def test_mysql_string_with_escaped_quote_still_one_token():
    from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_ddl

    [ev] = parse_ddl('ALTER TABLE t ADD c INT COMMENT "x\\".y\\"z"',
                     database="db")
    assert ev.added_columns[0].column.comment == 'x\\".y\\"z'


# ------------------------------------------------------------- LogMiner CSF

def test_csf_chain_opened_by_empty_fragment_still_guards(spark):
    lines = [
        _redo_line(10, "AAA1", 1, ""),  # empty first fragment opens chain
        _redo_line(11, "AAA2", 0, 'insert into "S"."T"("A") values (1)'),
    ]
    with pytest.raises(Exception, match="does not match the open chain"):
        _logminer_lines_to_records(spark, lines)


def test_csf_dangling_empty_fragment_at_eof_raises(spark):
    lines = [_redo_line(10, "AAA1", 1, "")]
    with pytest.raises(Exception, match="CSF continuation chain"):
        _logminer_lines_to_records(spark, lines)


# ---------------------------------------------------------------------------
# Known-answer vectors for the round-6 cell codecs (verdict r6 item 6):
# public-documented byte strings pin the wire layouts so a SYMMETRIC
# encoder/decoder misunderstanding cannot pass the round-trip tests.
# ---------------------------------------------------------------------------

def test_wkb_multipoint_known_answer():
    """OGC 99-049 WKBMultiPoint: every member point carries its own
    byte-order + type header. MULTIPOINT((1 2),(3 4)), NDR."""
    import json

    from source_flink_cdc_3_5_0_spark.functions.geo import wkb_to_geojson

    wkb = bytes.fromhex(
        "01" "04000000" "02000000"
        "01" "01000000" "000000000000F03F" "0000000000000040"
        "01" "01000000" "0000000000000840" "0000000000001040")
    doc = json.loads(wkb_to_geojson(wkb, srid=0))
    assert doc == {"type": "MultiPoint",
                   "coordinates": [[1.0, 2.0], [3.0, 4.0]], "srid": 0}


def test_wkb_geometrycollection_known_answer():
    """The OGC/SFA doc example GEOMETRYCOLLECTION(POINT(4 6),
    LINESTRING(4 6,7 10)), NDR."""
    import json

    from source_flink_cdc_3_5_0_spark.functions.geo import wkb_to_geojson

    wkb = bytes.fromhex(
        "01" "07000000" "02000000"
        "01" "01000000" "0000000000001040" "0000000000001840"
        "01" "02000000" "02000000"
        "0000000000001040" "0000000000001840"
        "0000000000001C40" "0000000000002440")
    doc = json.loads(wkb_to_geojson(wkb, srid=4326))
    assert doc["type"] == "GeometryCollection"
    assert doc["geometries"] == [
        {"type": "Point", "coordinates": [4.0, 6.0]},
        {"type": "LineString", "coordinates": [[4.0, 6.0], [7.0, 10.0]]}]


def test_char_gt255_table_map_metadata_known_answer():
    """Field_string packed metadata (MySQL Internals manual / log_event.cc
    layout): CHAR with byte length 300 packs the length's two high bits
    INVERTED into the real-type byte's 0x30 slot — bytes EE 2C."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_STRING, BinlogColumn, _meta_bytes, _parse_meta)

    col = BinlogColumn("c", MYSQL_TYPE_STRING, (MYSQL_TYPE_STRING, 300))
    assert _meta_bytes(col) == bytes([0xEE, 0x2C])
    meta, _ = _parse_meta(MYSQL_TYPE_STRING, bytes([0xEE, 0x2C]), 0)
    assert meta == (MYSQL_TYPE_STRING, 300)
    # the short form stays unpacked: CHAR(80) = FE 50
    col80 = BinlogColumn("c", MYSQL_TYPE_STRING, (MYSQL_TYPE_STRING, 80))
    assert _meta_bytes(col80) == bytes([0xFE, 0x50])
    assert _parse_meta(MYSQL_TYPE_STRING,
                       bytes([0xFE, 0x50]), 0)[0] == (MYSQL_TYPE_STRING, 80)


def test_json_opaque_decimal_known_answer():
    """J_OPAQUE DECIMAL (json_binary.h opaque layout + the strings/
    decimal.c pinned example): type 0x0F, field type 246, varlen 9,
    [precision 14][scale 4] + NEWDECIMAL bytes 810DFB38D204D2
    = DECIMAL(14,4) 1234567890.1234."""
    import decimal

    from source_flink_cdc_3_5_0_spark.common.mysql_json import decode_json

    doc = bytes.fromhex("0F" "F6" "09" "0E04" "810DFB38D204D2")
    assert decode_json(doc) == decimal.Decimal("1234567890.1234")

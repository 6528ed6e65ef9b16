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

def test_oracle_quoted_part_with_escaped_quote_before_dot():
    from source_flink_cdc_3_5_0_spark.common.ddl_parser import (
        _split_qualified)

    # the escaped quote must not close the part: split at the REAL dot
    assert _split_qualified('"a\\"b".c') == ['"a\\"b"', "c"]
    # backticked parts take no escapes (MySQL doubles backticks)
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

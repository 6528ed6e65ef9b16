"""The binlog TCP transport (round-6, verdict r5 item 6): the same wire
codec, served over a localhost socket by a toy replication server instead
of read from the filesystem — proving the decode path never depended on
the transport. Reference architecture: Debezium's BinaryLogClient issuing
COM_BINLOG_DUMP(file, pos) against mysqld."""

import json

import pytest

from source_flink_cdc_3_5_0_spark.sources.binlog_socket import (
    BinlogTcpServer, fetch_binlog_files)
from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
    DELETE_ROWS_EVENT, MYSQL_TYPE_LONG, MYSQL_TYPE_VARCHAR,
    UPDATE_ROWS_EVENT, WRITE_ROWS_EVENT, BinlogColumn, BinlogTableMap,
    BinlogWriter)

TMAP = BinlogTableMap(7, "db", "t", (
    BinlogColumn("id", MYSQL_TYPE_LONG, (), False),
    BinlogColumn("v", MYSQL_TYPE_VARCHAR, (255,))), (0,))


def _write_fixture(d):
    w = BinlogWriter()
    w.table_map(TMAP)
    w.rows(TMAP, WRITE_ROWS_EVENT,
           [dict(id=1, v="x"), dict(id=2, v="y"), dict(id=3, v="z")])
    w.rotate("mysql-bin.000002")
    (d / "mysql-bin.000001").write_bytes(w.getvalue())
    w2 = BinlogWriter()
    w2.table_map(TMAP)
    w2.rows(TMAP, UPDATE_ROWS_EVENT, [(dict(id=2, v="y"), dict(id=2, v="y2"))])
    w2.rows(TMAP, DELETE_ROWS_EVENT, [dict(id=3, v="z")])
    (d / "mysql-bin.000002").write_bytes(w2.getvalue())


def test_fetch_roundtrips_bytes(tmp_path):
    src = tmp_path / "served"
    src.mkdir()
    _write_fixture(src)
    spool = tmp_path / "spool"
    with BinlogTcpServer(str(src)) as srv:
        got = fetch_binlog_files(srv.host, srv.port, str(spool))
    assert got == ["mysql-bin.000001", "mysql-bin.000002"]
    for n in got:
        assert (spool / n).read_bytes() == (src / n).read_bytes()


def test_fetch_from_file_skips_rotated_history(tmp_path):
    src = tmp_path / "served"
    src.mkdir()
    _write_fixture(src)
    spool = tmp_path / "spool"
    with BinlogTcpServer(str(src)) as srv:
        got = fetch_binlog_files(srv.host, srv.port, str(spool),
                                 from_file="mysql-bin.000002")
    assert got == ["mysql-bin.000002"]


def test_refetch_same_size_is_noop(tmp_path):
    src = tmp_path / "served"
    src.mkdir()
    _write_fixture(src)
    spool = tmp_path / "spool"
    with BinlogTcpServer(str(src)) as srv:
        first = fetch_binlog_files(srv.host, srv.port, str(spool))
        again = fetch_binlog_files(srv.host, srv.port, str(spool))
    assert len(first) == 2 and again == []


def test_server_rejects_garbage_and_client_rejects_traversal(tmp_path):
    import socket

    src = tmp_path / "served"
    src.mkdir()
    _write_fixture(src)
    with BinlogTcpServer(str(src)) as srv:
        with socket.create_connection((srv.host, srv.port), 5) as s:
            s.sendall(b"NOPE\n")
            assert s.makefile("rb").readline().startswith(b"ERR")


def test_yaml_binlog_over_tcp_e2e(spark, tmp_path):
    """YAML `type: mysql-binlog-file` with host/port instead of path: the
    composer fetches over the socket into a spool and the SAME pipeline
    (wire-native inference, Arrow decode, sink, persisted BinlogOffset)
    runs green."""
    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink

    src = tmp_path / "served"
    src.mkdir()
    _write_fixture(src)
    with BinlogTcpServer(str(src)) as srv:
        yaml_text = f"""
source:
  type: mysql-binlog-file
  host: {srv.host}
  port: {srv.port}
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
"""
        pdef = parse_yaml_pipeline(yaml_text)
        composer = PipelineComposer(spark)
        sink = MemorySink()
        pipe, raw, tables = composer.compose_streaming(pdef, sink=sink)
        q = pipe.start(raw, tables)
        q.awaitTermination(120)
    assert sink.snapshot(TableId.parse("db.t")) == ["1, x", "2, y2"]
    off = pipe.binlog_offset()
    assert off is not None and off.filename == "mysql-bin.000002"


def test_yaml_pgoutput_over_tcp_e2e(spark, tmp_path):
    """The same TCP transport serves pgoutput captures: YAML
    `type: pgoutput-file` with host/port spools over the socket and the
    wire-native pipeline (Relation inference, bridge, sink, persisted
    PostgresOffset) runs green."""
    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
    from source_flink_cdc_3_5_0_spark.sources.pgoutput import (
        PgColumn, PgOutputWriter, PgRelation)

    rel = PgRelation(900, "public", "pt", "d", (
        PgColumn("id", 20, key=True), PgColumn("s", 25)))
    w = PgOutputWriter()
    w.relation(rel)
    w.begin()
    w.insert(rel, {"id": 1, "s": "a"})
    w.insert(rel, {"id": 2, "s": "b"})
    w.commit()
    w.begin()
    w.update(rel, {"id": 1}, {"id": 1, "s": "a2"})
    w.commit()
    src = tmp_path / "served"
    src.mkdir()
    (src / "pg.000001").write_bytes(w.getvalue())

    with BinlogTcpServer(str(src)) as srv:
        yaml_text = f"""
source:
  type: pgoutput-file
  host: {srv.host}
  port: {srv.port}
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
"""
        pdef = parse_yaml_pipeline(yaml_text)
        composer = PipelineComposer(spark)
        sink = MemorySink()
        pipe, raw, tables = composer.compose_streaming(pdef, sink=sink)
        q = pipe.start(raw, tables)
        q.awaitTermination(120)
    assert sink.snapshot(TableId.parse("public.pt")) == ["1, a2", "2, b"]
    assert pipe.binlog_offset() is not None

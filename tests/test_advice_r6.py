"""Regression tests for the round-5 ADVICE findings (fixed in round 6).

1. pgoutput: capture file ending inside an uncommitted (normal or v2
   streamed) transaction must raise, never silently drop buffered records.
2. LogMiner: a dangling CSF chain at EOF must raise, and continuation rows
   must share the chain's (scn, row_id) — a missing line must not splice
   two statements.
3. SQL Server: an op-4 UPDATE after-image with no paired op-3 row in the
   batch must surface an error, not emit a +U with a null before-image.
4. SQL Server ``changed_columns``: masks with bit 63 set must decode (the
   single 64-bit ``conv().cast('long')`` used to overflow to null).
5. One meta time convention: decode_binlog stores ``ts_ms`` in millis, so
   transform.py's op_ts metadata column and encode_debezium agree across
   the direct-decode and bridge paths.
"""

import json

import pytest
from pyspark.sql import functions as F, types as T

from source_flink_cdc_3_5_0_spark.sources.pgoutput import (
    PgColumn, PgOutputWriter, PgRelation, pgoutput_changes)
from source_flink_cdc_3_5_0_spark.sources.sqlserver import (
    SqlServerCdcWriter, changed_columns, decode_sqlserver_cdc)

OID_INT8, OID_TEXT = 20, 25

REL = PgRelation(16384, "public", "t", "d", (
    PgColumn("id", OID_INT8, key=True), PgColumn("v", OID_TEXT)))


def test_pgoutput_eof_inside_txn_raises():
    w = PgOutputWriter()
    w.relation(REL)
    w.begin()
    w.insert(REL, {"id": 1, "v": "a"})
    # no commit: the buffered insert must not vanish silently
    with pytest.raises(ValueError, match="uncommitted transaction"):
        pgoutput_changes(w.getvalue())


def test_pgoutput_eof_inside_streamed_txn_raises():
    w = PgOutputWriter()
    w.relation(REL)
    w.stream_start(900)
    w.insert(REL, {"id": 1, "v": "a"})
    w.stream_stop()
    # stream segment closed but never Stream Commit/Abort-ed
    with pytest.raises(ValueError, match="open streamed transactions"):
        pgoutput_changes(w.getvalue())


def test_pgoutput_empty_begin_at_eof_is_fine():
    """A Begin with zero records and no Commit loses nothing — no raise."""
    w = PgOutputWriter()
    w.relation(REL)
    w.begin()
    w.insert(REL, {"id": 1, "v": "a"})
    w.commit()
    w.begin()  # empty open transaction at EOF
    recs = [c for c in pgoutput_changes(w.getvalue())
            if c["kind"] == "change"]
    assert len(recs) == 1 and recs[0]["op"] == "+I"


def _logminer_lines_to_records(spark, lines):
    from source_flink_cdc_3_5_0_spark.sources.oracle import (
        logminer_to_debezium_json)

    df = spark.createDataFrame(
        [("f1", bytearray("\n".join(lines).encode()))],
        "path STRING, content BINARY")
    return logminer_to_debezium_json(df).collect()


def _redo_line(scn, row_id, csf, sql, op=1):
    return json.dumps({"scn": scn, "operation": op, "seg_owner": "S",
                       "table": "T", "row_id": row_id, "ts_ms": 1,
                       "csf": csf, "sql_redo": sql})


def test_logminer_dangling_csf_at_eof_raises(spark):
    lines = [_redo_line(10, "AAA1", 1, 'insert into "S"."T"("A") val')]
    with pytest.raises(Exception, match="CSF continuation chain"):
        _logminer_lines_to_records(spark, lines)


def test_logminer_csf_chain_position_mismatch_raises(spark):
    lines = [
        _redo_line(10, "AAA1", 1, 'insert into "S"."T"("A") values ('),
        _redo_line(11, "AAA2", 0, "1);"),  # different scn/row_id: spliced
    ]
    with pytest.raises(Exception, match="does not match the open chain"):
        _logminer_lines_to_records(spark, lines)


def test_logminer_csf_chain_same_position_reassembles(spark):
    lines = [
        _redo_line(10, "AAA1", 1, 'insert into "S"."T"("A") val'),
        _redo_line(10, "AAA1", 0, "ues (7);"),
    ]
    recs = _logminer_lines_to_records(spark, lines)
    assert len(recs) == 1
    assert json.loads(recs[0]["value"])["after"] == {"A": 7}


PAYLOAD = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("v", T.StringType())])


def test_sqlserver_unpaired_op4_raises(spark):
    w = SqlServerCdcWriter()
    w.begin_txn()
    # op 4 emitted alone (its op-3 partner "landed in the previous file")
    w._emit("t", 4, {"id": 1, "v": "after"}, 3)
    raw = spark.createDataFrame([(line,) for line in w.lines], "value STRING")
    out = decode_sqlserver_cdc(raw, PAYLOAD)
    with pytest.raises(Exception, match="no paired op-3"):
        out.collect()


def test_sqlserver_paired_update_still_decodes(spark):
    w = SqlServerCdcWriter()
    w.begin_txn()
    w.update("t", {"id": 1, "v": "a"}, {"id": 1, "v": "b"}, changed_mask=2)
    raw = spark.createDataFrame([(line,) for line in w.lines], "value STRING")
    rows = {r["__op"]: r for r in decode_sqlserver_cdc(raw, PAYLOAD).collect()}
    assert rows["+U"]["__before"]["v"] == "a" and rows["+U"]["v"] == "b"


def test_changed_columns_bit63(spark):
    """Bit 63 (and a full-width mask) must decode, not cast-overflow to
    an empty list."""
    wide = T.StructType([T.StructField("c%d" % i, T.LongType())
                         for i in range(64)])
    df = spark.createDataFrame(
        [("8000000000000000",), ("FFFFFFFFFFFFFFFF",), ("1",), ("80000001",)],
        "m STRING")
    got = [r[0] for r in
           df.select(changed_columns(F.col("m"), wide)).collect()]
    assert got[0] == "c63"
    assert got[1] == ",".join("c%d" % i for i in range(64))
    assert got[2] == "c0"
    assert got[3] == "c0,c31"


def test_binlog_meta_ts_ms_feeds_op_ts_metadata_column(spark, tmp_path):
    """decode_binlog's __meta carries ts_ms (millis): the transform
    op_ts metadata column and encode_debezium read the SAME key."""
    from source_flink_cdc_3_5_0_spark.common import Schema, TableId
    from source_flink_cdc_3_5_0_spark.common.schema import Column as C
    from source_flink_cdc_3_5_0_spark.api import transform_table
    from source_flink_cdc_3_5_0_spark.sources.debezium import encode_debezium
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_LONG, MYSQL_TYPE_VARCHAR, BinlogColumn, BinlogTableMap,
        BinlogWriter, decode_binlog, read_binlog_files)

    tmap = BinlogTableMap(9, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False),
        BinlogColumn("v", MYSQL_TYPE_VARCHAR, (255,))), (0,))
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, 30, [{"id": 1, "v": "x"}])  # WRITE_ROWS_EVENT
    (tmp_path / "mysql-bin.000001").write_bytes(w.getvalue())

    payload = T.StructType([T.StructField("id", T.LongType()),
                            T.StructField("v", T.StringType())])
    env = decode_binlog(read_binlog_files(spark, str(tmp_path)), "d", "t",
                        payload)
    [row] = env.collect()
    assert row["__meta"]["ts_ms"] == str(1_700_000_000 * 1000)
    assert "op_ts" not in row["__meta"]

    # transform metadata column resolves from ts_ms
    out = transform_table(env, projection="id, op_ts", table_id="d.s.t")
    assert out.collect()[0]["op_ts"] == 1_700_000_000_000

    # and the Kafka encode stamps the same millis
    schema = Schema.of(C("id", T.LongType()), C("v", T.StringType()),
                       primary_keys=["id"])
    enc = encode_debezium(env, TableId.parse("d.t"), schema).collect()
    assert json.loads(enc[0]["value"])["ts_ms"] == 1_700_000_000_000


# --- round-6 self-review regressions (oracle DDL dialect + JSON opaque) ---


def test_oracle_ddl_unquoted_identifiers_fold_uppercase():
    from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_ddl

    [ev] = parse_ddl("alter table orders add (note varchar2(10))",
                     database="INV", dialect="oracle")
    assert ev.table_id.identifier() == "INV.ORDERS"
    assert ev.added_columns[0].column.name == "NOTE"
    # quoted identifiers keep their exact case
    [ev2] = parse_ddl('alter table "inv"."Orders" add ("note" CLOB)',
                      dialect="oracle")
    assert ev2.table_id.identifier() == "inv.Orders"
    assert ev2.added_columns[0].column.name == "note"


def test_oracle_ddl_interval_types():
    from pyspark.sql import types as T

    from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_ddl

    [ev] = parse_ddl('ALTER TABLE "INV"."T" ADD '
                     '("SPAN" INTERVAL DAY(2) TO SECOND(6), '
                     '"AGE" INTERVAL YEAR TO MONTH)', dialect="oracle")
    got = {c.column.name: c.column.data_type for c in ev.added_columns}
    assert got == {"SPAN": T.DayTimeIntervalType(),
                   "AGE": T.YearMonthIntervalType()}


def test_oracle_ddl_quoted_name_with_dot():
    from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_ddl

    [ev] = parse_ddl('TRUNCATE TABLE "INV"."ORD.ERS"', dialect="oracle")
    assert (ev.table_id.schema_name, ev.table_id.table_name) == \
        ("INV", "ORD.ERS")


def test_mysql_comment_with_escaped_quote_and_dot():
    """The qualified-name tokenizer rule must not split a MySQL string
    literal containing an escaped quote followed by a dot."""
    from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_ddl

    [ev] = parse_ddl('ALTER TABLE t ADD c INT COMMENT "x\\".y\\"z"',
                     database="db")
    assert ev.added_columns[0].column.comment == 'x\\".y\\"z'


def test_logminer_unqualified_ddl_resolves_to_seg_owner(spark):
    """An unqualified DDL statement in a LogMiner row resolves against
    SEG_OWNER, matching the data records' schema-qualified table ids."""
    import json

    from source_flink_cdc_3_5_0_spark.common.events_json import (
        schema_events_from_json)
    from source_flink_cdc_3_5_0_spark.sources.oracle import (
        logminer_to_debezium_json)

    line = json.dumps({"scn": 30, "operation": 5, "seg_owner": "INV",
                       "table": "ORDERS", "ts_ms": 1, "csf": 0,
                       "sql_redo": "truncate table orders"})
    df = spark.createDataFrame([("f", bytearray(line.encode()))],
                               "path STRING, content BINARY")
    [rec] = logminer_to_debezium_json(df).collect()
    [ev] = schema_events_from_json(rec["value"])
    assert ev.table_id.identifier() == "INV.ORDERS"


def test_json_opaque_decimal_scientific_notation():
    """Decimals whose str() uses E-notation must encode (plain rendering)
    and render as valid JSON number tokens."""
    import decimal
    import json as js

    from source_flink_cdc_3_5_0_spark.common.mysql_json import (
        decode_json, dumps_json, encode_json)

    doc = {"a": decimal.Decimal("1E+3"), "b": decimal.Decimal("1E-7"),
           "c": decimal.Decimal("2.5E+2")}
    back = decode_json(encode_json(doc))
    assert back["a"] == decimal.Decimal(1000)
    assert back["b"] == decimal.Decimal("0.0000001")
    assert back["c"] == decimal.Decimal(250)
    rendered = js.loads(dumps_json(back))
    assert rendered == {"a": 1000, "b": 1e-07, "c": 250}

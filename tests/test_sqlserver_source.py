"""SQL Server CDC change-table decode + YAML surface tests."""

import pytest

from source_flink_cdc_3_5_0_spark.sources.legacy_offsets import Lsn, LsnOffset
from source_flink_cdc_3_5_0_spark.sources.sqlserver import (
    SqlServerCdcWriter, decode_sqlserver_cdc, render_lsn)


def _capture():
    w = SqlServerCdcWriter()
    w.begin_txn()
    w.insert("orders", dict(id=1, name="a", qty=5))
    w.insert("orders", dict(id=2, name="b", qty=6))
    w.begin_txn()
    w.update("orders", dict(id=2, name="b", qty=6),
             dict(id=2, name="b2", qty=6), changed_mask=0b010)
    w.delete("orders", dict(id=1, name="a", qty=5))
    return w


def test_decode_change_table_rows(spark):
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType())])
    raw = spark.createDataFrame(
        [(line,) for line in _capture().lines], "value string")
    rows = decode_sqlserver_cdc(raw, payload).orderBy("__seq").collect()
    assert [r["__op"] for r in rows] == ["+I", "+I", "-U", "+U", "-D"]
    # the update pair: before-image attached to +U, shared seqval
    upd = rows[3]
    assert upd["name"] == "b2" and upd["__before"]["name"] == "b"
    m = dict(upd["__meta"])
    assert m["operation"] == "4" and m["table"] == "orders"
    # __$update_mask bit 1 -> the second captured column changed
    assert m["updated_columns"] == "name"
    assert dict(rows[0]["__meta"])["updated_columns"] == "id,name,qty"
    # -U orders before +U; second txn after the first
    seqs = [r["__seq"] for r in rows]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    # delete carries the image
    assert rows[4]["id"] == 1 and rows[4]["__op"] == "-D"
    # plan is pure JVM: no Python stages
    plan = decode_sqlserver_cdc(raw, payload)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_yaml_sqlserver_cdc_e2e(spark, tmp_path):
    """YAML `type: sqlserver-cdc-file`: polled change-table captures stream
    through transforms into the sink; the max commit LSN persists as an
    LsnOffset."""
    import json

    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink

    src = tmp_path / "cdc"
    src.mkdir()
    w = _capture()
    (src / "poll-0001.jsonl").write_text(w.getvalue())
    yaml_text = f"""
source:
  type: sqlserver-cdc-file
  path: {src}
  tables: '{json.dumps({"testdb.dbo.orders": "id INT, name STRING, qty INT"})}'
  primary-keys: '{{"testdb.dbo.orders": ["id"]}}'
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
transform:
  - source-table: testdb.\\.*.\\.*
    projection: "id, UPPER(name) AS name_u, qty"
"""
    pdef = parse_yaml_pipeline(yaml_text)
    composer = PipelineComposer(spark)
    assert composer.is_streaming(pdef)
    sink = MemorySink()
    pipe, raw, tables = composer.compose_streaming(pdef, sink=sink)
    assert pipe.serialization == "sqlserver-cdc-json"
    q = pipe.start(raw, tables)
    q.awaitTermination(120)
    assert sink.snapshot(TableId.parse("testdb.dbo.orders")) == ["2, B2, 6"]
    off = pipe.binlog_offset()
    assert isinstance(off, LsnOffset)
    # the persisted commit LSN is the second (latest) transaction's
    assert off.commit_lsn == Lsn(bytes.fromhex(render_lsn(0x1020)))
    assert LsnOffset.from_json(off.to_json()) == off


def test_lsn_render_roundtrip():
    assert render_lsn(0x2A) == "0000000000000000002A"
    assert Lsn(bytes.fromhex(render_lsn(0x2A))).data == \
        Lsn.valueOf("00000000:00000000:002A").data
    with pytest.raises(ValueError):
        Lsn.valueOf("xx")


def test_unknown_operation_code_raises(spark):
    """Round 10 (the binlog type-39/40 lesson generalized): a
    row-bearing record with an unmodeled __$operation must raise by
    name, never flow through with a NULL op."""
    import json

    import pytest

    from source_flink_cdc_3_5_0_spark.sources.sqlserver import (
        decode_sqlserver_cdc)

    line = json.dumps({"db": "d", "schema": "dbo", "table": "t",
                       "row": {"__$start_lsn": "0" * 20,
                               "__$seqval": "0" * 20,
                               "__$operation": 7,
                               "__$update_mask": "00",
                               "id": 1, "v": "x"}})
    import pyspark.sql.types as T
    payload = T.StructType([T.StructField("id", T.LongType()),
                            T.StructField("v", T.StringType())])
    df = spark.createDataFrame([(line,)], "value STRING")
    with pytest.raises(Exception, match="unknown __\\$operation 7"):
        decode_sqlserver_cdc(df, payload).collect()

"""Db2 ASN capture-table decode + YAML surface tests."""

from source_flink_cdc_3_5_0_spark.sources.db2 import (
    Db2CdcWriter, decode_db2_cdc)
from source_flink_cdc_3_5_0_spark.sources.legacy_offsets import LsnOffset


def _capture():
    w = Db2CdcWriter()
    w.begin_txn()
    w.insert("ORDERS", dict(ID=1, NAME="a", QTY=5))
    w.insert("ORDERS", dict(ID=2, NAME="b", QTY=6))
    w.begin_txn()
    # an update is the RAW D-then-I pair on the wire
    w.update("ORDERS", dict(ID=2, NAME="b", QTY=6),
             dict(ID=2, NAME="b2", QTY=6))
    w.delete("ORDERS", dict(ID=1, NAME="a", QTY=5))
    return w


def test_decode_raw_di_pairs(spark):
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("ID", T.IntegerType()),
        T.StructField("NAME", T.StringType()),
        T.StructField("QTY", T.IntegerType())])
    raw = spark.createDataFrame(
        [(line,) for line in _capture().lines], "value string")
    rows = decode_db2_cdc(raw, payload).orderBy("__seq").collect()
    # the LEAD/LAG CASE classifies D-then-I as an update pair; the
    # trailing lone D in the same txn stays a delete
    assert [r["__op"] for r in rows] == ["+I", "+I", "-U", "+U", "-D"]
    upd = rows[3]
    assert upd["NAME"] == "b2" and upd["__before"]["NAME"] == "b"
    assert dict(upd["__meta"])["operation"] == "4"
    assert rows[4]["ID"] == 1
    seqs = [r["__seq"] for r in rows]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    # wire-faithful heuristic: within a txn, a delete immediately followed
    # by an insert of a DIFFERENT key still classifies as an update pair
    # (Db2Connection.java:64-69 does the same — documented, not "fixed")
    w = Db2CdcWriter()
    w.begin_txn()
    w.delete("ORDERS", dict(ID=1, NAME="a", QTY=5))
    w.insert("ORDERS", dict(ID=9, NAME="z", QTY=0))
    raw = spark.createDataFrame([(line,) for line in w.lines], "value string")
    ops = [r["__op"] for r in
           decode_db2_cdc(raw, payload).orderBy("__seq").collect()]
    assert ops == ["-U", "+U"]
    # no Python in the data path
    plan = decode_db2_cdc(raw, payload)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_yaml_db2_cdc_e2e(spark, tmp_path):
    import json

    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink

    src = tmp_path / "cdc"
    src.mkdir()
    (src / "poll-0001.jsonl").write_text(_capture().getvalue())
    yaml_text = f"""
source:
  type: db2-cdc-file
  path: {src}
  tables: '{json.dumps({"testdb.DB2INST1.ORDERS": "ID INT, NAME STRING, QTY INT"})}'
  primary-keys: '{{"testdb.DB2INST1.ORDERS": ["ID"]}}'
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
"""
    pdef = parse_yaml_pipeline(yaml_text)
    composer = PipelineComposer(spark)
    sink = MemorySink()
    pipe, raw, tables = composer.compose_streaming(pdef, sink=sink)
    assert pipe.serialization == "db2-cdc-json"
    q = pipe.start(raw, tables)
    q.awaitTermination(120)
    assert sink.snapshot(TableId.parse("testdb.DB2INST1.ORDERS")) \
        == ["2, b2, 6"]
    off = pipe.binlog_offset()
    assert isinstance(off, LsnOffset) and off.commit_lsn.available
    assert str(off.commit_lsn).endswith("1020")  # 16-byte plain hex


def test_unmodeled_operation_raises(spark):
    """Round 10: an IBMSNAP_OPERATION outside the D/I pairing contract
    (e.g. 'U') raises by name instead of flowing through NULL."""
    import json

    import pytest

    from source_flink_cdc_3_5_0_spark.sources.db2 import decode_db2_cdc

    import pyspark.sql.types as T
    payload = T.StructType([T.StructField("id", T.LongType()),
                            T.StructField("v", T.StringType())])
    line = json.dumps({"db": "d", "schema": "ASN", "table": "t",
                       "row": {"IBMSNAP_COMMITSEQ": "00" * 10,
                               "IBMSNAP_INTENTSEQ": "00" * 10,
                               "IBMSNAP_OPERATION": "U",
                               "id": 1, "v": "x"}})
    df = spark.createDataFrame([(line,)], "value STRING")
    with pytest.raises(Exception, match="unmodeled IBMSNAP_OPERATION U"):
        decode_db2_cdc(df, payload).collect()

"""End-to-end pipeline tests with the values source + memory sink.

Mirrors the reference's IT-case layer (SURVEY.md §5 layer 3):
FlinkPipelineTransformITCase / FlinkPipelineComposerITCase scenarios with
golden final-table state.
"""

from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common import (
    AddColumnEvent,
    Column,
    CreateTableEvent,
    DataChangeEvent,
    DropColumnEvent,
    RenameColumnEvent,
    Schema,
    TableId,
)
from source_flink_cdc_3_5_0_spark.pipeline import PipelineComposer, parse_yaml_pipeline
from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
from source_flink_cdc_3_5_0_spark.sources.values import ValuesSource

TBL = TableId.parse("default_namespace.default_schema.table1")

SCHEMA1 = Schema.of(
    Column("col1", T.StringType(), False),
    Column("col2", T.StringType()),
    primary_keys=["col1"],
)


def base_events():
    return [
        CreateTableEvent(TBL, SCHEMA1),
        DataChangeEvent.insert(TBL, ("1", "1")),
        DataChangeEvent.insert(TBL, ("2", "2")),
        DataChangeEvent.insert(TBL, ("3", "3")),
    ]


def run_pipeline(spark, yaml_text, events):
    pdef = parse_yaml_pipeline(yaml_text)
    sink = MemorySink()
    exe = PipelineComposer(spark).compose(pdef, source=ValuesSource(events), sink=sink)
    exe.run()
    return sink


BASE_YAML = """
source:
  type: values
sink:
  type: values
pipeline:
  parallelism: 1
"""


def test_calculated_columns(spark):
    """Parity: FlinkPipelineTransformITCase.testCalculatedColumns."""
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: default_namespace.default_schema.\\.*
    projection: "col1, col2, col1 || col2 AS col12"
"""
    sink = run_pipeline(spark, yaml_text, base_events())
    assert sink.snapshot(TBL) == ["1, 1, 11", "2, 2, 22", "3, 3, 33"]


def test_filter_and_projection(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: default_namespace.default_schema.\\.*
    projection: "col1, UPPER(col2) AS col2u"
    filter: "col1 <> '2'"
"""
    sink = run_pipeline(spark, yaml_text, base_events())
    assert sink.snapshot(TBL) == ["1, 1", "3, 3"]


def test_update_and_delete_materialization(spark):
    events = base_events() + [
        DataChangeEvent.update(TBL, ("2", "2"), ("2", "x")),
        DataChangeEvent.delete(TBL, ("3", "3")),
    ]
    sink = run_pipeline(spark, BASE_YAML, events)
    assert sink.snapshot(TBL) == ["1, 1", "2, x"]


def test_route_rename(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
route:
  - source-table: default_namespace.default_schema.table1
    sink-table: sinkns.sinkdb.<>
"""
    sink = run_pipeline(spark, yaml_text, base_events())
    routed = TableId.parse("sinkns.sinkdb.table1")
    assert sink.snapshot(routed) == ["1, 1", "2, 2", "3, 3"]


def test_route_merge_two_tables(spark):
    """N:1 route merge with schema widening (FIXTURES.md F4 analog)."""
    t_a = TableId.parse("ns.db.TABLEALPHA")
    t_b = TableId.parse("ns.db.TABLEBETA")
    schema_a = Schema.of(
        Column("id", T.IntegerType(), False),
        Column("version", T.StringType()),
        Column("priceAlpha", T.IntegerType()),
        primary_keys=["id"],
    )
    schema_b = Schema.of(
        Column("id", T.IntegerType(), False),
        Column("version", T.StringType()),
        Column("priceBeta", T.DoubleType()),
        primary_keys=["id"],
    )
    events = [
        CreateTableEvent(t_a, schema_a),
        CreateTableEvent(t_b, schema_b),
        DataChangeEvent.insert(t_a, (1008, "v1", 100)),
        DataChangeEvent.insert(t_b, (2011, "v2", 2.5)),
    ]
    yaml_text = """
source: {type: values}
sink: {type: values}
route:
  - source-table: ns.db.TABLE\\.*
    sink-table: ns.db.merged
"""
    sink = run_pipeline(spark, yaml_text, events)
    merged = TableId.parse("ns.db.merged")
    schema = sink.schemas[merged]
    assert schema.column_names() == ["id", "version", "priceAlpha", "priceBeta"]
    assert sink.snapshot(merged) == ["1008, v1, 100, null", "2011, v2, null, 2.5"]


def test_schema_evolution_add_rename_drop(spark):
    """Scripted DDL mid-stream (ValuesDataSourceHelper.java:200-280 analog),
    default LENIENT behavior: renames become adds, drops null-fill."""
    events = base_events() + [
        AddColumnEvent.last(TBL, Column("col3", T.StringType())),
        DataChangeEvent.insert(TBL, ("4", "4", "c3")),
        RenameColumnEvent(TBL, (("col2", "newCol2"),)),
        DataChangeEvent.insert(TBL, ("5", "5", "c3b")),
        DropColumnEvent(TBL, ("newCol2",)),
        DataChangeEvent.insert(TBL, ("6", "c3c")),
    ]
    sink = run_pipeline(spark, BASE_YAML, events)
    schema = sink.schemas[TBL]
    # LENIENT: col2 (renamed away) is retained; col3 and newCol2 appended
    assert schema.column_names() == ["col1", "col2", "col3", "newCol2"]
    assert sink.snapshot(TBL) == [
        "1, 1, null, null",
        "2, 2, null, null",
        "3, 3, null, null",
        "4, 4, c3, null",
        "5, null, c3b, 5",
        "6, null, c3c, null",
    ]


def test_soft_delete_converter(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: default_namespace.default_schema.\\.*
    projection: "col1, col2"
    converter-after-transform: SOFT_DELETE
"""
    events = base_events() + [DataChangeEvent.delete(TBL, ("3", "3"))]
    sink = run_pipeline(spark, yaml_text, events)
    # the delete was rewritten to an insert of the before image
    assert sink.snapshot(TBL) == ["1, 1", "2, 2", "3, 3"]


def test_metadata_columns(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: default_namespace.default_schema.\\.*
    projection: "col1, __table_name__ AS tbl, __namespace_name__ AS ns"
"""
    sink = run_pipeline(spark, yaml_text, base_events())
    assert sink.snapshot(TBL) == [
        "1, table1, default_namespace",
        "2, table1, default_namespace",
        "3, table1, default_namespace",
    ]


def test_local_time_zone_owned_by_run_and_restored(spark):
    """Session-timezone ownership: a pipeline with a non-UTC
    local-time-zone renders temporals in ITS zone even when a
    driver-contract load (which pins the session to UTC) ran between
    compose() and run() — and run() restores the caller's zone after."""
    import datetime

    from source_flink_cdc_3_5_0_spark.entry_queries import pin_driver_session

    tid = TableId.parse("tz.db.t")
    schema = Schema.of(
        Column("id", T.IntegerType(), False),
        Column("ts", T.TimestampType()),
        primary_keys=["id"],
    )
    # 2024-01-01T00:00:00Z == 2024-01-01 09:00:00 Asia/Tokyo
    instant = datetime.datetime(2024, 1, 1, 0, 0, 0,
                                tzinfo=datetime.timezone.utc)
    events = [
        CreateTableEvent(tid, schema),
        DataChangeEvent.insert(tid, (1, instant.replace(tzinfo=None))),
    ]
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: tz.db.\\.*
    projection: "id, DATE_FORMAT(ts, 'yyyy-MM-dd HH:mm') AS local_ts"
pipeline:
  local-time-zone: Asia/Tokyo
"""
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        sink = MemorySink()
        exe = PipelineComposer(spark).compose(
            parse_yaml_pipeline(yaml_text),
            source=ValuesSource(events), sink=sink)
        # a driver-contract query runs between compose and run: it pins UTC
        pin_driver_session(spark)
        exe.run()
        # createDataFrame interpreted the naive wall clock in the session
        # zone at batch build (UTC) -> Tokyo rendering shifts +9
        assert sink.snapshot(tid) == ["1, 2024-01-01 09:00"]
        # and the pipeline zone did not leak into the session
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_local_time_zone_restored_on_unset_session(spark):
    """A session that never explicitly set the timezone key must get its
    DEFAULT zone back after a non-UTC pipeline run — not keep the
    pipeline's zone (conf.get returns None there; restore must unset)."""
    tid = TableId.parse("tz2.db.t")
    schema = Schema.of(Column("id", T.IntegerType(), False),
                       primary_keys=["id"])
    yaml_text = """
source: {type: values}
sink: {type: values}
pipeline:
  local-time-zone: Pacific/Kiritimati
"""
    key = "spark.sql.session.timeZone"
    prior = spark.conf.get(key)
    spark.conf.unset(key)
    try:
        effective_default = spark.conf.get(key)
        exe = PipelineComposer(spark).compose(
            parse_yaml_pipeline(yaml_text),
            source=ValuesSource([CreateTableEvent(tid, schema),
                                 DataChangeEvent.insert(tid, (1,))]),
            sink=MemorySink())
        exe.run()
        assert spark.conf.get(key) == effective_default != "Pacific/Kiritimati"
    finally:
        spark.conf.set(key, prior)

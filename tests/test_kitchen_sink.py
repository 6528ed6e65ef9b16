"""Kitchen-sink integration: multi-table + transforms + routes + N:1 merge +
mid-stream evolution + updates/deletes in one pipeline (the
SchemaEvolvingTransformE2eITCase shape, SURVEY.md §5 layer 3)."""

from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common import (
    AddColumnEvent,
    Column,
    CreateTableEvent,
    DataChangeEvent,
    Schema,
    TableId,
)
from source_flink_cdc_3_5_0_spark.pipeline import PipelineComposer, parse_yaml_pipeline
from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
from source_flink_cdc_3_5_0_spark.sources.values import ValuesSource

T_A = TableId.parse("app.db.orders_eu")
T_B = TableId.parse("app.db.orders_us")
T_LOG = TableId.parse("app.db.audit")

S_AB = Schema.of(
    Column("id", T.IntegerType(), False),
    Column("amount", T.DoubleType()),
    Column("status", T.StringType()),
    primary_keys=["id"],
)
S_LOG = Schema.of(
    Column("log_id", T.IntegerType(), False),
    Column("msg", T.StringType()),
    primary_keys=["log_id"],
)

YAML = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: app.db.orders_\\.*
    projection: "id, amount, UPPER(status) AS status, __table_name__ AS src"
    filter: "amount > 0"
route:
  - source-table: app.db.orders_\\.*
    sink-table: warehouse.ods.orders_all
  - source-table: app.db.audit
    sink-table: warehouse.ods.audit
"""


def test_kitchen_sink(spark):
    events = [
        CreateTableEvent(T_A, S_AB),
        CreateTableEvent(T_B, S_AB),
        CreateTableEvent(T_LOG, S_LOG),
        DataChangeEvent.insert(T_A, (1, 10.5, "open")),
        DataChangeEvent.insert(T_A, (2, -1.0, "void")),      # filtered out
        DataChangeEvent.insert(T_B, (100, 20.0, "open")),
        DataChangeEvent.insert(T_LOG, (1, "created")),
        # evolution on one side of the merge only
        AddColumnEvent.last(T_A, Column("region", T.StringType())),
        DataChangeEvent.insert(T_A, (3, 30.0, "open", "fr")),
        DataChangeEvent.update(T_B, (100, 20.0, "open"), (100, 25.0, "paid")),
        DataChangeEvent.delete(T_A, (1, 10.5, "open", None)),
    ]
    sink = MemorySink()
    pdef = parse_yaml_pipeline(YAML)
    PipelineComposer(spark).compose(pdef, source=ValuesSource(events), sink=sink).run()

    merged = TableId.parse("warehouse.ods.orders_all")
    # an EXPLICIT projection pins the output columns: T_A's added 'region'
    # does NOT surface (reference semantics — only a wildcard projection
    # follows schema evolution); the merged schema stays stable
    assert sink.schemas[merged].column_names() == ["id", "amount", "status", "src"]
    assert sink.snapshot(merged) == [
        "100, 25.0, PAID, orders_us",
        "3, 30.0, OPEN, orders_eu",
    ]
    audit = TableId.parse("warehouse.ods.audit")
    assert sink.snapshot(audit) == ["1, created"]


def test_wildcard_plus_explicit(spark):
    """Projection '*, expr AS x' expands the wildcard around explicit items
    (TransformParser.expandWildcard)."""
    events = [
        CreateTableEvent(T_LOG, S_LOG),
        DataChangeEvent.insert(T_LOG, (1, "hello")),
    ]
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: app.db.audit
    projection: "*, CHAR_LENGTH(msg) AS msg_len"
"""
    sink = MemorySink()
    pdef = parse_yaml_pipeline(yaml_text)
    PipelineComposer(spark).compose(pdef, source=ValuesSource(events), sink=sink).run()
    assert sink.schemas[T_LOG].column_names() == ["log_id", "msg", "msg_len"]
    assert sink.snapshot(T_LOG) == ["1, hello, 5"]

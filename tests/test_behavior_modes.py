"""Behavior-mode e2e: TRY_EVOLVE with a failing applier, include/exclude
schema-change filters, NOT-variant predicate semantics."""

import pytest
from pyspark.sql import Row, types as T

from source_flink_cdc_3_5_0_spark.api import transform_table
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

TID = TableId.parse("a.b.t")
SCHEMA = Schema.of(
    Column("id", T.IntegerType(), False), Column("v", T.StringType()),
    primary_keys=["id"])

EVENTS = [
    CreateTableEvent(TID, SCHEMA),
    DataChangeEvent.insert(TID, (1, "a")),
    AddColumnEvent.last(TID, Column("extra", T.StringType())),
    DataChangeEvent.insert(TID, (2, "b", "x")),
]


class FailingAlterSink(MemorySink):
    """Sink whose applier rejects anything but CREATE (a rigid target)."""

    def __init__(self):
        super().__init__()
        parent = self._applier

        class _A(type(parent)):
            def apply_schema_change(self, table_id, event, evolved_schema):
                if not isinstance(event, CreateTableEvent):
                    raise RuntimeError("target cannot ALTER")
                return super().apply_schema_change(table_id, event, evolved_schema)

        self._applier = _A(self)


def test_try_evolve_tolerates_applier_failure(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
pipeline:
  schema.change.behavior: try_evolve
"""
    sink = FailingAlterSink()
    pdef = parse_yaml_pipeline(yaml_text)
    PipelineComposer(spark).compose(pdef, source=ValuesSource(EVENTS), sink=sink).run()
    # ALTER failed -> rows coerced to the surviving (original) schema;
    # the pipeline completes and the 'extra' value is dropped
    assert sink.schemas[TID].column_names() == ["id", "v"]
    assert sink.snapshot(TID) == ["1, a", "2, b"]


def test_evolve_behavior_fails_on_rigid_sink(spark):
    yaml_text = """
source: {type: values}
sink: {type: values}
pipeline:
  schema.change.behavior: evolve
"""
    sink = FailingAlterSink()
    pdef = parse_yaml_pipeline(yaml_text)
    with pytest.raises(RuntimeError, match="cannot ALTER"):
        PipelineComposer(spark).compose(pdef, source=ValuesSource(EVENTS), sink=sink).run()


def test_exclude_schema_changes_yaml(spark):
    """sink exclude.schema.changes: add_column filtered -> rows coerce to the
    unevolved sink schema (include/exclude parity, schema-evolution.md)."""
    yaml_text = """
source: {type: values}
sink:
  type: values
  exclude.schema.changes: add_column
"""
    sink = MemorySink()
    pdef = parse_yaml_pipeline(yaml_text)
    PipelineComposer(spark).compose(pdef, source=ValuesSource(EVENTS), sink=sink).run()
    assert sink.schemas[TID].column_names() == ["id", "v"]
    assert sink.snapshot(TID) == ["1, a", "2, b"]


def test_not_variants(spark):
    df = spark.createDataFrame([
        Row(id=1, v="apple", n=5), Row(id=2, v=None, n=None), Row(id=3, v="banana", n=20)])
    out = transform_table(df, projection="id", filter="v NOT LIKE 'a%'")
    assert sorted(r["id"] for r in out.collect()) == [3]  # NULL -> false
    out = transform_table(df, projection="id", filter="n NOT BETWEEN 1 AND 10")
    assert sorted(r["id"] for r in out.collect()) == [3]
    out = transform_table(df, projection="id", filter="n NOT IN (5, 6)")
    assert sorted(r["id"] for r in out.collect()) == [3]
    out = transform_table(df, projection="id, n % 3 AS m", filter="n IS NOT NULL")
    assert {(r["id"], r["m"]) for r in out.collect()} == {(1, 2), (3, 2)}

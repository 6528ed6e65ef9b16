"""Reserved/complex column names (FIXTURES.md F1 variant: `class` PK,
`foo-bar` cols) through the full pipeline; as-of join unit semantics."""

import datetime

from pyspark.sql import Row, types as T

from source_flink_cdc_3_5_0_spark.common import (
    Column,
    CreateTableEvent,
    DataChangeEvent,
    Schema,
    TableId,
)
from source_flink_cdc_3_5_0_spark.extensions.temporal_join import asof_join
from source_flink_cdc_3_5_0_spark.pipeline import PipelineComposer, parse_yaml_pipeline
from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
from source_flink_cdc_3_5_0_spark.sources.values import ValuesSource

TID = TableId.parse("default_namespace.default_schema.mytable")
SCHEMA = Schema.of(
    Column("class", T.StringType(), False),
    Column("foo-bar", T.IntegerType()),
    Column("bar-foo", T.IntegerType()),
    primary_keys=["class"],
)


def test_reserved_and_hyphenated_names(spark):
    """Backtick-quoted identifiers flow through projection+filter (parity:
    FlinkPipelineTransformITCase.java:1026-1033)."""
    yaml_text = """
source: {type: values}
sink: {type: values}
transform:
  - source-table: default_namespace.default_schema.\\.*
    projection: "`class`, `foo-bar` + `bar-foo` AS total"
    filter: "`foo-bar` > 0"
"""
    events = [
        CreateTableEvent(TID, SCHEMA),
        DataChangeEvent.insert(TID, ("a", 1, 10)),
        DataChangeEvent.insert(TID, ("b", 0, 20)),
        DataChangeEvent.insert(TID, ("c", 3, 30)),
    ]
    sink = MemorySink()
    pdef = parse_yaml_pipeline(yaml_text)
    PipelineComposer(spark).compose(pdef, source=ValuesSource(events), sink=sink).run()
    assert sink.snapshot(TID) == ["a, 11", "c, 33"]


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame([
        Row(k=1, lts=_ts("2024-01-01T10:00:00"), lv="L1"),
        Row(k=1, lts=_ts("2024-01-01T12:00:00"), lv="L2"),
        Row(k=2, lts=_ts("2024-01-01T09:00:00"), lv="L3"),  # no prior right
    ])
    right = spark.createDataFrame([
        Row(k=1, rts=_ts("2024-01-01T09:30:00"), rv="R-early"),
        Row(k=1, rts=_ts("2024-01-01T11:00:00"), rv="R-mid"),
        Row(k=1, rts=_ts("2024-01-01T12:00:00"), rv="R-equal"),
        Row(k=2, rts=_ts("2024-01-01T09:30:00"), rv="R-late"),
    ])
    out = {(r["k"], r["lv"]): r["rv"]
           for r in asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts").collect()}
    assert out[(1, "L1")] == "R-early"
    assert out[(1, "L2")] == "R-equal"   # <= semantics: equal ts matches
    assert out[(2, "L3")] is None

    strict = {(r["k"], r["lv"]): r["rv"]
              for r in asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                                 strict=True).collect()}
    assert strict[(1, "L2")] == "R-mid"  # < semantics: equal ts excluded


def test_asof_single_shuffle(spark):
    left = spark.createDataFrame([Row(k=1, lts=_ts("2024-01-01T10:00:00"), lv="x")])
    right = spark.createDataFrame([Row(k=1, rts=_ts("2024-01-01T09:00:00"), rv="y")])
    p = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1

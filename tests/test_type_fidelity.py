"""Full-type-coverage pipeline test (FIXTURES.md F3 / data_types_test.sql
analog): every mapped type flows source → transform → coercion → sink and
round-trips canal-json decode."""

import datetime
import json
from decimal import Decimal

from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common import (
    Column,
    CreateTableEvent,
    DataChangeEvent,
    Schema,
    TableId,
)
from source_flink_cdc_3_5_0_spark.pipeline import PipelineComposer, parse_yaml_pipeline
from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
from source_flink_cdc_3_5_0_spark.sources.debezium import decode_canal, encode_canal
from source_flink_cdc_3_5_0_spark.sources.values import ValuesSource

TID = TableId.parse("tps.db.DATA_TYPES_TABLE")

SCHEMA = Schema.of(
    Column("id", T.IntegerType(), False),
    Column("c_tinyint", T.ByteType()),
    Column("c_smallint", T.ShortType()),
    Column("c_bigint", T.LongType()),
    Column("c_decimal", T.DecimalType(8, 4)),
    Column("c_udecimal", T.DecimalType(20, 0)),   # BIGINT UNSIGNED mapping
    Column("c_float", T.FloatType()),
    Column("c_double", T.DoubleType()),
    Column("c_bool", T.BooleanType()),
    Column("c_date", T.DateType()),
    Column("c_ts_ntz", T.TimestampNTZType()),     # DATETIME mapping
    Column("c_text", T.StringType()),
    Column("c_blob", T.BinaryType()),
    Column("c_arr", T.ArrayType(T.IntegerType())),
    Column("c_map", T.MapType(T.StringType(), T.StringType())),
    primary_keys=["id"],
)

ROW = (
    1, 7, 300, 5_000_000_000, Decimal("1234.5678"), Decimal("18446744073709551615"),
    1.5, 2.25, True, datetime.date(2024, 3, 5),
    datetime.datetime(2024, 3, 5, 10, 30), "text-value", bytearray(b"\x01\x02"),
    [1, 2, 3], {"k": "v"},
)


def test_all_types_through_pipeline(spark):
    events = [CreateTableEvent(TID, SCHEMA), DataChangeEvent.insert(TID, ROW)]
    sink = MemorySink()
    pdef = parse_yaml_pipeline("source: {type: values}\nsink: {type: values}\n")
    PipelineComposer(spark).compose(pdef, source=ValuesSource(events), sink=sink).run()
    state = list(sink.state[TID].values())[0]
    assert state["c_decimal"] == Decimal("1234.5678")
    assert state["c_udecimal"] == Decimal("18446744073709551615")
    assert state["c_bigint"] == 5_000_000_000
    assert state["c_date"] == datetime.date(2024, 3, 5)
    assert state["c_ts_ntz"] == datetime.datetime(2024, 3, 5, 10, 30)
    assert bytes(state["c_blob"]) == b"\x01\x02"
    assert state["c_arr"] == [1, 2, 3]
    assert state["c_map"] == {"k": "v"}
    # sink schema preserves exact types
    st = sink.schemas[TID]
    assert st.get_column("c_decimal").data_type == T.DecimalType(8, 4)
    assert st.get_column("c_ts_ntz").data_type == T.TimestampNTZType()


def test_canal_decode_roundtrip(spark):
    """encode_canal -> decode_canal restores ops/images (simple types only —
    canal JSON renders binary/array/map lossily, as in the reference)."""
    simple = Schema.of(
        Column("id", T.IntegerType(), False), Column("v", T.StringType()),
        primary_keys=["id"])
    tid = TableId.parse("a.b.t")
    from source_flink_cdc_3_5_0_spark.sources.values import ValuesSource as VS

    events = [
        CreateTableEvent(tid, simple),
        DataChangeEvent.insert(tid, (1, "x")),
        DataChangeEvent.update(tid, (1, "x"), (1, "y")),
        DataChangeEvent.delete(tid, (1, "y")),
    ]
    batches = list(VS(events).batches(spark))
    df = batches[0][0].data
    encoded = encode_canal(df, tid, simple)
    decoded = decode_canal(encoded, simple.struct_type())
    ops = [(r["id"], r["__op"], r["v"]) for r in decoded.collect()]
    assert sorted(ops, key=str) == [(1, "+I", "x"), (1, "+U", "y"), (1, "-D", "y")]
    upd = [r for r in decoded.collect() if r["__op"] == "+U"][0]
    assert upd["__before"]["v"] == "x"

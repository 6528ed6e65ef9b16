"""TIMESTAMP_TZ fidelity (ZonedTimestampType.java): zoned values carry an
instant + ``__tz_offset`` side-channel column, and Debezium encode renders
the ORIGINAL offset back — session-timezone independent."""

import pytest
from pyspark.sql import functions as F, types as T

from source_flink_cdc_3_5_0_spark.common import Column, Schema, TableId
from source_flink_cdc_3_5_0_spark.functions.zoned_time import (
    offset_col_name, render_zoned, split_zoned, wire_schema, zoned_field_names,
)
from source_flink_cdc_3_5_0_spark.sources.debezium import (
    decode_debezium, encode_debezium,
)

TID = TableId.parse("db.s.t")
SCHEMA = Schema.of(
    Column("id", T.LongType(), False),
    Column("created", T.TimestampType(), zoned=True),
    primary_keys=["id"],
)


def _dbz(id_, created, op="c", before=None, ts=1):
    import json
    d = {"before": before, "after": {"id": id_, "created": created},
         "op": op, "ts_ms": ts,
         "source": {"db": "db", "schema": "s", "table": "t"}}
    if op == "d":
        d["before"], d["after"] = d["after"], None
    return json.dumps(d)


def test_zoned_flag_survives_struct_roundtrip():
    st = SCHEMA.struct_type()
    assert zoned_field_names(st) == ["created"]
    assert Schema.from_struct_type(st).get_column("created").zoned
    assert [f.dataType for f in wire_schema(st).fields] == [
        T.LongType(), T.StringType()]


@pytest.fixture()
def ny_spark(spark):
    """Run assertions under a non-UTC session zone to prove independence."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def test_decode_splits_instant_and_offset(ny_spark):
    raw = ny_spark.createDataFrame([
        (_dbz(1, "2024-03-01T10:15:30.123456+05:30"),),
        (_dbz(2, "2024-03-01T10:15:30Z", ts=2),),
        (_dbz(3, "2024-06-01T12:00:00-0700", ts=3),),
        (_dbz(4, None, ts=4),),
    ], "value STRING")
    rows = {r["id"]: r for r in
            decode_debezium(raw, SCHEMA.struct_type()).collect()}
    off = offset_col_name("created")
    assert rows[1][off] == "+05:30"
    assert rows[2][off] == "+00:00"          # Z normalized
    assert rows[3][off] == "-07:00"          # +HHMM normalized
    assert rows[4][off] is None and rows[4]["created"] is None
    # instants agree across offsets: 10:15:30+05:30 == 04:45:30Z
    assert rows[1]["created"].isoformat().startswith("2024-03-01T04:45:30.123456")


def test_encode_renders_original_offset(ny_spark):
    raw = ny_spark.createDataFrame([
        (_dbz(1, "2024-03-01T10:15:30.123456+05:30"),),
        (_dbz(2, "2024-03-01T10:15:30.120000+09:00", ts=2),),
    ], "value STRING")
    dec = decode_debezium(raw, SCHEMA.struct_type())
    vals = [r["value"] for r in
            encode_debezium(dec, TID, SCHEMA).orderBy("value").collect()]
    assert '"created":"2024-03-01T10:15:30.123456+05:30"' in vals[0]
    # trailing fraction zeros stripped
    assert '"created":"2024-03-01T10:15:30.12+09:00"' in vals[1]


def test_update_before_image_becomes_instant(ny_spark):
    raw = ny_spark.createDataFrame([
        (_dbz(3, "2024-06-01T12:00:00-07:00", op="u",
              before={"id": 3, "created": "2024-01-01T00:00:00-08:00"}),),
    ], "value STRING")
    row = decode_debezium(raw, SCHEMA.struct_type()).collect()[0]
    assert row["__before"]["created"].isoformat().startswith("2024-01-01T08:00:00")
    # re-encode: after keeps original offset, before renders at UTC
    val = encode_debezium(
        decode_debezium(raw, SCHEMA.struct_type()), TID, SCHEMA
    ).collect()[0]["value"]
    assert '"created":"2024-06-01T12:00:00-07:00"' in val
    assert '"created":"2024-01-01T08:00:00+00:00"' in val


def test_render_split_inverse_property(ny_spark):
    src = ["2024-03-01T10:15:30.5+05:30", "2023-12-31T23:59:59+00:00",
           "2024-07-04T01:02:03.000001-11:00"]
    df = ny_spark.createDataFrame([(s,) for s in src], "s STRING")
    instant, off = split_zoned(F.col("s"))
    out = df.select(render_zoned(instant, off).alias("r")).collect()
    assert [r["r"] for r in out] == src

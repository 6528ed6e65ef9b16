"""Property fuzzing for the MySQL DDL parser and the zoned-timestamp
round-trip (hypothesis-driven)."""

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_mysql_ddl
from source_flink_cdc_3_5_0_spark.common.events import (
    AddColumnEvent,
    ColumnPosition,
    CreateTableEvent,
)
from source_flink_cdc_3_5_0_spark.common.types import mysql_type_to_spark


_NAME = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)
_TYPES = st.sampled_from([
    ("INT", T.IntegerType()),
    ("BIGINT", T.LongType()),
    ("BIGINT UNSIGNED", T.DecimalType(20, 0)),
    ("VARCHAR(40)", T.StringType()),
    ("TEXT", T.StringType()),
    ("DOUBLE", T.DoubleType()),
    ("DECIMAL(12,3)", T.DecimalType(12, 3)),
    ("DATETIME", T.TimestampNTZType()),
    ("DATE", T.DateType()),
    ("BOOLEAN", T.BooleanType()),
])


@st.composite
def _column_def(draw):
    name = draw(_NAME)
    type_sql, spark_type = draw(_TYPES)
    not_null = draw(st.booleans())
    backtick = draw(st.booleans())
    default = draw(st.sampled_from([None, "0", "'x'", "42"]))
    sql = f"`{name}`" if backtick else name
    sql += f" {type_sql}"
    if not_null:
        sql += " NOT NULL"
    if default is not None:
        sql += f" DEFAULT {default}"
    return sql, (name, spark_type, not not_null, default)


@given(st.lists(_column_def(), min_size=1, max_size=6,
                unique_by=lambda c: c[1][0].lower()),
       st.integers(0, 5), st.booleans())
@settings(max_examples=120, deadline=None)
def test_create_table_fuzz(cols, pk_idx, qualified):
    names = [c[1][0] for c in cols]
    pk = names[pk_idx % len(names)]
    table = "`d b`.`t`" if qualified else "mydb.t1"
    sql = (f"CREATE TABLE {table} (" + ", ".join(c[0] for c in cols)
           + f", PRIMARY KEY ({pk}))")
    (ev,) = parse_mysql_ddl(sql)
    assert isinstance(ev, CreateTableEvent)
    assert ev.schema.primary_keys == (pk,)
    for _, (name, spark_type, nullable, default) in cols:
        c = ev.schema.get_column(name)
        assert c.data_type == spark_type
        expected_nullable = nullable and name != pk
        assert c.nullable == expected_nullable, name
        assert c.default_expr == default


@given(st.lists(_column_def(), min_size=1, max_size=4,
                unique_by=lambda c: c[1][0].lower()),
       st.sampled_from(["", "FIRST", "AFTER other"]))
@settings(max_examples=80, deadline=None)
def test_alter_add_fuzz(cols, pos):
    actions = []
    for i, (csql, _) in enumerate(cols):
        suffix = f" {pos}" if pos and i == 0 else ""
        actions.append(f"ADD COLUMN {csql}{suffix}")
    evs = parse_mysql_ddl("ALTER TABLE d.t " + ", ".join(actions))
    # one in-order AddColumnEvent per ADD action (DROP c, ADD c must replay
    # drop-then-add, so ADDs are never hoisted/merged)
    assert all(isinstance(e, AddColumnEvent) for e in evs)
    added = [cw for e in evs for cw in e.added_columns]
    assert [cw.column.name for cw in added] == [c[1][0] for c in cols]
    if pos == "FIRST":
        assert added[0].position == ColumnPosition.FIRST
    elif pos.startswith("AFTER"):
        assert added[0].position == ColumnPosition.AFTER
        assert added[0].existed_column_name == "other"


_OFFSETS = st.sampled_from(
    ["+00:00", "+05:30", "-07:00", "+09:00", "-11:30", "+13:45"])
_DTS = st.datetimes(min_value=datetime.datetime(1971, 1, 1),
                    max_value=datetime.datetime(2037, 12, 31))


@given(st.lists(st.tuples(_DTS, _OFFSETS), min_size=1, max_size=8))
@settings(max_examples=12, deadline=None)
def test_zoned_split_render_roundtrip_fuzz(spark, pairs):
    """render(split(s)) == normalize(s) for any wall time at any offset,
    under a non-UTC session zone."""
    from source_flink_cdc_3_5_0_spark.functions.zoned_time import (
        render_zoned, split_zoned)

    def iso(dt, off):
        body = dt.strftime("%Y-%m-%dT%H:%M:%S")
        if dt.microsecond:
            body += ("." + f"{dt.microsecond:06d}".rstrip("0"))
        return body + off

    src = [iso(dt, off) for dt, off in pairs]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        df = spark.createDataFrame([(s,) for s in src], "s STRING")
        instant, off = split_zoned(F.col("s"))
        out = [r["r"] for r in
               df.select(render_zoned(instant, off).alias("r")).collect()]
        assert out == src
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

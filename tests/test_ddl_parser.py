"""MySQL DDL statement parser (CustomMySqlAntlrDdlParser.java analog) unit
tests + the raw-SQL schema-change-topic streaming path."""

import json
import os

from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common import (
    AddColumnEvent,
    Column,
    Schema,
    TableId,
)
from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_mysql_ddl
from source_flink_cdc_3_5_0_spark.common.events import (
    AlterColumnTypeEvent,
    ColumnPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    TruncateTableEvent,
)
from source_flink_cdc_3_5_0_spark.common.events_json import (
    schema_events_from_json,
)


class TestCreateTable:
    def test_full_surface(self):
        (ev,) = parse_mysql_ddl("""CREATE TABLE `app`.`users` (
            `id` BIGINT UNSIGNED NOT NULL AUTO_INCREMENT,
            name VARCHAR(255) NOT NULL DEFAULT 'anon' COMMENT 'display name',
            bal DECIMAL(12,2) DEFAULT 0,
            kind ENUM('a','b') NULL,
            created TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
            PRIMARY KEY (`id`),
            KEY idx_name (name),
            CONSTRAINT fk FOREIGN KEY (x) REFERENCES other(y)
        )""")
        assert isinstance(ev, CreateTableEvent)
        assert str(ev.table_id) == "app.users"
        s = ev.schema
        assert s.primary_keys == ("id",)
        assert s.get_column("id").data_type == T.DecimalType(20, 0)  # unsigned
        assert not s.get_column("id").nullable
        c = s.get_column("name")
        assert (c.data_type, c.nullable, c.default_expr, c.comment) == (
            T.StringType(), False, "'anon'", "display name")
        assert s.get_column("bal").data_type == T.DecimalType(12, 2)
        assert s.get_column("kind").data_type == T.StringType()
        assert [c.name for c in s.columns] == [
            "id", "name", "bal", "kind", "created"]

    def test_if_not_exists_and_default_db(self):
        (ev,) = parse_mysql_ddl(
            "CREATE TABLE IF NOT EXISTS t (a INT)", database="d")
        assert str(ev.table_id) == "d.t"


class TestAlterTable:
    def test_add_with_position(self):
        (ev,) = parse_mysql_ddl(
            "ALTER TABLE d.t ADD COLUMN age INT NOT NULL AFTER name")
        assert isinstance(ev, AddColumnEvent)
        cp = ev.added_columns[0]
        assert cp.column == Column("age", T.IntegerType(), False)
        assert cp.position == ColumnPosition.AFTER
        assert cp.existed_column_name == "name"

    def test_add_first_and_multi(self):
        (ev,) = parse_mysql_ddl("ALTER TABLE d.t ADD (a INT, b TEXT)")
        assert [c.column.name for c in ev.added_columns] == ["a", "b"]
        (ev,) = parse_mysql_ddl("ALTER TABLE d.t ADD c0 INT FIRST")
        assert ev.added_columns[0].position == ColumnPosition.FIRST

    def test_multi_action_statement(self):
        evs = parse_mysql_ddl(
            "ALTER TABLE d.t ADD x INT, DROP COLUMN y, MODIFY z VARCHAR(10)")
        kinds = [type(e) for e in evs]
        assert kinds == [AddColumnEvent, DropColumnEvent, AlterColumnTypeEvent]
        assert evs[1].dropped_column_names == ("y",)
        assert evs[2].type_mapping == (("z", T.StringType()),)

    def test_rename_column(self):
        (ev,) = parse_mysql_ddl("ALTER TABLE d.t RENAME COLUMN a TO b")
        assert ev == RenameColumnEvent(TableId.parse("d.t"), (("a", "b"),))

    def test_change_decomposes_like_reference(self):
        # same name -> pure retype
        (ev,) = parse_mysql_ddl("ALTER TABLE d.t CHANGE c c BIGINT")
        assert isinstance(ev, AlterColumnTypeEvent)
        # renamed + retyped -> rename THEN retype under the new name
        evs = parse_mysql_ddl("ALTER TABLE d.t CHANGE old_c new_c BIGINT")
        assert isinstance(evs[0], RenameColumnEvent)
        assert evs[0].name_mapping == (("old_c", "new_c"),)
        assert evs[1].type_mapping == (("new_c", T.LongType()),)


class TestOtherStatements:
    def test_truncate_and_drop(self):
        (ev,) = parse_mysql_ddl("TRUNCATE TABLE app.users")
        assert ev == TruncateTableEvent(TableId.parse("app.users"))
        (ev,) = parse_mysql_ddl("DROP TABLE IF EXISTS `app`.`users`")
        assert ev == DropTableEvent(TableId.parse("app.users"))

    def test_schema_change_topic_record(self):
        evs = schema_events_from_json(json.dumps({
            "databaseName": "inv",
            "ddl": "ALTER TABLE products ADD COLUMN color VARCHAR(20)",
        }))
        assert len(evs) == 1 and isinstance(evs[0], AddColumnEvent)
        assert str(evs[0].table_id) == "inv.products"
        # statements the reference listener ignores don't fail the stream
        assert schema_events_from_json(json.dumps({
            "databaseName": "inv",
            "ddl": "CREATE INDEX idx ON products (color)",
        })) == []


def test_raw_sql_ddl_in_stream(spark, tmp_path):
    """End-to-end: a Debezium schema-change-topic record with raw SQL DDL
    evolves the streaming pipeline mid-stream."""
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
    from source_flink_cdc_3_5_0_spark.streaming.runner import (
        StreamingPipeline, file_stream_source)

    tid = TableId.parse("inv.s.products")
    schema = Schema.of(Column("id", T.LongType(), False),
                       Column("name", T.StringType()), primary_keys=["id"])

    def dbz(op, after, ts):
        return json.dumps({
            "before": None, "after": after, "op": op, "ts_ms": ts,
            "source": {"db": "inv", "schema": "s", "table": "products"}})

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write("\n".join([
            dbz("c", {"id": 1, "name": "bolt"}, 1),
            json.dumps({"databaseName": "inv.s",
                        "ddl": "ALTER TABLE products ADD color VARCHAR(20)"}),
            dbz("c", {"id": 2, "name": "nut", "color": "red"}, 2),
        ]))
    sink = MemorySink()
    pipe = StreamingPipeline.create(spark, sink, str(tmp_path / "ckpt"))
    pipe.register_table(tid, schema)
    q = pipe.start(file_stream_source(spark, src), {"inv.s.products": schema})
    q.awaitTermination(120)
    assert "color" in sink.schemas[tid].column_names()
    assert sink.snapshot(tid) == ["1, bolt, null", "2, nut, red"]


class TestReviewRegressions:
    """Round-2 code-review findings pinned."""

    def test_parenthesized_default_does_not_truncate_create(self):
        (ev,) = parse_mysql_ddl(
            "CREATE TABLE t (a INT, ts DATETIME DEFAULT CURRENT_TIMESTAMP(6),"
            " b INT, PRIMARY KEY (a))")
        assert [c.name for c in ev.schema.columns] == ["a", "ts", "b"]
        assert ev.schema.primary_keys == ("a",)
        assert ev.schema.get_column("ts").default_expr == "CURRENT_TIMESTAMP(6)"
        # expression default
        (ev,) = parse_mysql_ddl(
            "ALTER TABLE d.t ADD COLUMN u VARCHAR(36) DEFAULT (uuid())")
        assert ev.added_columns[0].column.default_expr == "(uuid())"

    def test_unsupported_alter_action_does_not_drop_siblings(self):
        evs = parse_mysql_ddl(
            "ALTER TABLE d.t ADD COLUMN c INT, ADD INDEX idx (c)")
        assert len(evs) == 1 and isinstance(evs[0], AddColumnEvent)
        assert evs[0].added_columns[0].column.name == "c"
        # table-level actions alone -> no events, no exception
        assert parse_mysql_ddl("ALTER TABLE d.t DROP PRIMARY KEY") == []
        assert parse_mysql_ddl("ALTER TABLE d.t RENAME TO t2") == []

    def test_drop_then_add_same_column_stays_ordered(self):
        evs = parse_mysql_ddl(
            "ALTER TABLE d.t DROP COLUMN c, ADD COLUMN c VARCHAR(10)")
        assert [type(e) for e in evs] == [DropColumnEvent, AddColumnEvent]

    def test_enum_with_double_quoted_values(self):
        (ev,) = parse_mysql_ddl(
            'ALTER TABLE d.t ADD COLUMN s ENUM("a","b") NOT NULL')
        assert ev.added_columns[0].column.data_type == T.StringType()
        assert not ev.added_columns[0].column.nullable

    def test_primary_key_prefix_length(self):
        (ev,) = parse_mysql_ddl(
            "CREATE TABLE t (name VARCHAR(300), tail INT, "
            "PRIMARY KEY (name(10)))")
        assert ev.schema.primary_keys == ("name",)
        assert [c.name for c in ev.schema.columns] == ["name", "tail"]


def test_physical_op_ts_column_shadows_metadata(spark):
    """A real column named op_ts must NOT be rewritten to the __meta
    binding (reference: SupportedMetadataColumn resolves only unknown
    names)."""
    from source_flink_cdc_3_5_0_spark.api import transform_table
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 111), (2, 222)], "id INT, op_ts BIGINT"
    ).withColumn("__meta", F.create_map(F.lit("ts_ms"), F.lit("999")))
    out = transform_table(df, projection="id, op_ts", table_id="d.s.t")
    assert sorted((r["id"], r["op_ts"]) for r in out.collect()) == [
        (1, 111), (2, 222)]

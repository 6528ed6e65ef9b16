"""SQL dialect statement generators for relational changelog sinks.

Parity target: the reference's relational/OLAP sink appliers, which render
the 7-member schema-change algebra and keyed upsert DML as exact statement
text per target dialect (DorisMetadataApplier.java:117-141 dispatches the
same seven events to per-dialect SQL; the mysql/postgres pipeline sinks emit
``INSERT ... ON DUPLICATE KEY UPDATE`` / ``INSERT ... ON CONFLICT DO
UPDATE`` keyed upserts).

Only the ``sqlite`` dialect ever connects in this sandbox (see
:mod:`.jdbc_sink`); ``mysql`` and ``postgres`` generate the identical-shape
statement text so a real server slots in without touching the write path —
the statements are pinned byte-for-byte by ``tests/test_sink_conformance.py``.

All DML uses ``qmark`` placeholders (``?``); a driver with a different
paramstyle can substitute positionally.
"""

from __future__ import annotations

import abc

from pyspark.sql import types as T

from ..common.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from ..common.schema import Schema


class SqlDialect(abc.ABC):
    """Statement-text generator for one SQL dialect."""

    name: str = "?"

    # -- identifiers / types ----------------------------------------------
    @abc.abstractmethod
    def quote(self, ident: str) -> str: ...

    @abc.abstractmethod
    def type_name(self, dt: T.DataType) -> str: ...

    # -- DML ---------------------------------------------------------------
    @abc.abstractmethod
    def upsert_sql(self, table: str, names: list[str], pks: list[str]) -> str:
        """Keyed upsert with one ``?`` placeholder per column in *names*."""

    def delete_sql(self, table: str, pks: list[str]) -> str:
        return (f"DELETE FROM {self.quote(table)} WHERE "
                + " AND ".join(f"{self.quote(k)}=?" for k in pks))

    # -- DDL (7-event algebra) --------------------------------------------
    def ddl_sql(self, table: str, event: SchemaChangeEvent,
                evolved_schema: Schema) -> list[str]:
        """Render one schema-change event as a list of DDL statements."""
        t = self.quote(table)
        if isinstance(event, CreateTableEvent):
            return [self._create_table(t, evolved_schema)]
        if isinstance(event, AddColumnEvent):
            return [self._add_column(t, cwp) for cwp in event.added_columns]
        if isinstance(event, DropColumnEvent):
            return [f"ALTER TABLE {t} DROP COLUMN {self.quote(n)}"
                    for n in event.dropped_column_names]
        if isinstance(event, RenameColumnEvent):
            return [f"ALTER TABLE {t} RENAME COLUMN {self.quote(o)} "
                    f"TO {self.quote(n)}" for o, n in event.name_mapping]
        if isinstance(event, AlterColumnTypeEvent):
            return self._alter_column_type(t, event, evolved_schema)
        if isinstance(event, TruncateTableEvent):
            return [self._truncate(t)]
        if isinstance(event, DropTableEvent):
            return [f"DROP TABLE IF EXISTS {t}"]
        raise TypeError(f"unknown schema-change event {type(event).__name__}")

    # -- shared helpers ----------------------------------------------------
    def _create_table(self, quoted_table: str, schema: Schema) -> str:
        cols = ", ".join(f"{self.quote(c.name)} {self.type_name(c.data_type)}"
                         for c in schema.columns)
        pk = ""
        if schema.primary_keys:
            pk = ", PRIMARY KEY (" + ", ".join(
                self.quote(k) for k in schema.primary_keys) + ")"
        return f"CREATE TABLE IF NOT EXISTS {quoted_table} ({cols}{pk})"

    def _add_column(self, quoted_table: str, cwp) -> str:
        c = cwp.column
        return (f"ALTER TABLE {quoted_table} ADD COLUMN "
                f"{self.quote(c.name)} {self.type_name(c.data_type)}")

    @abc.abstractmethod
    def _alter_column_type(self, quoted_table: str,
                           event: AlterColumnTypeEvent,
                           evolved_schema: Schema) -> list[str]: ...

    def _truncate(self, quoted_table: str) -> str:
        return f"TRUNCATE TABLE {quoted_table}"


class SqliteDialect(SqlDialect):
    """SQLite: double-quoted identifiers, storage-class affinity types,
    ``ON CONFLICT ... DO UPDATE SET c=excluded.c`` upserts.  No in-place
    retype — ALTER COLUMN TYPE rebuilds the table (create-new + INSERT
    SELECT + swap, the standard SQLite migration); no TRUNCATE statement —
    ``DELETE FROM`` is the idiom."""

    name = "sqlite"

    def quote(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def type_name(self, dt: T.DataType) -> str:
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType, T.BooleanType)):
            return "INTEGER"
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "REAL"
        if isinstance(dt, T.BinaryType):
            return "BLOB"
        # strings, decimals (exact digits — REAL would round through
        # float64), dates, timestamps, complex-as-json
        return "TEXT"

    def upsert_sql(self, table: str, names: list[str], pks: list[str]) -> str:
        t = self.quote(table)
        collist = ", ".join(self.quote(c) for c in names)
        ph = ", ".join("?" for _ in names)
        pklist = ", ".join(self.quote(k) for k in pks)
        setlist = ", ".join(f"{self.quote(c)}=excluded.{self.quote(c)}"
                            for c in names if c not in pks)
        tail = (f"ON CONFLICT ({pklist}) DO UPDATE SET {setlist}" if setlist
                else f"ON CONFLICT ({pklist}) DO NOTHING")
        return f"INSERT INTO {t} ({collist}) VALUES ({ph}) {tail}"

    def _alter_column_type(self, quoted_table, event, evolved_schema):
        tmp = quoted_table[:-1] + '__rebuild"'
        collist = ", ".join(self.quote(c.name) for c in evolved_schema.columns)
        return [
            f"DROP TABLE IF EXISTS {tmp}",
            self._create_table(tmp, evolved_schema),
            f"INSERT INTO {tmp} ({collist}) SELECT {collist} FROM {quoted_table}",
            f"DROP TABLE {quoted_table}",
            f"ALTER TABLE {tmp} RENAME TO {quoted_table}",
        ]

    def _truncate(self, quoted_table: str) -> str:
        return f"DELETE FROM {quoted_table}"


class MySqlDialect(SqlDialect):
    """MySQL 8: backtick identifiers, ``INSERT ... ON DUPLICATE KEY UPDATE
    c=VALUES(c)`` upserts, ``MODIFY COLUMN`` retype, positional ``ADD
    COLUMN ... FIRST/AFTER`` (the one dialect that honors AddColumnEvent's
    ColumnWithPosition physically)."""

    name = "mysql"

    def quote(self, ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    def type_name(self, dt: T.DataType) -> str:
        if isinstance(dt, T.BooleanType):
            return "TINYINT(1)"
        if isinstance(dt, T.ByteType):
            return "TINYINT"
        if isinstance(dt, T.ShortType):
            return "SMALLINT"
        if isinstance(dt, T.IntegerType):
            return "INT"
        if isinstance(dt, T.LongType):
            return "BIGINT"
        if isinstance(dt, T.FloatType):
            return "FLOAT"
        if isinstance(dt, T.DoubleType):
            return "DOUBLE"
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision}, {dt.scale})"
        if isinstance(dt, T.DateType):
            return "DATE"
        if isinstance(dt, (T.TimestampNTZType, T.TimestampType)):
            # TIMESTAMP(6) tops out at 2038; DATETIME(6) is the full-range
            # microsecond type both the NTZ and instant columns map to
            # (instants are rendered in the pipeline's local-time-zone)
            return "DATETIME(6)"
        if isinstance(dt, T.BinaryType):
            return "LONGBLOB"
        return "TEXT"

    def upsert_sql(self, table: str, names: list[str], pks: list[str]) -> str:
        t = self.quote(table)
        collist = ", ".join(self.quote(c) for c in names)
        ph = ", ".join("?" for _ in names)
        setlist = ", ".join(f"{self.quote(c)}=VALUES({self.quote(c)})"
                            for c in names if c not in pks)
        if not setlist:
            return f"INSERT IGNORE INTO {t} ({collist}) VALUES ({ph})"
        return (f"INSERT INTO {t} ({collist}) VALUES ({ph}) "
                f"ON DUPLICATE KEY UPDATE {setlist}")

    def _add_column(self, quoted_table: str, cwp) -> str:
        c = cwp.column
        stmt = (f"ALTER TABLE {quoted_table} ADD COLUMN "
                f"{self.quote(c.name)} {self.type_name(c.data_type)}")
        if cwp.position is ColumnPosition.FIRST:
            stmt += " FIRST"
        elif cwp.position is ColumnPosition.AFTER:
            stmt += f" AFTER {self.quote(cwp.existed_column_name)}"
        # BEFORE x has no MySQL syntax; the composer resolves it to AFTER
        # the preceding column when it evolves the registry schema, so a
        # BEFORE arriving here falls back to appending (position is still
        # correct in the registry, which drives readback ordering)
        return stmt

    def _alter_column_type(self, quoted_table, event, evolved_schema):
        return [f"ALTER TABLE {quoted_table} MODIFY COLUMN "
                f"{self.quote(col)} {self.type_name(dt)}"
                for col, dt in event.type_mapping]


class PostgresDialect(SqlDialect):
    """PostgreSQL: double-quoted identifiers, ``ON CONFLICT (pk) DO UPDATE
    SET c=EXCLUDED.c`` upserts, ``ALTER COLUMN ... TYPE ... USING`` retype.
    ADD COLUMN position is registry metadata only (PostgreSQL appends)."""

    name = "postgres"

    def quote(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def type_name(self, dt: T.DataType) -> str:
        if isinstance(dt, T.BooleanType):
            return "BOOLEAN"
        if isinstance(dt, (T.ByteType, T.ShortType)):
            return "SMALLINT"
        if isinstance(dt, T.IntegerType):
            return "INTEGER"
        if isinstance(dt, T.LongType):
            return "BIGINT"
        if isinstance(dt, T.FloatType):
            return "REAL"
        if isinstance(dt, T.DoubleType):
            return "DOUBLE PRECISION"
        if isinstance(dt, T.DecimalType):
            return f"NUMERIC({dt.precision}, {dt.scale})"
        if isinstance(dt, T.DateType):
            return "DATE"
        if isinstance(dt, T.TimestampNTZType):
            return "TIMESTAMP"
        if isinstance(dt, T.TimestampType):
            return "TIMESTAMPTZ"
        if isinstance(dt, T.BinaryType):
            return "BYTEA"
        return "TEXT"

    def upsert_sql(self, table: str, names: list[str], pks: list[str]) -> str:
        t = self.quote(table)
        collist = ", ".join(self.quote(c) for c in names)
        ph = ", ".join("?" for _ in names)
        pklist = ", ".join(self.quote(k) for k in pks)
        setlist = ", ".join(f"{self.quote(c)}=EXCLUDED.{self.quote(c)}"
                            for c in names if c not in pks)
        tail = (f"ON CONFLICT ({pklist}) DO UPDATE SET {setlist}" if setlist
                else f"ON CONFLICT ({pklist}) DO NOTHING")
        return f"INSERT INTO {t} ({collist}) VALUES ({ph}) {tail}"

    def _alter_column_type(self, quoted_table, event, evolved_schema):
        return [f"ALTER TABLE {quoted_table} ALTER COLUMN {self.quote(col)} "
                f"TYPE {self.type_name(dt)} USING {self.quote(col)}"
                f"::{self.type_name(dt)}"
                for col, dt in event.type_mapping]


class MaxComputeDialect(SqlDialect):
    """MaxCompute (ODPS): statement text mirroring the reference's
    SchemaEvolutionUtils.java — lowercase keywords, the full table name
    backticked, COLUMN names bare, one ``add columns (…)`` statement for
    a whole AddColumnEvent (:106-150), ``change column c c TYPE`` retype
    (:153-187), ``drop columns a,b`` (:189-214), ``change column old
    rename to new`` (:216-240).  Type names per TypeConvertUtils.java's
    mapping table (CHAR/VARCHAR→STRING, BINARY, DECIMAL(p,s), TINYINT…
    DOUBLE, DATE, TIMESTAMP_NTZ, instant→TIMESTAMP).  Added columns
    carry the reference's ``comment '<type summary>'``.  Position hints
    (FIRST/AFTER) append physically — the reference throws on non-LAST
    positions; here the registry keeps the logical order, matching the
    postgres dialect's treatment.  DML: the live writer streams through
    Tunnel upsert sessions, not SQL — ``upsert_sql`` renders the
    equivalent ``merge into`` a transactional table accepts, used only
    by the sandbox state contract."""

    name = "maxcompute"

    def quote(self, ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    def type_name(self, dt: T.DataType) -> str:
        if isinstance(dt, T.BooleanType):
            return "BOOLEAN"
        if isinstance(dt, T.ByteType):
            return "TINYINT"
        if isinstance(dt, T.ShortType):
            return "SMALLINT"
        if isinstance(dt, T.IntegerType):
            return "INT"
        if isinstance(dt, T.LongType):
            return "BIGINT"
        if isinstance(dt, T.FloatType):
            return "FLOAT"
        if isinstance(dt, T.DoubleType):
            return "DOUBLE"
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        if isinstance(dt, T.DateType):
            return "DATE"
        if isinstance(dt, T.TimestampNTZType):
            return "TIMESTAMP_NTZ"
        if isinstance(dt, T.TimestampType):
            return "TIMESTAMP"
        if isinstance(dt, T.BinaryType):
            return "BINARY"
        if isinstance(dt, T.ArrayType):
            return f"ARRAY<{self.type_name(dt.elementType)}>"
        if isinstance(dt, T.MapType):
            return (f"MAP<{self.type_name(dt.keyType)},"
                    f"{self.type_name(dt.valueType)}>")
        return "STRING"

    def upsert_sql(self, table: str, names: list[str], pks: list[str]) -> str:
        t = self.quote(table)
        src = ", ".join(f"? as {c}" for c in names)
        on = " and ".join(f"t.{k} = s.{k}" for k in pks)
        setlist = ", ".join(f"t.{c} = s.{c}" for c in names if c not in pks)
        ins = ", ".join(f"s.{c}" for c in names)
        stmt = f"merge into {t} as t using (select {src}) as s on {on}"
        if setlist:
            stmt += f" when matched then update set {setlist}"
        return stmt + f" when not matched then insert values ({ins})"

    def delete_sql(self, table: str, pks: list[str]) -> str:
        return (f"delete from {self.quote(table)} where "
                + " and ".join(f"{k} = ?" for k in pks))

    def ddl_sql(self, table: str, event: SchemaChangeEvent,
                evolved_schema: Schema) -> list[str]:
        t = self.quote(table)
        if isinstance(event, CreateTableEvent):
            cols = ", ".join(
                f"{c.name} {self.type_name(c.data_type)}"
                for c in evolved_schema.columns)
            pk = ""
            props = ""
            if evolved_schema.primary_keys:
                pk = ", primary key (" + ", ".join(
                    evolved_schema.primary_keys) + ")"
                # PK tables are TRANSACTIONAL (the SDK tableCreator's
                # transactionTable().withPrimaryKeys(...) path)
                props = ' tblproperties ("transactional"="true")'
            return [f"create table if not exists {t} ({cols}{pk}){props}"]
        if isinstance(event, AddColumnEvent):
            parts = ", ".join(
                f"{cwp.column.name} {self.type_name(cwp.column.data_type)}"
                f" comment '{self.type_name(cwp.column.data_type)}'"
                for cwp in event.added_columns)
            return [f"alter table {t} add columns ({parts})"]
        if isinstance(event, DropColumnEvent):
            return [f"alter table {t} drop columns "
                    + ",".join(event.dropped_column_names)]
        if isinstance(event, RenameColumnEvent):
            return [f"alter table {t} change column {o} rename to {n}"
                    for o, n in event.name_mapping]
        if isinstance(event, AlterColumnTypeEvent):
            return [f"alter table {t} change column {col} {col} "
                    f"{self.type_name(dt)}"
                    for col, dt in event.type_mapping]
        if isinstance(event, TruncateTableEvent):
            return [f"truncate table {t}"]
        if isinstance(event, DropTableEvent):
            return [f"drop table if exists {t}"]
        raise TypeError(f"unknown schema-change event {type(event).__name__}")

    def _alter_column_type(self, quoted_table, event, evolved_schema):
        raise NotImplementedError  # ddl_sql is fully overridden


DIALECTS: dict[str, SqlDialect] = {
    d.name: d for d in (SqliteDialect(), MySqlDialect(), PostgresDialect(),
                        MaxComputeDialect())
}


def get_dialect(name: str) -> SqlDialect:
    try:
        return DIALECTS[name]
    except KeyError:
        raise ValueError(
            f"unknown JDBC dialect {name!r}; known: {sorted(DIALECTS)}")

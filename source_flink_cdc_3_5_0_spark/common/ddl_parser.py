"""MySQL DDL statement parser -> schema-change event algebra.

Parity target: ``flink-cdc-pipeline-connector-mysql/.../source/parser/
CustomMySqlAntlrDdlParser.java`` (+ ``CustomAlterTableParserListener``),
which listens on Debezium's ANTLR parse of binlog DDL and emits
``SchemaChangeEvent``s. We parse the same statement surface with a small
hand tokenizer (no grammar dependency) since the statements Debezium
forwards on the schema-change topic are a narrow, regular subset:

- ``CREATE TABLE [IF NOT EXISTS] t (col defs…, PRIMARY KEY (…))``
- ``ALTER TABLE t ADD [COLUMN] c TYPE … [FIRST | AFTER x]`` (multi-action,
  parenthesized multi-column form)
- ``ALTER TABLE t DROP [COLUMN] c``
- ``ALTER TABLE t RENAME COLUMN a TO b`` / ``CHANGE [COLUMN] old new TYPE``
- ``ALTER TABLE t MODIFY [COLUMN] c TYPE``
- ``TRUNCATE [TABLE] t`` / ``DROP TABLE [IF EXISTS] t``

Type names map through ``mysql_type_to_spark`` (MySqlTypeUtils parity,
unsigned widening included). A ``CHANGE`` with identical old/new names is an
ALTER TYPE; with different names and the same type it's a RENAME; different
names AND type decomposes into RENAME + ALTER TYPE — the same decomposition
the reference listener performs.
"""

from __future__ import annotations

import re

from .events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    ColumnWithPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from .schema import Column, Schema
from .tableid import TableId
from .types import mysql_type_to_spark, oracle_type_to_spark

def _token_re(dq_escapes: bool) -> "re.Pattern[str]":
    # qualified name (`db`.`tbl` / "db"."tbl" / db.tbl) as ONE token;
    # split by _table_id — ordered BEFORE the double-quoted-string rule so
    # Oracle's quote-qualified names don't split at the dot (a lone
    # "string" token, dots inside the quotes or not, still falls through
    # to the string rule: the dot here must sit BETWEEN quoted parts).
    # Double-quoted parts take backslash escapes ONLY in the MySQL
    # dialect, where "..." is a STRING literal with backslash escapes; in
    # Oracle "..." is an IDENTIFIER that never backslash-escapes — an
    # identifier ending in a backslash ("A\") must close at its real
    # quote, so the Oracle tokenizer uses the no-escape variant
    # (_split_qualified mirrors the same per-dialect rule).
    dq = r"\"(?:[^\"\\]|\\.)*\"" if dq_escapes else r"\"[^\"]*\""
    return re.compile(
        r"'(?:[^'\\]|\\.)*'"
        r"|(?:`[^`]*`|" + dq + r"|[A-Za-z_][\w$]*)"
        r"(?:\.(?:`[^`]*`|" + dq + r"|[A-Za-z_][\w$]*))+"
        r"|" + dq +
        r"|`[^`]*`"
        r"|\(|\)|,"
        r"|[^\s(),`]+",
        re.S)


_TOKEN_RE_MYSQL = _token_re(dq_escapes=True)
_TOKEN_RE_ORACLE = _token_re(dq_escapes=False)


def _tokens(sql: str, dialect: str = "mysql") -> list[str]:
    pat = _TOKEN_RE_ORACLE if dialect == "oracle" else _TOKEN_RE_MYSQL
    return pat.findall(sql.strip().rstrip(";"))


def _ident(tok: str, dialect: str = "mysql") -> str:
    # `mysql` backticks and "oracle" double quotes both mark identifiers
    # where an identifier is expected
    if tok[:1] in ('`', '"'):
        return tok[1:-1]
    # Oracle folds unquoted identifiers to UPPERCASE (same normalization
    # Debezium's OracleDdlParser applies); MySQL preserves case
    return tok.upper() if dialect == "oracle" else tok


def _split_qualified(name_tok: str, dialect: str = "mysql") -> list[str]:
    """Split a qualified-name token on dots OUTSIDE quote pairs, so a
    quoted part containing a dot ("ORD.ERS") stays one identifier.
    Per-dialect escape rule, mirroring the tokenizer: in MySQL a
    backslash inside a double-quoted part escapes the next character
    (so '"a\\"b".c' closes at the real quote); in Oracle double quotes
    mark identifiers with NO backslash escapes (so '"A\\".C' — an
    identifier ending in a backslash — splits at the dot). Backticked
    parts never take escapes (MySQL doubles backticks)."""
    dq_escapes = dialect != "oracle"
    parts, cur, quote = [], [], None
    it = iter(name_tok)
    for ch in it:
        if quote:
            cur.append(ch)
            if dq_escapes and ch == "\\" and quote == '"':
                nxt = next(it, None)
                if nxt is not None:
                    cur.append(nxt)
            elif ch == quote:
                quote = None
        elif ch in ('`', '"'):
            quote = ch
            cur.append(ch)
        elif ch == ".":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


class _Cursor:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self, ahead: int = 0) -> str | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of DDL")
        self.i += 1
        return t

    def accept(self, *words: str) -> bool:
        t = self.peek()
        if t is not None and t.upper() in words:
            self.i += 1
            return True
        return False

    def expect(self, word: str) -> str:
        t = self.next()
        if t.upper() != word:
            raise ValueError(f"expected {word}, got {t!r}")
        return t


def _table_id(name_tok: str, database: str | None,
              dialect: str = "mysql") -> TableId:
    # direct construction, not TableId.parse: a quoted identifier may
    # itself contain a dot ("ORD.ERS") that a string re-parse would split
    parts = [_ident(p, dialect)
             for p in _split_qualified(name_tok, dialect)]
    if len(parts) == 1 and database:
        # databaseName may itself be dotted ("db.schema" on Debezium
        # schema-change records) — it is a plain string, never quoted
        parts = database.split(".") + parts
    if len(parts) == 1:
        return TableId("", "", parts[0])
    if len(parts) == 2:
        return TableId("", parts[0], parts[1])
    if len(parts) == 3:
        return TableId(parts[0], parts[1], parts[2])
    raise ValueError("table name %r has more than 3 parts" % name_tok)


_COL_TERMINATORS = {",", ")"}
_CONSTRAINT_STARTERS = {"PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT",
                        "FOREIGN", "FULLTEXT", "SPATIAL", "CHECK"}


def _parse_type(cur: _Cursor, dialect: str = "mysql"):
    """TYPE [(p[,s])] [UNSIGNED] [ZEROFILL] [CHARACTER SET …] [COLLATE …];
    oracle: NUMBER(p[,s]) / NUMBER(*[,s]), VARCHAR2(n [BYTE|CHAR]),
    TIMESTAMP[(fsp)] [WITH [LOCAL] TIME ZONE]."""
    name = cur.next().upper()
    # two-word types: DOUBLE PRECISION / LONG RAW
    if name == "DOUBLE" and cur.accept("PRECISION"):
        pass
    if dialect == "oracle" and name == "LONG" and cur.accept("RAW"):
        name = "LONG RAW"
    if dialect == "oracle" and name == "INTERVAL":
        # INTERVAL YEAR[(p)] TO MONTH / INTERVAL DAY[(p)] TO SECOND[(p)]
        # — embedded precisions are consumed here; the mapping ignores
        # them (OracleTypeUtils switches on the jdbcType alone)
        def unit() -> str:
            u = cur.next().upper()
            if cur.peek() == "(":
                cur.next()
                cur.next()
                cur.expect(")")
            return u
        u1 = unit()
        cur.expect("TO")
        u2 = unit()
        return oracle_type_to_spark(f"INTERVAL {u1} TO {u2}")
    precision = scale = None
    if cur.peek() == "(":
        cur.next()
        first = cur.next()
        if first.startswith(("'", '"')):
            # ENUM('a','b') / SET("x") value lists (either quote style) —
            # skip the balanced list
            depth = 1
            while depth:
                t = cur.next()
                depth += t == "("
                depth -= t == ")"
        else:
            # oracle NUMBER(*, s): '*' means maximum precision
            precision = None if first == "*" else int(first)
            if cur.accept(","):
                scale = int(cur.next())
            # oracle length qualifier: VARCHAR2(20 BYTE) / (20 CHAR)
            if dialect == "oracle":
                cur.accept("BYTE", "CHAR")
            cur.expect(")")
    if dialect == "oracle" and name == "TIMESTAMP" \
            and (cur.peek() or "").upper() == "WITH":
        cur.next()  # WITH
        local = cur.accept("LOCAL")
        cur.expect("TIME")
        cur.expect("ZONE")
        name = ("TIMESTAMP WITH LOCAL TIME ZONE" if local
                else "TIMESTAMP WITH TIME ZONE")
    unsigned = cur.accept("UNSIGNED")
    cur.accept("ZEROFILL")
    while True:
        p = cur.peek()
        if p is None:
            break
        up = p.upper()
        if up == "CHARACTER" and (cur.peek(1) or "").upper() == "SET":
            cur.next(); cur.next(); cur.next()
        elif up in ("CHARSET", "COLLATE"):
            cur.next(); cur.next()
        else:
            break
    if dialect == "oracle":
        return oracle_type_to_spark(name, precision, scale)
    lookup = f"{name} UNSIGNED" if unsigned else name
    return mysql_type_to_spark(lookup, precision, scale)


def _parse_column_def(cur: _Cursor, dialect: str = "mysql"
                      ) -> tuple[Column, ColumnPosition, str | None]:
    name = _ident(cur.next(), dialect)
    dt = _parse_type(cur, dialect)
    nullable = True
    default_expr = None
    comment = None
    position = ColumnPosition.LAST
    anchor = None
    while True:
        p = cur.peek()
        if p is None or p in _COL_TERMINATORS:
            break
        up = p.upper()
        if up == "NOT" and (cur.peek(1) or "").upper() == "NULL":
            cur.next(); cur.next()
            nullable = False
        elif up == "NULL":
            cur.next()
        elif up == "DEFAULT":
            cur.next()
            default_expr = cur.next()
            # balanced parens belong to the default: DEFAULT
            # CURRENT_TIMESTAMP(6), DEFAULT (uuid())
            depth = default_expr.count("(") - default_expr.count(")")
            while depth > 0 or cur.peek() == "(":
                t = cur.next()
                default_expr += t
                depth += t == "("
                depth -= t == ")"
        elif up == "COMMENT":
            cur.next()
            c = cur.next()
            comment = c[1:-1] if c[:1] in "'\"" else c
        elif up in ("AUTO_INCREMENT", "UNIQUE", "PRIMARY"):
            cur.next()
            if up == "PRIMARY":
                cur.accept("KEY")
            if up == "UNIQUE":
                cur.accept("KEY")
        elif up == "FIRST":
            cur.next()
            position = ColumnPosition.FIRST
        elif up == "AFTER":
            cur.next()
            position = ColumnPosition.AFTER
            anchor = _ident(cur.next(), dialect)
        elif up == "ON":  # ON UPDATE CURRENT_TIMESTAMP[(p)]
            cur.next(); cur.next(); cur.next()
            if cur.peek() == "(":
                while cur.next() != ")":
                    pass
        else:
            # tolerated attribute (COLUMN_FORMAT etc.); skip a balanced
            # paren group so a stray '(' can't truncate the column list
            t = cur.next()
            if t == "(":
                depth = 1
                while depth:
                    t = cur.next()
                    depth += t == "("
                    depth -= t == ")"
    return (Column(name, dt, nullable, comment=comment,
                   default_expr=default_expr), position, anchor)


def _parse_create(cur: _Cursor, database: str | None,
                  dialect: str = "mysql") -> CreateTableEvent:
    cur.expect("TABLE")
    if cur.accept("IF"):
        cur.expect("NOT"); cur.expect("EXISTS")
    tid = _table_id(cur.next(), database, dialect)
    cur.expect("(")
    cols: list[Column] = []
    pks: list[str] = []
    while True:
        p = cur.peek()
        if p is None:
            raise ValueError("unterminated column list")
        if p.upper() in _CONSTRAINT_STARTERS:
            kw = cur.next().upper()
            if kw == "PRIMARY":
                cur.expect("KEY")
                cur.expect("(")
                while not cur.accept(")"):
                    t = cur.next()
                    if t == ",":
                        continue
                    pks.append(_ident(t, dialect))
                    if cur.peek() == "(":  # index prefix length: name(10)
                        while cur.next() != ")":
                            pass
            else:
                # skip constraint to its closing paren / next comma at depth 0
                depth = 0
                while True:
                    t = cur.peek()
                    if t is None or (depth == 0 and t in (",", ")")):
                        break
                    t = cur.next()
                    depth += t == "("
                    depth -= t == ")"
        else:
            col, _, _ = _parse_column_def(cur, dialect)
            cols.append(col)
        if cur.accept(","):
            continue
        cur.expect(")")
        break
    # PK columns are implicitly NOT NULL (reference: Schema#primaryKey)
    cols = [c if c.name not in pks else
            Column(c.name, c.data_type, False, c.comment, c.default_expr)
            for c in cols]
    return CreateTableEvent(tid, Schema(columns=tuple(cols),
                                        primary_keys=tuple(pks)))


# ADD/DROP/RENAME targets that are NOT column-schema changes — the action is
# skipped (reference listener: no reaction), never the whole statement
_NON_COLUMN_TARGETS = {"INDEX", "KEY", "CONSTRAINT", "UNIQUE", "FULLTEXT",
                       "SPATIAL", "PRIMARY", "FOREIGN", "CHECK", "PARTITION"}


def _skip_action(cur: _Cursor) -> None:
    """Consume the rest of one ALTER action: to the next top-level comma."""
    depth = 0
    while True:
        t = cur.peek()
        if t is None or (depth == 0 and t == ","):
            return
        t = cur.next()
        depth += t == "("
        depth -= t == ")"


def _parse_alter(cur: _Cursor, database: str | None,
                 dialect: str = "mysql") -> list[SchemaChangeEvent]:
    cur.expect("TABLE")
    tid = _table_id(cur.next(), database, dialect)
    events: list[SchemaChangeEvent] = []
    while cur.peek() is not None:
        kw = cur.next().upper()
        if kw == "ADD" and (cur.peek() or "").upper() not in _NON_COLUMN_TARGETS:
            cur.accept("COLUMN")
            adds: list[ColumnWithPosition] = []
            if cur.accept("("):
                while not cur.accept(")"):
                    col, pos, anchor = _parse_column_def(cur, dialect)
                    adds.append(ColumnWithPosition(col, pos, anchor))
                    cur.accept(",")
            else:
                col, pos, anchor = _parse_column_def(cur, dialect)
                adds.append(ColumnWithPosition(col, pos, anchor))
            # in-order: DROP c, ADD c must replay as drop THEN add
            events.append(AddColumnEvent(tid, tuple(adds)))
        elif kw == "DROP" and (cur.peek() or "").upper() not in _NON_COLUMN_TARGETS:
            cur.accept("COLUMN")
            if cur.accept("("):  # oracle multi-column form: DROP (a, b)
                names: list[str] = []
                while not cur.accept(")"):
                    t = cur.next()
                    if t != ",":
                        names.append(_ident(t, dialect))
                events.append(DropColumnEvent(tid, tuple(names)))
            else:
                events.append(DropColumnEvent(
                    tid, (_ident(cur.next(), dialect),)))
        elif kw == "RENAME" and (cur.peek() or "").upper() == "COLUMN":
            cur.next()
            old = _ident(cur.next(), dialect)
            cur.expect("TO")
            new = _ident(cur.next(), dialect)
            events.append(RenameColumnEvent(tid, ((old, new),)))
        elif kw == "CHANGE":
            cur.accept("COLUMN")
            old = _ident(cur.next(), dialect)
            new = _ident(cur.next(), dialect)
            dt = _parse_type(cur, dialect)
            # reference listener decomposition: rename and/or retype
            if old != new:
                events.append(RenameColumnEvent(tid, ((old, new),)))
            events.append(AlterColumnTypeEvent(tid, ((new, dt),)))
        elif kw == "MODIFY":
            cur.accept("COLUMN")
            if cur.accept("("):  # oracle multi-column form: MODIFY (a T, …)
                changes: list[tuple[str, object]] = []
                while not cur.accept(")"):
                    nm = _ident(cur.next(), dialect)
                    changes.append((nm, _parse_type(cur, dialect)))
                    # tolerate NOT NULL / NULL / DEFAULT tails per column
                    depth = 0
                    while True:
                        t = cur.peek()
                        if t is None or (depth == 0 and t in (",", ")")):
                            break
                        t = cur.next()
                        depth += t == "("
                        depth -= t == ")"
                    cur.accept(",")
                events.append(AlterColumnTypeEvent(tid, tuple(changes)))
            else:
                name = _ident(cur.next(), dialect)
                dt = _parse_type(cur, dialect)
                events.append(AlterColumnTypeEvent(tid, ((name, dt),)))
        elif kw == ",":
            continue
        else:
            # index/constraint/table-option actions (ADD INDEX, DROP KEY,
            # RENAME TO/INDEX, ALGORITHM=..., CONVERT TO CHARACTER SET, …):
            # skip THIS action only — other actions in the statement still
            # produce their events
            _skip_action(cur)
        cur.accept(",")
    return events


def parse_ddl(sql: str, database: str | None = None,
              dialect: str = "mysql") -> list[SchemaChangeEvent]:
    """Parse one DDL statement into schema-change events.

    ``database``: default database for unqualified table names (Debezium's
    ``databaseName`` field on schema-change records). ``dialect``:
    ``mysql`` (binlog/schema-change-topic statements, the
    CustomMySqlAntlrDdlParser surface) or ``oracle`` (LogMiner-captured
    statements — quote-qualified names, NUMBER/VARCHAR2 types, the
    parenthesized multi-column ADD/DROP/MODIFY forms; the reference path
    is Debezium's OracleDdlParser feeding the same event algebra).
    """
    if dialect not in ("mysql", "oracle"):
        raise ValueError(f"unknown DDL dialect {dialect!r}")
    cur = _Cursor(_tokens(sql, dialect))
    head = cur.next().upper()
    if head == "CREATE":
        return [_parse_create(cur, database, dialect)]
    if head == "ALTER":
        return _parse_alter(cur, database, dialect)
    if head == "TRUNCATE":
        cur.accept("TABLE")
        return [TruncateTableEvent(_table_id(cur.next(), database, dialect))]
    if head == "DROP":
        cur.expect("TABLE")
        if cur.accept("IF"):
            cur.expect("EXISTS")
        return [DropTableEvent(_table_id(cur.next(), database, dialect))]
    raise ValueError(f"unsupported DDL statement: {sql[:60]!r}")


def parse_mysql_ddl(sql: str, database: str | None = None
                    ) -> list[SchemaChangeEvent]:
    """MySQL-dialect alias of :func:`parse_ddl` (the original surface)."""
    return parse_ddl(sql, database, "mysql")

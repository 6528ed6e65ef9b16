"""MySQL-5-flavored transform-expression front-end for Catalyst.

The reference parses projection/filter fragments with Calcite
(``TransformParser.java:100-107``, MYSQL_5 conformance, case-sensitive),
validates them against a closed operator table
(``TransformSqlOperatorTable.java:90-380``), transpiles to Java and compiles
with Janino (``JaninoCompiler.java:111``). On Spark the parse/optimize/
codegen pipeline is Catalyst's job — this module is only the **dialect
shim**: a small recursive-descent parser over the same closed operator set
that emits a Spark SQL expression string for ``F.expr``, pinning the
reference's divergent semantics:

- comparison / BETWEEN / IN / LIKE return **FALSE, not NULL**, when an
  operand is NULL (``SystemFunctionUtils.valueEquals`` :754, ``in`` :361,
  ``betweenAsymmetric`` :269 all live behind Janino null-guards) — emitted as
  ``coalesce((cmp), false)``;
- ``UNIX_TIMESTAMP(s[, fmt])`` yields ``Long.MIN_VALUE`` on parse failure
  (``SystemFunctionUtils.java:96-103``) — emitted via ``coalesce``;
- ``DATE_FORMAT`` / ``TO_DATE`` / ``TO_TIMESTAMP`` / ``FROM_UNIXTIME`` use
  Java SimpleDateFormat patterns — literal patterns are translated
  (:mod:`.datetime_patterns`);
- metadata columns ``__namespace_name__ __schema_name__ __table_name__
  __data_event_type__`` (``MetadataColumns.java:30-40``) are substituted at
  plan time from a binding map;
- unknown function names are rejected unless declared as UDFs (parity with
  the closed operator table + UDF registration).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .datetime_patterns import translate_java_pattern


class ExpressionError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<number>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<qident>`[^`]+`)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<op><>|!=|>=|<=|\|\||=|>|<|\+|-|\*|/|%|\(|\)|,|\.)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "IS", "NULL", "TRUE", "FALSE", "BETWEEN", "IN", "LIKE",
    "CASE", "WHEN", "THEN", "ELSE", "END", "CAST", "AS", "ASYMMETRIC",
    "SYMMETRIC", "FROM", "FOR", "BOTH", "LEADING", "TRAILING", "DISTINCT",
}


@dataclass
class Token:
    kind: str  # 'string' | 'number' | 'ident' | 'qident' | 'op' | 'kw' | 'eof'
    text: str
    pos: int


def tokenize(s: str) -> list[Token]:
    toks: list[Token] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ExpressionError(f"cannot tokenize at {i}: {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.upper() in _KEYWORDS:
            toks.append(Token("kw", text.upper(), m.start()))
        else:
            toks.append(Token(kind, text, m.start()))
    toks.append(Token("eof", "", len(s)))
    return toks


# ---------------------------------------------------------------------------
# The closed function table (TransformSqlOperatorTable.java:90-380) mapped to
# Spark SQL. Value = (spark_name | special-handler key, min_args, max_args).
# ---------------------------------------------------------------------------

PASSTHROUGH_FUNCS: dict[str, tuple[str, int, int]] = {
    # string
    "CONCAT": ("concat", 1, 99),
    "CHAR_LENGTH": ("char_length", 1, 1),
    "UPPER": ("upper", 1, 1),
    "LOWER": ("lower", 1, 1),
    "REGEXP_REPLACE": ("regexp_replace", 3, 3),
    "SUBSTR": ("substr", 2, 3),
    "SUBSTRING": ("substring", 2, 3),
    "TRIM": ("trim", 1, 1),
    # numeric
    "ABS": ("abs", 1, 1),
    "FLOOR": ("floor", 1, 1),
    "CEIL": ("ceil", 1, 1),
    "ROUND": ("round", 1, 2),
    "UUID": ("uuid", 0, 0),
    # conditional
    "COALESCE": ("coalesce", 1, 99),
    "IF": ("if", 3, 3),
    "NULLIF": ("nullif", 2, 2),
    # temporal (pattern-free forms; pattern forms handled specially)
    "LOCALTIMESTAMP": ("localtimestamp", 0, 0),
    "CURRENT_TIMESTAMP": ("current_timestamp", 0, 0),
    "NOW": ("now", 0, 0),
    "CURRENT_DATE": ("current_date", 0, 0),
    "TIMESTAMPDIFF": ("timestampdiff", 3, 3),
    "TIMESTAMP_DIFF": ("timestampdiff", 3, 3),
    "TIMESTAMPADD": ("timestampadd", 3, 3),
    "TIMESTAMP_ADD": ("timestampadd", 3, 3),
}

# Functions needing semantic shims; handled in _emit_call.
SPECIAL_FUNCS = {
    "DATE_FORMAT", "TO_DATE", "TO_TIMESTAMP", "FROM_UNIXTIME",
    "UNIX_TIMESTAMP", "LOCALTIME", "CURRENT_TIME",
    "AI_CHAT_PREDICT", "GET_EMBEDDING", "AI_LANGCHAIN_PREDICT",
}

METADATA_COLUMNS = (
    "__namespace_name__",
    "__schema_name__",
    "__table_name__",
    "__data_event_type__",
)

_TIME_UNITS = {"SECOND", "MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "QUARTER", "YEAR"}

# CAST target types (transform.md:201-216) -> Spark SQL type names.
_CAST_TYPES = {
    "STRING": "string", "VARCHAR": "string", "CHAR": "string",
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint", "SMALLINT": "smallint", "INTEGER": "int", "INT": "int",
    "BIGINT": "bigint", "FLOAT": "float", "DOUBLE": "double",
    "DECIMAL": "decimal", "NUMERIC": "decimal",
    "TIMESTAMP": "timestamp", "TIMESTAMP_LTZ": "timestamp", "DATE": "date",
}

# Long.MIN_VALUE as a Spark-SQL-safe literal (a bare -92233…808L literal
# fails to parse: the positive part overflows before negation applies).
LONG_MIN = "BIGINT('-9223372036854775808')"


def ensure_lenient_sql(spark) -> None:
    """Pin the reference's lenient expression semantics on the session.

    Spark 4 enables ANSI mode by default (parse/overflow errors throw);
    Flink CDC's function runtime (SystemFunctionUtils) returns NULL /
    Long.MIN_VALUE instead. The engine sets this per-session before planning
    transform expressions; it is a documented divergence from ANSI SQL,
    pinned by tests/test_dialect.py.
    """
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception:  # pragma: no cover - conf may be locked on some clusters
        pass


# ---------------------------------------------------------------------------
# AST -> we emit Spark SQL strings directly during parsing (single pass); the
# only context-sensitivity (null-is-false) is local to each comparison node.
# ---------------------------------------------------------------------------

@dataclass
class Compiled:
    """A compiled expression fragment plus referenced source columns."""

    sql: str
    columns: set[str] = field(default_factory=set)
    functions: set[str] = field(default_factory=set)


class _Parser:
    def __init__(self, text: str, udfs: set[str] | None = None,
                 metadata_bindings: dict[str, str] | None = None,
                 context: str = "projection"):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        self.udfs = {u.upper() for u in (udfs or set())}
        self.udf_names = {u.upper(): u for u in (udfs or set())}
        self.meta = metadata_bindings or {}
        self.columns: set[str] = set()
        self.functions: set[str] = set()
        # Null-is-false wrapping policy. The reference's comparisons return
        # FALSE on NULL operands (SystemFunctionUtils null-guards). In a
        # *positive* WHERE context, SQL 3-valued logic is observably
        # identical (NULL never passes a filter), and skipping the
        # coalesce() wrapper keeps predicates eligible for parquet pushdown
        # — a large-scan win. The wrapper is required only where NULL vs
        # FALSE is distinguishable: projected boolean columns, and operands
        # of NOT (NOT NULL = NULL drops the row, but the reference's
        # NOT FALSE = TRUE keeps it). parse_not() flips wrapping on for its
        # subtree; 'projection' context wraps everywhere.
        self._wrap_stack = [context == "projection"]

    # -- token helpers --------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise ExpressionError(
                f"expected {text or kind} at pos {got.pos}, got {got.text!r} in {self.text!r}")
        return t

    # -- grammar --------------------------------------------------------
    def parse_expr(self) -> str:
        return self.parse_or()

    def parse_or(self) -> str:
        left = self.parse_and()
        while self.accept("kw", "OR"):
            right = self.parse_and()
            left = f"({left} OR {right})"
        return left

    def parse_and(self) -> str:
        left = self.parse_not()
        while self.accept("kw", "AND"):
            right = self.parse_not()
            left = f"({left} AND {right})"
        return left

    def parse_not(self) -> str:
        if self.accept("kw", "NOT"):
            self._wrap_stack.append(True)
            try:
                inner = self.parse_not()
            finally:
                self._wrap_stack.pop()
            return f"(NOT {inner})"
        return self.parse_comparison()

    def parse_comparison(self) -> str:
        left = self.parse_additive()
        t = self.peek()
        # IS [NOT] NULL / IS [NOT] TRUE|FALSE
        if t.kind == "kw" and t.text == "IS":
            self.next()
            neg = bool(self.accept("kw", "NOT"))
            if self.accept("kw", "NULL"):
                return f"({left} IS {'NOT ' if neg else ''}NULL)"
            # IS TRUE/FALSE distinguish NULL from FALSE, so the operand
            # must carry the null-is-false guard even in filter context
            # (it may have been parsed unguarded) — re-guard here.
            guarded = f"coalesce({left}, false)"
            if self.accept("kw", "TRUE"):
                return f"(({guarded}) {'IS NOT TRUE' if neg else 'IS TRUE'})"
            if self.accept("kw", "FALSE"):
                return f"(({guarded}) {'IS NOT FALSE' if neg else 'IS FALSE'})"
            raise ExpressionError(f"bad IS clause near pos {t.pos}")
        neg = False
        if t.kind == "kw" and t.text == "NOT" and self.peek(1).text in ("BETWEEN", "IN", "LIKE"):
            self.next()
            neg = True
            t = self.peek()
        if t.kind == "kw" and t.text == "BETWEEN":
            self.next()
            self.accept("kw", "ASYMMETRIC")
            lo = self.parse_additive()
            self.expect("kw", "AND")
            hi = self.parse_additive()
            # null-is-false semantics (betweenAsymmetric :269-319)
            core = f"({left} BETWEEN {lo} AND {hi})"
            return self._false_on_null(core, negate=neg)
        if t.kind == "kw" and t.text == "IN":
            self.next()
            self.expect("op", "(")
            items = [self.parse_expr()]
            while self.accept("op", ","):
                items.append(self.parse_expr())
            self.expect("op", ")")
            core = f"({left} IN ({', '.join(items)}))"
            return self._false_on_null(core, negate=neg)
        if t.kind == "kw" and t.text == "LIKE":
            self.next()
            pat = self.parse_additive()
            core = f"({left} LIKE {pat})"
            return self._false_on_null(core, negate=neg)
        if t.kind == "op" and t.text in ("=", "<>", "!=", ">", ">=", "<", "<="):
            op = self.next().text
            if op == "!=":
                op = "<>"
            right = self.parse_additive()
            return self._false_on_null(f"({left} {op} {right})")
        return left

    def _false_on_null(self, core: str, negate: bool = False) -> str:
        """Reference comparisons return FALSE (not NULL) on NULL operands;
        the NOT-variants (notIn/notLike/notBetween) also null-guard to FALSE
        (SystemFunctionUtils.java:393-421), so negation applies inside the
        guard. In unwrapped (positive-filter) context the guard is elided —
        see __init__ — keeping the predicate pushdown-eligible."""
        wrap = self._wrap_stack[-1]
        if negate:
            # NOT-variants always need the guard: NULL must yield FALSE,
            # while un-guarded NOT(NULL) stays NULL only in filter context
            # where both drop the row — still identical; elide when allowed.
            return f"coalesce((NOT {core}), false)" if wrap else f"(NOT {core})"
        return f"coalesce({core}, false)" if wrap else core

    def parse_additive(self) -> str:
        left = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("+", "-"):
                self.next()
                right = self.parse_multiplicative()
                left = f"({left} {t.text} {right})"
            elif t.kind == "op" and t.text == "||":
                self.next()
                right = self.parse_multiplicative()
                left = f"concat({left}, {right})"
            else:
                return left

    def parse_multiplicative(self) -> str:
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("*", "/", "%"):
                self.next()
                right = self.parse_unary()
                left = f"({left} {t.text} {right})"
            elif t.kind == "ident" and t.text.upper() == "DIV":
                # MySQL integer division (transform expression dialect);
                # Spark's `DIV` operator has the same truncating semantics
                self.next()
                right = self.parse_unary()
                left = f"({left} DIV {right})"
            else:
                return left

    def parse_unary(self) -> str:
        t = self.peek()
        if t.kind == "op" and t.text in ("-", "+"):
            self.next()
            inner = self.parse_unary()
            return f"({t.text}{inner})"
        return self.parse_primary()

    # -- primary --------------------------------------------------------
    def parse_primary(self) -> str:
        t = self.peek()
        if t.kind == "string":
            self.next()
            return t.text
        if t.kind == "number":
            self.next()
            return t.text
        if t.kind == "kw" and t.text in ("TRUE", "FALSE", "NULL"):
            self.next()
            return t.text.lower()
        if t.kind == "kw" and t.text == "CASE":
            return self.parse_case()
        if t.kind == "kw" and t.text == "CAST":
            return self.parse_cast()
        if t.kind == "op" and t.text == "(":
            self.next()
            inner = self.parse_expr()
            self.expect("op", ")")
            return f"({inner})"
        if t.kind == "qident":
            self.next()
            name = t.text[1:-1]
            return self._column_ref(name)
        if t.kind == "ident":
            # function call?
            if self.peek(1).kind == "op" and self.peek(1).text == "(":
                return self.parse_call()
            self.next()
            return self._column_ref(t.text)
        raise ExpressionError(f"unexpected token {t.text!r} at pos {t.pos} in {self.text!r}")

    def _column_ref(self, name: str) -> str:
        if name in METADATA_COLUMNS:
            if name in self.meta:
                v = self.meta[name]
                return "'" + v.replace("'", "''") + "'"
            # left unbound: refer to an envelope column of the same name
            self.columns.add(name)
            return f"`{name}`"
        self.columns.add(name)
        return f"`{name}`"

    def parse_case(self) -> str:
        # inside CASE, comparison results feed value positions (THEN/ELSE
        # can be booleans surfacing in output) — keep the guard on
        self._wrap_stack.append(True)
        try:
            return self._parse_case_inner()
        finally:
            self._wrap_stack.pop()

    def _parse_case_inner(self) -> str:
        self.expect("kw", "CASE")
        parts = ["CASE"]
        if not (self.peek().kind == "kw" and self.peek().text in ("WHEN",)):
            # simple CASE: CASE operand WHEN v THEN r ...
            operand = self.parse_expr()
            parts.append(operand)
        while self.accept("kw", "WHEN"):
            cond = self.parse_expr()
            self.expect("kw", "THEN")
            val = self.parse_expr()
            parts.append(f"WHEN {cond} THEN {val}")
        if self.accept("kw", "ELSE"):
            parts.append(f"ELSE {self.parse_expr()}")
        self.expect("kw", "END")
        parts.append("END")
        return "(" + " ".join(parts) + ")"

    def parse_cast(self) -> str:
        self.expect("kw", "CAST")
        self.expect("op", "(")
        # CAST(x AS ...) materializes x — guard comparisons inside
        self._wrap_stack.append(True)
        try:
            inner = self.parse_expr()
        finally:
            self._wrap_stack.pop()
        self.expect("kw", "AS")
        tname = self.expect("ident").text.upper()
        if tname not in _CAST_TYPES:
            raise ExpressionError(f"unsupported CAST target {tname}")
        spark_t = _CAST_TYPES[tname]
        if self.accept("op", "("):
            p = self.expect("number").text
            s = None
            if self.accept("op", ","):
                s = self.expect("number").text
            self.expect("op", ")")
            if spark_t == "decimal":
                spark_t = f"decimal({p},{s or 0})"
            # VARCHAR(n)/CHAR(n) lengths are dropped (Spark strings are unbounded)
        elif spark_t == "decimal":
            spark_t = "decimal(10,0)"
        self.expect("op", ")")
        return f"CAST({inner} AS {spark_t})"

    def parse_call(self) -> str:
        name_tok = self.next()
        fname = name_tok.text.upper()
        self.functions.add(fname)
        self.expect("op", "(")
        # a comparison used as a FUNCTION ARGUMENT (e.g. COALESCE(x > 5,
        # TRUE)) surfaces its NULL-vs-FALSE distinction — guard applies even
        # in filter context
        self._wrap_stack.append(True)
        try:
            return self._parse_call_inner(fname)
        finally:
            self._wrap_stack.pop()

    def _parse_call_inner(self, fname: str) -> str:
        if fname == "TRIM":
            return self._parse_trim()
        if fname in ("SUBSTRING", "SUBSTR"):
            return self._parse_substring(fname)

        args: list[str] = []
        if not (self.peek().kind == "op" and self.peek().text == ")"):
            # TIMESTAMPDIFF/TIMESTAMPADD take a bare unit keyword first
            if fname in ("TIMESTAMPDIFF", "TIMESTAMP_DIFF", "TIMESTAMPADD", "TIMESTAMP_ADD") \
                    and self.peek().kind == "ident" and self.peek().text.upper() in _TIME_UNITS:
                args.append(self.next().text.upper())
            else:
                args.append(self.parse_expr())
            while self.accept("op", ","):
                args.append(self.parse_expr())
        self.expect("op", ")")
        return self._emit_call(fname, args)

    def _parse_trim(self) -> str:
        # TRIM([BOTH|LEADING|TRAILING] [chars] FROM str) | TRIM(str)
        mode = "BOTH"
        t = self.peek()
        if t.kind == "kw" and t.text in ("BOTH", "LEADING", "TRAILING"):
            mode = self.next().text
        first = None
        if not (self.peek().kind == "kw" and self.peek().text == "FROM"):
            first = self.parse_expr()
        if self.accept("kw", "FROM"):
            src = self.parse_expr()
            chars = first if first is not None else "' '"
            fn = {"BOTH": "trim", "LEADING": "ltrim", "TRAILING": "rtrim"}[mode]
            self.expect("op", ")")
            if chars == "' '":
                return f"{fn}({src})"
            # Spark SQL natively supports TRIM(BOTH chars FROM str)
            return f"TRIM({mode} {chars} FROM {src})"
        # plain TRIM(str)
        self.expect("op", ")")
        return f"trim({first})"

    def _parse_substring(self, fname: str) -> str:
        # SUBSTRING(s FROM p [FOR l]) or SUBSTRING(s, p[, l])
        s = self.parse_expr()
        if self.accept("kw", "FROM"):
            p = self.parse_expr()
            l = None
            if self.accept("kw", "FOR"):
                l = self.parse_expr()
            self.expect("op", ")")
            return f"substring({s}, {p}, {l})" if l else f"substring({s}, {p})"
        args = [s]
        while self.accept("op", ","):
            args.append(self.parse_expr())
        self.expect("op", ")")
        return f"substring({', '.join(args)})"

    # -- function emission ----------------------------------------------
    def _translate_pattern_arg(self, arg: str) -> str:
        """If ``arg`` is a string literal, run the SimpleDateFormat->Spark
        pattern translation on it; non-literal patterns pass through (the
        common case in the reference's tests is literal patterns)."""
        if arg.startswith("'") and arg.endswith("'"):
            inner = arg[1:-1].replace("''", "'")
            return "'" + translate_java_pattern(inner).replace("'", "''") + "'"
        return arg

    def _emit_call(self, fname: str, args: list[str]) -> str:
        if fname in PASSTHROUGH_FUNCS:
            spark, lo, hi = PASSTHROUGH_FUNCS[fname]
            if not (lo <= len(args) <= hi):
                raise ExpressionError(f"{fname} expects {lo}..{hi} args, got {len(args)}")
            return f"{spark}({', '.join(args)})"
        if fname == "DATE_FORMAT":
            if len(args) != 2:
                raise ExpressionError("DATE_FORMAT(ts, fmt)")
            return f"date_format({args[0]}, {self._translate_pattern_arg(args[1])})"
        if fname == "TO_DATE":
            if len(args) == 1:
                return f"to_date({args[0]})"
            return f"to_date({args[0]}, {self._translate_pattern_arg(args[1])})"
        if fname == "TO_TIMESTAMP":
            if len(args) == 1:
                return f"to_timestamp({args[0]})"
            return f"to_timestamp({args[0]}, {self._translate_pattern_arg(args[1])})"
        if fname == "FROM_UNIXTIME":
            if len(args) == 1:
                return f"from_unixtime({args[0]})"
            return f"from_unixtime({args[0]}, {self._translate_pattern_arg(args[1])})"
        if fname == "UNIX_TIMESTAMP":
            # parse failure -> Long.MIN_VALUE (SystemFunctionUtils.java:96-103)
            if len(args) == 0:
                return "unix_timestamp()"
            inner = ", ".join(
                [args[0]] + [self._translate_pattern_arg(a) for a in args[1:]])
            return f"coalesce(unix_timestamp({inner}), {LONG_MIN})"
        if fname in ("LOCALTIME", "CURRENT_TIME"):
            # reference returns a TIME value in pipeline tz; Spark has no TIME
            # type — render as 'HH:mm:ss' string (documented divergence).
            return "date_format(localtimestamp(), 'HH:mm:ss')"
        if fname in ("AI_CHAT_PREDICT", "GET_EMBEDDING", "AI_LANGCHAIN_PREDICT"):
            # model UDFs must be registered (see functions/ai_models.py)
            return f"{fname}({', '.join(args)})"
        if fname in self.udfs:
            return f"{self.udf_names[fname]}({', '.join(args)})"
        raise ExpressionError(
            f"function {fname!r} is not in the transform operator table "
            f"(TransformSqlOperatorTable) nor a registered UDF")


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def compile_expression(text: str, udfs: set[str] | None = None,
                       metadata_bindings: dict[str, str] | None = None,
                       context: str = "projection") -> Compiled:
    """Compile one scalar expression to a Spark SQL string.

    ``context='filter'`` elides null-is-false guards where 3-valued WHERE
    logic is observably identical (keeps parquet predicate pushdown)."""
    p = _Parser(text, udfs, metadata_bindings, context)
    sql = p.parse_expr()
    if p.peek().kind != "eof":
        t = p.peek()
        raise ExpressionError(f"trailing input at pos {t.pos}: {t.text!r} in {text!r}")
    return Compiled(sql=sql, columns=p.columns, functions=p.functions)


@dataclass(frozen=True)
class ProjectionColumn:
    """One item of a projection list: expression + output name."""

    expression: str  # original dialect text ('*' for wildcard)
    alias: str | None
    compiled: Compiled | None  # None for wildcard
    is_wildcard: bool = False
    # a bare column reference (forwarding) — keeps comments/defaults
    # (TransformParser.resolveProjectionColumnFromIdentifier:389-421)
    forwarded_column: str | None = None


def split_top_level(text: str) -> list[str]:
    """Split a projection list on top-level commas (quote/paren aware)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    i = 0
    while i < len(text):
        c = text[i]
        if c == "'":
            j = i + 1
            while j < len(text):
                if text[j] == "'" and not (j + 1 < len(text) and text[j + 1] == "'"):
                    break
                j += 2 if text[j] == "'" else 1
            cur.append(text[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    last = "".join(cur).strip()
    if last:
        parts.append(last)
    return parts


_AS_RE = re.compile(r"^(?P<expr>.*?)\s+AS\s+(?P<alias>`[^`]+`|[A-Za-z_][A-Za-z0-9_$]*)\s*$",
                    re.IGNORECASE | re.DOTALL)
_BARE_IDENT_RE = re.compile(r"^\s*(`[^`]+`|[A-Za-z_][A-Za-z0-9_$]*)\s*$")


def parse_projection(projection: str, udfs: set[str] | None = None,
                     metadata_bindings: dict[str, str] | None = None) -> list[ProjectionColumn]:
    """Parse a projection list ``a, b AS c, UPPER(d) AS e, \\*``.

    Wildcard ``*`` (and the reference's escaped ``\\*``) expands to all
    physical columns at plan time (``TransformParser.expandWildcard:251-269``).
    """
    items = split_top_level(projection)
    out: list[ProjectionColumn] = []
    for item in items:
        stripped = item.strip()
        if stripped in ("*", "\\*"):
            out.append(ProjectionColumn("*", None, None, is_wildcard=True))
            continue
        m = _AS_RE.match(stripped)
        if m:
            expr_text, alias = m.group("expr").strip(), m.group("alias")
        else:
            expr_text, alias = stripped, None
        if alias and alias.startswith("`"):
            alias = alias[1:-1]
        bare = _BARE_IDENT_RE.match(expr_text)
        compiled = compile_expression(expr_text, udfs, metadata_bindings)
        fwd = None
        if bare and not compiled.functions:
            name = bare.group(1)
            fwd = name[1:-1] if name.startswith("`") else name
        if alias is None:
            if fwd is None:
                raise ExpressionError(
                    f"computed projection item needs an alias: {stripped!r}")
            alias = fwd
        out.append(ProjectionColumn(expr_text, alias, compiled, forwarded_column=fwd))
    return out

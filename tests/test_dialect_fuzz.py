"""Cross-engine dialect fuzzer: random expressions from the transform
grammar, compiled by our dialect front-end, evaluated by Spark AND DuckDB on
the same little table — results must agree (hypothesis-driven).

Grammar is restricted to constructs whose compiled Spark SQL is also valid
DuckDB SQL modulo backticks (arithmetic + - *, comparisons with the
null-is-false guard, AND/OR/NOT, CASE WHEN, COALESCE, ABS), over an int
column ``a``, a nullable int ``b`` and a double ``d``.
"""

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.functions.dialect import compile_expression

ROWS = [
    (1, None, 0.5),
    (2, 5, -1.25),
    (3, -7, 2.0),
    (0, 0, 0.0),
    (-4, 9, 3.75),
]


def _num_expr(depth):
    if depth <= 0:
        return st.sampled_from(["a", "b", "d", "1", "2", "-3", "0.5"])
    sub = st.deferred(lambda: _num_expr(depth - 1))
    return st.one_of(
        st.sampled_from(["a", "b", "d", "1", "2", "-3", "0.5"]),
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"),
        sub.map(lambda x: f"ABS({x})"),
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
    )


def _bool_expr(depth):
    num = _num_expr(depth - 1 if depth > 0 else 0)
    base = st.tuples(num, st.sampled_from(["=", "<>", "<", "<=", ">", ">="]), num).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})")
    if depth <= 0:
        return base
    sub = st.deferred(lambda: _bool_expr(depth - 1))
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"),
        sub.map(lambda x: f"(NOT {x})"),
        num.map(lambda x: f"({x} IS NULL)"),
    )


def _full_expr():
    return st.one_of(
        _num_expr(2),
        _bool_expr(2),
        st.tuples(_bool_expr(1), _num_expr(1), _num_expr(1)).map(
            lambda t: f"CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END"),
    )


def _normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return f"{float(v):.10g}" if isinstance(v, int) else str(v)


@pytest.fixture(scope="module")
def engines(spark):
    from source_flink_cdc_3_5_0_spark.functions.dialect import ensure_lenient_sql

    ensure_lenient_sql(spark)
    sdf = spark.createDataFrame(ROWS, "a INT, b INT, d DOUBLE")
    sdf.createOrReplaceTempView("fuzz_t")
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_t(a INTEGER, b INTEGER, d DOUBLE)")
    con.executemany("INSERT INTO fuzz_t VALUES (?,?,?)", ROWS)
    return spark, con


@settings(max_examples=60, deadline=None)
@given(expr=_full_expr())
def test_dialect_matches_duckdb(engines, expr):
    spark, con = engines
    compiled = compile_expression(expr).sql  # projection context (guarded)
    srows = [r[0] for r in
             spark.sql(f"SELECT {compiled} FROM fuzz_t ORDER BY a").collect()]
    duck_sql = compiled.replace("`", "")
    drows = [r[0] for r in
             con.execute(f"SELECT {duck_sql} FROM fuzz_t ORDER BY a").fetchall()]
    assert [_normalize(x) for x in srows] == [_normalize(x) for x in drows], (
        f"expr={expr!r} compiled={compiled!r}")

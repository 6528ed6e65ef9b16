"""Dialect front-end unit tests (mirrors TransformParserTest /
JaninoCompilerTest layer): compilation output + runtime semantics of the
divergent cases, evaluated through Catalyst on tiny frames."""

import pytest
from pyspark.sql import Row, functions as F

from source_flink_cdc_3_5_0_spark.functions.datetime_patterns import translate_java_pattern
from source_flink_cdc_3_5_0_spark.functions.dialect import (
    ExpressionError,
    compile_expression,
    parse_projection,
    split_top_level,
)


def test_split_top_level():
    assert split_top_level("a, b AS c, f(x, y) AS d") == ["a", "b AS c", "f(x, y) AS d"]
    assert split_top_level("'a,b', c") == ["'a,b'", "c"]
    assert split_top_level("CASE WHEN a THEN 'x,y' ELSE b END AS t, z") == [
        "CASE WHEN a THEN 'x,y' ELSE b END AS t", "z"]


def test_projection_requires_alias_for_computed():
    with pytest.raises(ExpressionError):
        parse_projection("UPPER(a)")
    cols = parse_projection("UPPER(a) AS ua, b")
    assert [c.alias for c in cols] == ["ua", "b"]
    assert cols[1].forwarded_column == "b"


def test_unknown_function_rejected_but_udf_allowed():
    with pytest.raises(ExpressionError):
        compile_expression("NOPE(a)")
    c = compile_expression("myudf(a)", udfs={"myudf"})
    assert "myudf(`a`)" == c.sql


def test_metadata_binding():
    c = compile_expression("__table_name__", metadata_bindings={"__table_name__": "t1"})
    assert c.sql == "'t1'"
    # unbound metadata column refers to an envelope column
    c2 = compile_expression("__data_event_type__")
    assert c2.sql == "`__data_event_type__`"


def test_pattern_translation():
    assert translate_java_pattern("yyyy-MM-dd HH:mm:ss") == "yyyy-MM-dd HH:mm:ss"
    assert translate_java_pattern("u") == "e"
    assert translate_java_pattern("'at' HH") == "'at' HH"


@pytest.fixture(scope="module")
def frame(spark):
    from source_flink_cdc_3_5_0_spark.functions.dialect import ensure_lenient_sql

    ensure_lenient_sql(spark)
    return spark.createDataFrame(
        [Row(a=1, b=None, s="Hello World", d=2.5, t="2024-03-05 10:30:00"),
         Row(a=5, b=7, s=" pad ", d=-2.5, t="not-a-date")])


def _eval(frame, expr, **kw):
    sql = compile_expression(expr, **kw).sql
    return [r[0] for r in frame.select(F.expr(sql)).collect()]


def test_null_is_false_comparisons(frame):
    # b is NULL in row 1: comparison yields FALSE, not NULL (reference
    # SystemFunctionUtils null-guards)
    assert _eval(frame, "b > 3") == [False, True]
    assert _eval(frame, "b = 7") == [False, True]
    assert _eval(frame, "b BETWEEN 1 AND 10") == [False, True]
    assert _eval(frame, "b IN (7, 8)") == [False, True]
    assert _eval(frame, "NOT (b > 3)") == [True, False]
    assert _eval(frame, "b IS NULL") == [True, False]


def test_unix_timestamp_failure_long_min(frame):
    out = _eval(frame, "UNIX_TIMESTAMP(t, 'yyyy-MM-dd HH:mm:ss')")
    assert out[0] == 1709634600  # 2024-03-05 10:30:00 UTC
    assert out[1] == -9223372036854775808  # Long.MIN_VALUE on parse failure


def test_string_and_math_functions(frame):
    assert _eval(frame, "UPPER(s)")[0] == "HELLO WORLD"
    assert _eval(frame, "TRIM(s)")[1] == "pad"
    assert _eval(frame, "SUBSTR(s, 1, 5)")[0] == "Hello"
    assert _eval(frame, "SUBSTRING(s FROM 7)")[0] == "World"
    assert _eval(frame, "CHAR_LENGTH(s)")[0] == 11
    assert _eval(frame, "ABS(d)") == [2.5, 2.5]
    assert _eval(frame, "CEIL(d)") == [3, -2]
    assert _eval(frame, "FLOOR(d)") == [2, -3]
    assert _eval(frame, "ROUND(d, 0)") == [3.0, -3.0]  # HALF_UP away from zero
    assert _eval(frame, "s || '!'")[1] == " pad !"


def test_case_cast_if(frame):
    assert _eval(frame, "CASE WHEN a > 3 THEN 'hi' ELSE 'lo' END") == ["lo", "hi"]
    assert _eval(frame, "CASE a WHEN 1 THEN 'one' ELSE 'other' END") == ["one", "other"]
    assert _eval(frame, "IF(a > 3, a, 0)") == [0, 5]
    assert _eval(frame, "COALESCE(b, -1)") == [-1, 7]
    assert _eval(frame, "CAST(d AS INTEGER)") == [2, -2]  # truncation
    assert _eval(frame, "CAST(a AS STRING)") == ["1", "5"]
    from decimal import Decimal
    assert _eval(frame, "CAST(d AS DECIMAL(5,1))") == [Decimal("2.5"), Decimal("-2.5")]


def test_temporal_functions(frame):
    assert _eval(frame, "DATE_FORMAT(TO_TIMESTAMP(t, 'yyyy-MM-dd HH:mm:ss'), 'yyyy/MM/dd')")[0] == "2024/03/05"
    assert _eval(frame, "TIMESTAMPDIFF(DAY, TO_TIMESTAMP('2024-03-01 00:00:00'), TO_TIMESTAMP('2024-03-05 00:00:00'))")[0] == 4
    assert _eval(frame, "TIMESTAMPADD(HOUR, 2, TO_TIMESTAMP('2024-03-01 00:00:00'))")[0].hour == 2


def test_is_true_false(frame):
    assert _eval(frame, "(a > 3) IS TRUE") == [False, True]
    assert _eval(frame, "(a > 3) IS NOT TRUE") == [True, False]


def test_trailing_garbage_rejected():
    with pytest.raises(ExpressionError):
        compile_expression("a + 1 extra")
    with pytest.raises(ExpressionError):
        compile_expression("CAST(a AS NOPE)")

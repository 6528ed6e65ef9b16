"""Skew operators + property-based tests (hypothesis) for the type lattice."""

from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F, types as T

from source_flink_cdc_3_5_0_spark.common.types import (
    STRING,
    get_least_common_type,
    is_type_compatible,
)
from source_flink_cdc_3_5_0_spark.operators.skew import salted_agg, salted_join

SCALAR_TYPES = [
    T.StringType(), T.BooleanType(), T.BinaryType(),
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(),
    T.DecimalType(10, 2), T.DecimalType(20, 5), T.DecimalType(38, 0),
    T.DateType(), T.TimestampType(), T.TimestampNTZType(),
]

types_st = st.sampled_from(SCALAR_TYPES)


@settings(max_examples=300, deadline=None)
@given(a=types_st, b=types_st)
def test_lattice_commutative(a, b):
    assert get_least_common_type(a, b) == get_least_common_type(b, a)


@settings(max_examples=300, deadline=None)
@given(a=types_st)
def test_lattice_idempotent(a):
    assert get_least_common_type(a, a) == a


@settings(max_examples=300, deadline=None)
@given(a=types_st, b=types_st)
def test_merge_is_compatible_upper_bound(a, b):
    """The merged type must accept data of both inputs (the whole point of
    getCommonSchema): merge(a,b) compatible-with a and b."""
    m = get_least_common_type(a, b)
    assert is_type_compatible(m, a) or m == a
    assert is_type_compatible(m, b) or m == b


@settings(max_examples=200, deadline=None)
@given(a=types_st, b=types_st, c=types_st)
def test_lattice_monotone_string_absorbs(a, b, c):
    """STRING is the top: once a merge hits STRING it stays there."""
    if get_least_common_type(a, b) == STRING:
        assert get_least_common_type(get_least_common_type(a, b), c) == STRING


class TestSkewOperators:
    def test_salted_agg_matches_plain(self, spark):
        df = spark.range(0, 10000).select(
            (F.col("id") % 3).alias("k"), (F.col("id") * 2).alias("v"))
        plain = {(r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
                 for r in df.groupBy("k").agg(
                     F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"),
                     F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
        salted = {(r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
                  for r in salted_agg(df, ["k"], {
                      "s": "sum(v)", "c": "count(*)", "mn": "min(v)", "mx": "max(v)",
                  }, n_salts=7).collect()}
        assert plain == salted

    def test_salted_join_matches_plain(self, spark):
        big = spark.range(0, 5000).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
        small = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(5)])
        plain = big.join(small, on=["k"]).count()
        salted = salted_join(big, small, on=["k"], n_salts=4).count()
        assert plain == salted == 5000

    def test_salted_agg_two_shuffles(self, spark):
        df = spark.range(0, 100).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
        p = salted_agg(df, ["k"], {"s": "sum(v)"})._jdf.queryExecution() \
            .executedPlan().toString()
        assert p.count("Exchange") == 2  # salted partial + final

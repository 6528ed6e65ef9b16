"""Deletion-neighborhood fuzzy join: completeness on each edit kind,
no false positives, and the no-cross-join plan shape."""

import pytest
from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.extensions.fuzzy import (
    deletion_neighborhood,
    fuzzy_self_join,
)


def _pairs(spark, rows, k=1):
    df = spark.createDataFrame(rows, "id bigint, name string")
    return {(r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_self_join(df, "id", "name", k).collect()}


class TestFuzzySelfJoin:
    def test_each_edit_kind_is_found(self, spark):
        got = _pairs(spark, [
            (1, "kitten"), (2, "mitten"),      # substitution
            (3, "spark"), (4, "sparkk"),       # insertion
            (5, "flink"), (6, "link"),         # deletion
            (7, "exact"), (8, "exact"),        # identical (dist 0)
            (9, "unrelated"),
        ])
        assert got == {(1, 2): 1, (3, 4): 1, (5, 6): 1, (7, 8): 0}

    def test_distance_two_rejected(self, spark):
        # candidate via shared deletion variant? "abcd" vs "abef" share no
        # single-deletion variant AND are distance 2 — must not appear;
        # "ab" vs "ba" (distance 2, but share deletion variants "a"/"b")
        # must be killed by the verify step, not the blocking
        got = _pairs(spark, [(1, "abcd"), (2, "abef"), (3, "ab"), (4, "ba")])
        assert got == {}

    def test_nulls_and_empty_ok(self, spark):
        got = _pairs(spark, [(1, None), (2, ""), (3, "a")])
        # "" and "a": distance 1 via deletion; null dropped
        assert got == {(2, 3): 1}

    def test_k2_not_implemented(self, spark):
        df = spark.createDataFrame([(1, "x")], "id bigint, name string")
        with pytest.raises(NotImplementedError, match="max_distance=1"):
            fuzzy_self_join(df, "id", "name", max_distance=2).collect()

    def test_neighborhood_contents(self, spark):
        out = (spark.createDataFrame([("abc",)], "t string")
               .select(deletion_neighborhood("t").alias("n"))
               .first()["n"])
        assert sorted(out) == ["ab", "abc", "ac", "bc"]

    def test_plan_has_no_cartesian(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
        plan = (fuzzy_self_join(df, "id", "name")
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

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


class TestPrefixDup:
    def test_containment_pairs_and_threshold(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.dedup import (
            prefix_dup_pairs,
        )

        long = " ".join(f"w{i}" for i in range(40))
        half = " ".join(f"w{i}" for i in range(20))
        other = " ".join(f"x{i}" for i in range(40))
        short = "w0 w1 w2"  # below min_prefix_tokens: exempt
        df = spark.createDataFrame(
            [(1, long), (2, half), (3, other), (4, short), (5, long)],
            "doc_id bigint, text string")
        got = {(r["dup_id"], r["kept_id"]): (r["n_tokens_dup"],
                                             r["n_tokens_kept"])
               for r in prefix_dup_pairs(df, min_prefix_tokens=16).collect()}
        # 2 is a prefix of 1 and of 5; 1 and 5 are equal (id tiebreak);
        # 3 matches nothing; 4 is exempt
        assert got == {(2, 1): (20, 40), (2, 5): (20, 40),
                       (1, 5): (40, 40)}

    def test_no_cartesian_plan(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.dedup import (
            prefix_dup_pairs,
        )

        df = spark.createDataFrame([(1, "a b"), (2, "a b c")],
                                   "doc_id bigint, text string")
        plan = (prefix_dup_pairs(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSuffixDup:
    def test_suffix_containment(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.dedup import (
            prefix_dup_pairs,
        )

        tail = " ".join(f"w{i}" for i in range(20))
        long = "HEADER BOILER " + tail
        df = spark.createDataFrame(
            [(1, long), (2, tail), (3, "x " + tail.replace("w5", "zz"))],
            "doc_id bigint, text string")
        got = {(r["dup_id"], r["kept_id"]) for r in
               prefix_dup_pairs(df, min_prefix_tokens=16,
                                side="suffix").collect()}
        assert got == {(2, 1)}  # tail is a suffix of long; 3 diverges
        # prefix mode must NOT pair them (the header breaks the prefix)
        assert prefix_dup_pairs(df, min_prefix_tokens=16).count() == 0
        import pytest as _p
        with _p.raises(ValueError, match="side"):
            prefix_dup_pairs(df, side="infix")

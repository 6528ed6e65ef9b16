"""Property tests for the deterministic sampling/mixing operators:
selection independence across groups, exact stratified counts, budget
never overshot, line-dedup rebuild order."""

from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.extensions.sampling import (
    quota_sample,
    stratified_split,
    token_budget_sample,
)
from source_flink_cdc_3_5_0_spark.extensions.text import dedup_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "g string, id bigint, w int")


class TestTokenBudget:
    def test_budget_never_overshot_and_prefix_property(self, spark):
        df = _docs(spark, [("a", i, 10) for i in range(100)]
                   + [("b", 1000 + i, 7) for i in range(50)])
        out = token_budget_sample(df, ["g"], "id", "w", 95)
        sums = {r["g"]: r["s"] for r in
                out.groupBy("g").agg(F.sum("w").alias("s")).collect()}
        # <= budget, and maximal (adding the next doc would overshoot)
        assert sums["a"] == 90 and sums["b"] == 91

    def test_groups_are_independent(self, spark):
        """Adding rows to group b must not change group a's selection."""
        base = [("a", i, 5) for i in range(40)]
        extra = [("b", 500 + i, 5) for i in range(40)]
        sel1 = {r["id"] for r in token_budget_sample(
            _docs(spark, base), ["g"], "id", "w", 57).collect()}
        sel2 = {r["id"] for r in token_budget_sample(
            _docs(spark, base + extra), ["g"], "id", "w", 57)
            .where("g = 'a'").collect()}
        assert sel1 == sel2

    def test_dict_budgets_per_group(self, spark):
        df = _docs(spark, [("a", i, 1) for i in range(30)]
                   + [("b", 100 + i, 1) for i in range(30)])
        out = token_budget_sample(df, ["g"], "id", "w",
                                  {"a": 5, "b": 20})
        counts = {r["g"]: r["c"] for r in
                  out.groupBy("g").agg(F.count("*").alias("c")).collect()}
        assert counts == {"a": 5, "b": 20}


class TestStratifiedSplit:
    def test_exact_counts_and_partition(self, spark):
        df = _docs(spark, [("a", i, 0) for i in range(100)]
                   + [("b", 1000 + i, 0) for i in range(6)])
        out = stratified_split(df, ["g"], "id",
                               {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {(r["g"], r["split"]): r["c"] for r in
                  out.groupBy("g", "split").agg(
                      F.count("*").alias("c")).collect()}
        assert counts[("a", "train")] == 80
        assert counts[("a", "val")] == 10
        assert counts[("a", "test")] == 10
        # the 6-row stratum STILL gets val/test representation: floor cuts
        # at 4 (train) and 5 (val), remainder -> test
        assert counts[("b", "train")] == 4
        assert counts[("b", "val")] == 1
        assert counts[("b", "test")] == 1
        assert out.count() == 106  # partition: every row exactly once

    def test_deterministic_across_runs(self, spark):
        df = _docs(spark, [("a", i, 0) for i in range(50)])
        f = {"train": 0.5, "test": 0.5}
        one = {(r["id"], r["split"]) for r in
               stratified_split(df, ["g"], "id", f).collect()}
        two = {(r["id"], r["split"]) for r in
               stratified_split(df, ["g"], "id", f).collect()}
        assert one == two

    def test_bad_fractions_rejected(self, spark):
        import pytest

        df = _docs(spark, [("a", 1, 0)])
        with pytest.raises(ValueError, match="sum to 1"):
            stratified_split(df, ["g"], "id", {"train": 0.5, "val": 0.1})


class TestDedupLines:
    def test_rebuild_order_and_full_boilerplate_drop(self, spark):
        lines = spark.createDataFrame(
            [(1, 0, "keep me"), (1, 1, "BOILER"), (1, 2, "also keep"),
             (2, 0, "BOILER"), (2, 1, "unique two"),
             (3, 0, "BOILER")],  # doc 3 is pure boilerplate
            "doc_id bigint, pos int, line string")
        out = {r["doc_id"]: r for r in
               dedup_lines(lines, max_freq=2).collect()}
        assert out[1]["text"] == "keep me\nalso keep"  # position order kept
        assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
        assert out[2]["text"] == "unique two"
        assert 3 not in out  # zero surviving lines -> document dropped

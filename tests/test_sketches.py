"""KMV distinct-count sketch: accuracy bound and execution shape."""

from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.extensions.sketches import kmv_distinct_estimate

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_within_error_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select("l_orderkey").distinct().count()
    est = kmv_distinct_estimate(li, "l_orderkey", k=256).first()["kmv_estimate"]
    # standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_kmv_exact_below_capacity(spark):
    """Fewer than k distinct values → the sketch returns the exact count."""
    df = spark.range(100).select(F.col("id").alias("v"))
    row = kmv_distinct_estimate(df, "v", k=256).first()
    assert row["kmv_estimate"] == 100.0


def test_kmv_plans_takeordered_not_full_sort(spark):
    """Bottom-k must execute as TakeOrderedAndProject (per-partition heads),
    never a global Sort + Exchange of all distinct hashes."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = kmv_distinct_estimate(li, "l_orderkey", k=256)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in p, p


def test_grouped_kmv_accuracy_and_exact_below_capacity(spark):
    """Per-group sketch: groups with < k distinct values report the EXACT
    count; larger groups estimate within the ~1/sqrt(k-2) bound."""
    import math

    from pyspark.sql import functions as F

    from source_flink_cdc_3_5_0_spark.extensions.sketches import (
        kmv_distinct_estimate_by)

    # group 'small' has 40 distinct vals (< k=64 -> exact); 'big' has 5000
    m = F.floor(F.col("id") / 2)
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 2 == 0, "small").otherwise("big").alias("g"),
        F.when(F.col("id") % 2 == 0, m % 40).otherwise(m % 5000).alias("v"))
    got = {r["g"]: r["kmv_estimate"]
           for r in kmv_distinct_estimate_by(df, ["g"], "v", k=64).collect()}
    assert got["small"] == 40.0
    rel_err = abs(got["big"] - 5000) / 5000
    assert rel_err < 5 / math.sqrt(62), f"estimate {got['big']} off by {rel_err:.2%}"


class TestHistogramQuantiles:
    def test_error_bounded_by_bin_width(self, spark):
        """The estimate is the lower edge of the covering bucket, so it is
        within one bin width below the exact quantile."""
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.sketches import (
            histogram_quantiles,
        )

        vals = [float((i * 37) % 1000) for i in range(2000)]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        out = {r["q"]: r for r in
               histogram_quantiles(df, "v", ["g"], bins=100).collect()}
        width = (max(vals) - min(vals)) / 100
        for q in (0.5, 0.9, 0.99):
            exact = float(np.quantile(vals, q, method="inverted_cdf"))
            est = out[q]["estimate"]
            assert est <= exact + 1e-9
            assert exact - est <= width + 1e-9, (q, est, exact)
            assert out[q]["n_rows"] == 2000

    def test_merge_equals_recompute(self, spark):
        """Bucket counts are additive: the sketch over a union equals the
        sketch computed per part and merged (here: recomputed over the
        concatenation — the merge is the same groupBy)."""
        from source_flink_cdc_3_5_0_spark.extensions.sketches import (
            histogram_quantiles,
        )

        a = [("g", float(i)) for i in range(500)]
        b = [("g", float(i)) for i in range(500, 1000)]
        whole = spark.createDataFrame(a + b, "g string, v double")
        got = {(r["q"]): r["estimate"] for r in
               histogram_quantiles(whole, "v", ["g"]).collect()}
        # recompute on a reshuffled layout: partitioning must not matter
        got2 = {(r["q"]): r["estimate"] for r in
                histogram_quantiles(whole.repartition(13), "v", ["g"])
                .collect()}
        assert got == got2

    def test_all_null_raises(self, spark):
        import pytest

        from source_flink_cdc_3_5_0_spark.extensions.sketches import (
            histogram_quantiles,
        )

        df = spark.createDataFrame([("g", None)], "g string, v double")
        with pytest.raises(ValueError, match="all-null"):
            histogram_quantiles(df, "v", ["g"])

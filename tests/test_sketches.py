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

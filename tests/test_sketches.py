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

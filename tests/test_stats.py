"""Exact-moment group z-score outliers: correctness vs numpy, partition
invariance (the determinism the operator exists for), sigma-zero guard."""

from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.extensions.stats import (
    group_zscore_outliers,
)


class TestZscoreOutliers:
    def test_matches_numpy_population_stats(self, spark):
        import numpy as np

        vals = [float((i * 13) % 50) for i in range(300)] + [500.0]
        df = spark.createDataFrame([("g", i, v) for i, v in enumerate(vals)],
                                   "g string, i long, v double")
        out = {r["i"]: r for r in
               group_zscore_outliers(df, ["g"], "v", z=2.0).collect()}
        cents = np.round(np.array(vals) * 100)
        mu, sigma = cents.mean(), cents.std()
        for i, c in enumerate(cents):
            zs = (c - mu) / sigma
            assert abs(out[i]["zscore"] - round(zs, 6)) <= 1e-6
            assert out[i]["is_outlier"] == (abs(zs) > 2.0)
        assert out[300]["is_outlier"]  # the planted 500.0 spike

    def test_partition_invariant(self, spark):
        df = spark.createDataFrame(
            [("g%d" % (i % 3), i, float(i % 17)) for i in range(200)],
            "g string, i long, v double")
        a = {(r["i"], r["zscore"], r["is_outlier"]) for r in
             group_zscore_outliers(df, ["g"], "v").collect()}
        b = {(r["i"], r["zscore"], r["is_outlier"]) for r in
             group_zscore_outliers(df.repartition(17), ["g"], "v").collect()}
        assert a == b

    def test_constant_group_no_outliers(self, spark):
        df = spark.createDataFrame([("g", i, 7.0) for i in range(10)],
                                   "g string, i long, v double")
        rows = group_zscore_outliers(df, ["g"], "v").collect()
        assert all(r["zscore"] == 0.0 and not r["is_outlier"] for r in rows)


class TestZscoreNullHandling:
    def test_null_values_excluded_null_groups_kept(self, spark):
        """Review findings: NULL values must not bias n vs the null-
        skipping sums, and NULL group keys must not vanish from the
        output (null-safe join)."""
        df = spark.createDataFrame(
            [("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, None),
             (None, 4, 5.0), (None, 5, 7.0)],
            "g string, i long, v double")
        out = {r["i"]: r for r in
               group_zscore_outliers(df, ["g"], "v", z=1.5).collect()}
        # NULL-value row excluded entirely
        assert set(out) == {1, 2, 4, 5}
        # group 'g' stats over n=2 (not 3): mean 1500 cents, sigma 500
        assert out[1]["zscore"] == -1.0 and out[2]["zscore"] == 1.0
        # NULL group survives and has its own stats
        assert out[4]["zscore"] == -1.0 and out[5]["zscore"] == 1.0


class TestPairwiseCorrelation:
    def test_known_correlations(self, spark):
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.stats import (
            pairwise_correlation)
        rows = [(float(i), float(2 * i + 3), float((-1) ** i), 5.0)
                for i in range(50)]
        df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE, w DOUBLE, k DOUBLE")
        got = {(r.col_x, r.col_y): r for r in
               pairwise_correlation(df, ["x", "y", "w", "k"]).collect()}
        assert got[("x", "y")].r == 1.0            # perfect linear
        assert got[("x", "k")].r is None           # constant col -> undefined
        # numpy cross-check on the alternating column
        xs = np.array([r[0] for r in rows]); ws = np.array([r[2] for r in rows])
        want = float(np.corrcoef(xs, ws)[0, 1])
        assert abs(got[("x", "w")].r - want) < 1e-6
        assert all(r.n == 50 for r in got.values())

    def test_listwise_null_deletion(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.stats import (
            pairwise_correlation)
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 2.0), (3.0, None), (None, 4.0)],
            "x DOUBLE, y DOUBLE")
        out = pairwise_correlation(df, ["x", "y"]).collect()
        assert out[0].n == 2

    def test_single_scan_single_aggregate(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.stats import (
            pairwise_correlation)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        p = pairwise_correlation(li, ["l_quantity", "l_extendedprice"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert p.count("Scan parquet") == 1, p


class TestHistogramDrift:
    def test_identical_not_drifted_shifted_drifted(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.stats import histogram_drift
        import pyspark.sql.functions as F
        base = spark.range(2000).select(
            ((F.col("id") % 100) * 1.0).alias("x"))
        same = histogram_drift(base, base, "x").collect()[0]
        assert same.tvd == 0.0 and not same.drifted
        shifted = base.select((F.col("x") + 500.0).alias("x"))
        d = histogram_drift(base, shifted, "x").collect()[0]
        assert d.tvd > 0.9 and d.drifted     # disjoint supports -> TVD ~1

    def test_noise_floor_guards_small_samples(self, spark):
        """Two small random-ish halves of one distribution must NOT
        drift: tvd lands under the analytic noise floor."""
        from source_flink_cdc_3_5_0_spark.extensions.stats import histogram_drift
        import pyspark.sql.functions as F
        df = spark.range(600).select(
            (F.crc32(F.col("id").cast("string")) % 1000).cast("double")
            .alias("x"), "id")
        a = df.where(F.col("id") % 2 == 0)
        b = df.where(F.col("id") % 2 == 1)
        r = histogram_drift(a, b, "x").collect()[0]
        assert r.tvd <= r.noise_floor and not r.drifted

    def test_mergeable_counts(self, spark):
        """TVD from unioned halves equals TVD from the whole frame — the
        bin counts are additive, so the sketch maintains incrementally."""
        from source_flink_cdc_3_5_0_spark.extensions.stats import histogram_drift
        import pyspark.sql.functions as F
        whole = spark.range(1000).select((F.col("id") % 50 * 2.0).alias("x"))
        h1 = whole.limit(400)
        h2 = whole.subtract(h1.limit(0)).exceptAll(h1)
        other = whole.select((F.col("x") + 7.0).alias("x"))
        t_whole = histogram_drift(whole, other, "x").collect()[0].tvd
        t_union = histogram_drift(h1.unionAll(h2), other, "x").collect()[0].tvd
        assert t_whole == t_union


class TestStreamingDriftMaintenance:
    def test_incremental_bin_counts_equal_batch_tvd(self, spark, tmp_path):
        """Maintain the reference histogram incrementally over a file
        stream (foreachBatch) and compare the final TVD against the
        one-shot batch computation — the drift monitor as a continuously
        maintained observability job (bin counts are additive, so no
        micro-batch ever re-reads history)."""
        import pyspark.sql.functions as F

        from source_flink_cdc_3_5_0_spark.extensions.stats import histogram_drift

        src = tmp_path / "feed"
        whole = spark.range(3000).select(
            ((F.col("id") % 77) * 1.0).alias("x"), "id")
        for part in range(3):
            (whole.where(F.col("id") % 3 == part).select("x").coalesce(1)
             .write.mode("append").parquet(str(src)))
        other = whole.select((F.col("x") * 2.0 + 11).alias("x"))

        # incremental side: fold each micro-batch's exact cents counts;
        # the final histogram_drift call derives its own shared range, so
        # no bucketing constants need to survive between batches
        acc: dict = {}

        def fold(batch_df, batch_id):
            rows = (batch_df.select(
                        F.round(F.col("x") * 100).cast("bigint").alias("v"))
                    .groupBy("v").count().collect())
            for r in rows:
                acc[r["v"]] = acc.get(r["v"], 0) + r["count"]

        q = (spark.readStream.schema("x DOUBLE")
             .option("maxFilesPerTrigger", 1).parquet(str(src))
             .writeStream.foreachBatch(fold)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        rebuilt = spark.createDataFrame(
            [(v,) for v, c in acc.items() for _ in range(c)], "v BIGINT") \
            .select((F.col("v") / 100.0).alias("x"))
        t_stream = histogram_drift(rebuilt, other, "x").collect()[0].tvd
        t_batch = histogram_drift(whole.select("x"), other, "x").collect()[0].tvd
        assert t_stream == t_batch


class TestCorrelationOverflowRegression:
    def test_large_magnitudes_do_not_wrap(self, spark):
        """Cents around 3e9 (v*v ~ 1e19 > int64) must still produce the
        numpy-exact Pearson r — operands are widened BEFORE the multiply."""
        import numpy as np

        from source_flink_cdc_3_5_0_spark.extensions.stats import (
            pairwise_correlation)
        rng = np.random.RandomState(13)
        xs = (3.1e7 + rng.rand(60) * 1e6)          # dollars -> ~3.1e9 cents
        ys = 2.5 * xs + rng.rand(60) * 1e5
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(xs, ys)],
            "x DOUBLE, y DOUBLE")
        r = pairwise_correlation(df, ["x", "y"]).collect()[0].r
        want = float(np.corrcoef(np.round(xs * 100), np.round(ys * 100))[0, 1])
        assert abs(r - want) < 1e-6
        assert 0.99 < r <= 1.0

"""Property tests for the deterministic sampling/mixing operators:
selection independence across groups, exact stratified counts, budget
never overshot, line-dedup rebuild order."""

import pytest
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


class TestPackSequences:
    def test_concat_then_chunk_arithmetic(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            pack_sequences,
        )

        # one group; md5-priority order is deterministic — recompute it
        # here and check the span arithmetic against a pure-Python pack
        import hashlib

        rows = [("a", i, 3 + (i * 7) % 10) for i in range(40)]
        df = _docs(spark, rows)
        out = {r["id"]: r for r in
               pack_sequences(df, ["g"], "id", "w", 16).collect()}

        order = sorted(rows, key=lambda r: (
            hashlib.md5(str(r[1]).encode()).hexdigest(), r[1]))
        cum = 0
        for g, i, w in order:
            start, end = cum, cum + w
            cum = end
            r = out[i]
            assert r["bin_id"] == start // 16
            assert r["bin_offset"] == start % 16
            assert r["straddles"] == (w > 0 and (end - 1) // 16 > start // 16)

    def test_zero_weight_never_straddles(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            pack_sequences,
        )

        df = _docs(spark, [("a", 1, 0), ("a", 2, 32), ("a", 3, 0)])
        for r in pack_sequences(df, ["g"], "id", "w", 16).collect():
            if r["w"] == 0:
                assert not r["straddles"]

    def test_groups_pack_independently(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            pack_sequences,
        )

        base = [("a", i, 5) for i in range(20)]
        extra = [("b", 100 + i, 5) for i in range(20)]
        one = {(r["id"], r["bin_id"], r["bin_offset"]) for r in
               pack_sequences(_docs(spark, base), ["g"], "id", "w", 13)
               .collect()}
        two = {(r["id"], r["bin_id"], r["bin_offset"]) for r in
               pack_sequences(_docs(spark, base + extra), ["g"], "id", "w", 13)
               .where("g = 'a'").collect()}
        assert one == two


class TestGlobalRowIds:
    def test_dense_ids_follow_total_order(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.indexing import (
            global_row_ids,
        )

        # shuffled input across several partitions
        rows = [("s%02d" % (i % 7), 1000 - i) for i in range(300)]
        df = spark.createDataFrame(rows, "src string, k bigint").repartition(11)
        out = global_row_ids(df, ["src", "k"], num_partitions=5).collect()
        assert sorted(r["global_id"] for r in out) == list(range(300))
        by_order = sorted(out, key=lambda r: (r["src"], r["k"]))
        assert [r["global_id"] for r in by_order] == list(range(300))

    def test_invariant_to_partition_count(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.indexing import (
            global_row_ids,
        )

        df = spark.createDataFrame(
            [(i % 3, i) for i in range(100)], "g int, k int")
        a = {(r["g"], r["k"], r["global_id"]) for r in
             global_row_ids(df, ["g", "k"], num_partitions=2).collect()}
        b = {(r["g"], r["k"], r["global_id"]) for r in
             global_row_ids(df, ["g", "k"], num_partitions=9).collect()}
        assert a == b

    def test_no_single_partition_exchange_in_plan(self, spark):
        """The whole point: a dense global id WITHOUT collapsing to one
        partition. The plan must contain a range exchange and no
        SinglePartition exchange (which the naive global window would
        introduce)."""
        from source_flink_cdc_3_5_0_spark.extensions.indexing import (
            global_row_ids,
        )

        df = spark.createDataFrame([(i,) for i in range(50)], "k int")
        out = global_row_ids(df, ["k"], num_partitions=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()
        assert "singlepartition" not in plan.lower()


class TestSlidingChunks:
    def test_overlap_shares_tokens(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import chunk_windows

        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = sorted(chunk_windows(df, window_tokens=4, stride=2).collect(),
                      key=lambda r: r["window_idx"])
        # starts at 0,2,4,6,8 — 5 windows; window i covers tokens [2i, 2i+4)
        assert [r["window_idx"] for r in rows] == [0, 1, 2, 3, 4]
        assert rows[0]["chunk"] == "t0 t1 t2 t3"
        assert rows[1]["chunk"] == "t2 t3 t4 t5"
        assert rows[4]["chunk"] == "t8 t9"  # short tail
        assert rows[4]["n_tokens"] == 2
        # consecutive windows share W - S = 2 tokens
        for a, b in zip(rows, rows[1:]):
            assert a["chunk"].split()[-2:] == b["chunk"].split()[:2] or \
                b["n_tokens"] < 2

    def test_default_stride_is_disjoint(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import chunk_windows

        text = " ".join(f"t{i}" for i in range(9))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = chunk_windows(df, window_tokens=4).collect()
        assert sorted(r["n_tokens"] for r in rows) == [1, 4, 4]

    def test_bad_stride_rejected(self, spark):
        import pytest

        from source_flink_cdc_3_5_0_spark.extensions.text import chunk_windows

        df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="stride"):
            chunk_windows(df, window_tokens=4, stride=5)


class TestNegativeSamples:
    def test_k_negatives_per_anchor_and_determinism(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            negative_samples,
        )

        df = spark.createDataFrame([(i,) for i in range(400)], "doc_id bigint")
        out = negative_samples(df, "doc_id", k=3).collect()
        per = {}
        for r in out:
            per.setdefault(r["anchor_id"], set()).add(r["negative_id"])
            assert r["negative_id"] != r["anchor_id"]
        # 400 ids over 16 buckets -> ~25 per bucket, always > k+1: exactly
        # k distinct negatives per anchor
        assert set(per) == set(range(400))
        assert all(len(v) == 3 for v in per.values())
        again = {(r["anchor_id"], r["negative_id"]) for r in
                 negative_samples(df.repartition(7), "doc_id", k=3).collect()}
        assert {(r["anchor_id"], r["negative_id"]) for r in out} == again

    def test_tiny_bucket_no_self_pairs(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            negative_samples,
        )

        # 3 ids: buckets of size <= 3 with k=4 wrap repeatedly — output
        # must still never contain a self pair
        df = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
        for r in negative_samples(df, "doc_id", k=4).collect():
            assert r["negative_id"] != r["anchor_id"]


class TestNegativeSamplesConfig:
    def test_num_buckets_honored_and_k_validated(self, spark):
        import pytest

        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            hash_bucket_int,
            negative_samples,
        )

        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
        # more buckets -> different ring neighborhoods than the default
        a = {(r["anchor_id"], r["negative_id"]) for r in
             negative_samples(df, "doc_id", k=2).collect()}
        b = {(r["anchor_id"], r["negative_id"]) for r in
             negative_samples(df, "doc_id", k=2, num_buckets=64).collect()}
        assert a != b
        # bucket expression bounded by n
        mx = (df.select(hash_bucket_int("doc_id", 64).alias("b"))
              .agg({"b": "max"}).first()[0])
        assert 0 <= mx < 64
        with pytest.raises(ValueError, match="k must be"):
            negative_samples(df, "doc_id", k=0)
        with pytest.raises(ValueError, match="num_buckets"):
            negative_samples(df, "doc_id", k=1, num_buckets=1000)


class TestLengthBucketBatches:
    def test_batches_bounded_and_deterministic(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            length_bucket_batches,
        )

        df = spark.createDataFrame(
            [(i, 10 + (i * 7) % 200) for i in range(300)],
            "doc_id bigint, w int")
        out = length_bucket_batches(df, "doc_id", "w",
                                    bucket_width=32, batch_size=8).collect()
        by_batch = {}
        for r in out:
            assert r["length_bucket"] == r["w"] // 32
            assert 0 <= r["slot"] < 8
            by_batch.setdefault(
                (r["length_bucket"], r["batch_idx"]), []).append(r["slot"])
        for (lb, bi), slots in by_batch.items():
            assert sorted(slots) == list(range(len(slots)))
            assert len(slots) <= 8
        again = {(r["doc_id"], r["batch_idx"], r["slot"]) for r in
                 length_bucket_batches(df.repartition(9), "doc_id", "w",
                                       bucket_width=32, batch_size=8)
                 .collect()}
        assert {(r["doc_id"], r["batch_idx"], r["slot"]) for r in out} == again

    def test_bad_params(self, spark):
        import pytest

        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            length_bucket_batches,
        )

        df = spark.createDataFrame([(1, 5)], "doc_id bigint, w int")
        with pytest.raises(ValueError, match="must be >= 1"):
            length_bucket_batches(df, "doc_id", "w", batch_size=0)


class TestTemperatureSample:
    def _docs(self, spark):
        rows = [(i, "big") for i in range(400)] + \
               [(1000 + i, "mid") for i in range(100)] + \
               [(2000 + i, "small") for i in range(25)]
        return spark.createDataFrame(rows, "doc_id bigint, lang string")

    def test_quotas_sum_to_target_and_upweight_small(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            temperature_sample

        out = temperature_sample(self._docs(spark), ["lang"], "doc_id", 100)
        per = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert sum(per.values()) == 100
        # alpha=0.5 shares: w = floor(sqrt(n)) = 20/10/5 -> 57/28/14 (+1)
        # vs proportional 76/19/5: small and mid up-weighted, big down
        assert per["small"] > 100 * 25 / 525
        assert per["big"] < 100 * 400 / 525

    def test_alpha_one_is_proportional_and_zero_uniform(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            temperature_sample

        docs = self._docs(spark)
        p1 = {r["lang"]: r["n"] for r in
              temperature_sample(docs, ["lang"], "doc_id", 105, alpha=1.0)
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert p1["big"] == 80  # 105*400/525 exactly
        p0 = {r["lang"]: r["n"] for r in
              temperature_sample(docs, ["lang"], "doc_id", 30, alpha=0.0)
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(p0.values()) == {10}

    def test_quota_caps_at_group_size(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            temperature_sample

        out = temperature_sample(self._docs(spark), ["lang"], "doc_id", 520,
                                 alpha=0.0)
        per = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        # uniform 173/group, but small has only 25 docs
        assert per["small"] == 25

    def test_unsupported_alpha_raises(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            temperature_sample

        with pytest.raises(ValueError, match="alpha"):
            temperature_sample(self._docs(spark), ["lang"], "doc_id", 10,
                               alpha=0.3)


class TestRepeatToBudget:
    def _docs(self, spark):
        rows = [(i, "small", 100) for i in range(5)] + \
               [(100 + i, "big", 100) for i in range(50)]
        return spark.createDataFrame(
            rows, "doc_id bigint, lang string, n_tok int")

    def test_small_group_repeats_big_group_truncates(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            repeat_to_budget

        out = repeat_to_budget(self._docs(spark), ["lang"], "doc_id",
                               "n_tok", 2000)
        per = {r["lang"]: r["n"] for r in out.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
        # small: tot=500, budget 2000 -> 4 full epochs x 5 docs
        assert per["small"] == 20
        # big: tot=5000 > budget -> first 20 docs, epoch 0 only
        assert per["big"] == 20
        eps = {r["lang"]: r["m"] for r in out.groupBy("lang")
               .agg(F.max("epoch").alias("m")).collect()}
        assert eps["small"] == 3 and eps["big"] == 0

    def test_never_overshoots_budget(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            repeat_to_budget

        out = repeat_to_budget(self._docs(spark), ["lang"], "doc_id",
                               "n_tok", 1234)
        used = {r["lang"]: r["s"] for r in out.groupBy("lang")
                .agg(F.sum("n_tok").alias("s")).collect()}
        assert all(v <= 1234 for v in used.values())
        # and it fills to within one doc weight of the budget
        assert all(v > 1234 - 100 for v in used.values())

    def test_dict_budget_per_group(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            repeat_to_budget

        out = repeat_to_budget(self._docs(spark), ["lang"], "doc_id",
                               "n_tok", {"small": 1500, "big": 300})
        per = {r["lang"]: r["n"] for r in out.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert per["small"] == 15 and per["big"] == 3


class TestTemperatureNullGroup:
    def test_null_group_value_keeps_its_quota(self, spark):
        """A NULL group value is a real group: the quota join must be
        null-safe or those rows silently vanish and the sum-to-target
        contract breaks (code-review find)."""
        from source_flink_cdc_3_5_0_spark.extensions.sampling import \
            temperature_sample

        rows = [(i, "en") for i in range(90)] + \
               [(1000 + i, None) for i in range(90)]
        docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = temperature_sample(docs, ["lang"], "doc_id", 100)
        assert out.count() == 100
        per = {r["lang"]: r["n"] for r in out.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert per[None] == 50 and per["en"] == 50


class TestMergeCorpora:
    def test_priority_wins_and_provenance(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import merge_corpora
        mk = lambda rows: spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        wiki = mk([(1, "shared a"), (2, "wiki only")])
        web = mk([(10, "shared a"), (11, "web only"), (12, "shared a")])
        out = {r.text: r for r in merge_corpora(
            [(wiki, "wiki", 0), (web, "web", 2)]).collect()}
        assert len(out) == 3
        a = out["shared a"]
        assert a.source == "wiki" and a.doc_id == 1
        assert a.n_copies == 3 and a.n_sources == 2
        assert out["wiki only"].n_copies == 1
        assert out["web only"].source == "web"

    def test_tie_breaks_on_id(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import merge_corpora
        a = spark.createDataFrame([(5, "x")], "doc_id BIGINT, text STRING")
        b = spark.createDataFrame([(3, "x")], "doc_id BIGINT, text STRING")
        out = merge_corpora([(a, "a", 1), (b, "b", 1)]).collect()
        assert len(out) == 1 and out[0].doc_id == 3 and out[0].source == "b"

    def test_empty_sources_rejected(self, spark):
        import pytest as _pytest

        from source_flink_cdc_3_5_0_spark.extensions.sampling import merge_corpora
        with _pytest.raises(ValueError):
            merge_corpora([])


class TestMixtureInterleave:
    def test_even_spread_property(self, spark):
        """In any prefix of the interleaved order, each group's share is
        within one item of proportional — the low-discrepancy property
        that blocked (sorted-by-group) orders lack."""
        import pyspark.sql.functions as F

        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            mixture_interleave)
        rows = ([(i, "big") for i in range(90)]
                + [(1000 + i, "small") for i in range(10)])
        df = spark.createDataFrame(rows, "doc_id BIGINT, g STRING")
        out = (mixture_interleave(df, "g").orderBy("position")
               .select("g", "position").collect())
        assert [r.position for r in out] == list(range(100))
        seen_small = 0
        for idx, r in enumerate(out, start=1):
            if r.g == "small":
                seen_small += 1
            expected = idx * 10 / 100
            assert abs(seen_small - expected) <= 1.0, (idx, seen_small)

    def test_positions_dense_and_deterministic(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.sampling import (
            mixture_interleave)
        df = spark.createDataFrame(
            [(i, "ab"[i % 2]) for i in range(20)], "doc_id BIGINT, g STRING")
        a = {r.doc_id: r.position
             for r in mixture_interleave(df, "g").collect()}
        b = {r.doc_id: r.position
             for r in mixture_interleave(df, "g").collect()}
        assert a == b
        assert sorted(a.values()) == list(range(20))

"""Retract-stream incremental aggregation: delta algebra per op kind,
-U/+U pair convention, equality with materialize-then-aggregate, and the
single-shuffle plan shape."""

import re

from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.common.events import BEFORE_COL, OP_COL
from source_flink_cdc_3_5_0_spark.operators.retract import incremental_agg


def _chg(spark, rows):
    """rows: (group, value, before_value_or_None, op)"""
    df = spark.createDataFrame(
        rows, f"g string, v long, bv long, {OP_COL} string")
    return df.withColumn(
        BEFORE_COL, F.when(F.col("bv").isNotNull(), F.struct(F.col("bv"))))


def _agg(spark, rows):
    out = incremental_agg(_chg(spark, rows), ["g"], F.col("v"),
                          before_value=F.col(f"{BEFORE_COL}.bv"))
    return {r["g"]: (r["n_rows"], r["sum_value"]) for r in out.collect()}


class TestIncrementalAgg:
    def test_insert_update_delete_deltas(self, spark):
        got = _agg(spark, [
            ("a", 10, None, "+I"),
            ("a", 20, None, "+I"),
            ("a", 25, 20, "+U"),    # 20 -> 25: count unchanged, sum +5
            ("a", 10, None, "-D"),  # remove the 10
            ("b", 7, None, "+I"),
        ])
        assert got == {"a": (1, 25), "b": (1, 7)}

    def test_retract_pair_convention(self, spark):
        # Flink-style -U/+U pairs: the -U retracts the before image, the
        # +U (before absent) adds the after image
        got = _agg(spark, [
            ("a", 20, None, "+I"),
            ("a", 20, None, "-U"),
            ("a", 26, None, "+U"),
        ])
        assert got == {"a": (1, 26)}

    def test_fully_deleted_group_dropped(self, spark):
        got = _agg(spark, [
            ("a", 5, None, "+I"),
            ("a", 5, None, "-D"),
            ("b", 1, None, "+I"),
        ])
        assert got == {"b": (1, 1)}

    def test_equals_materialize_then_aggregate(self, spark):
        """The retract aggregate over a keyed changelog must equal
        aggregating the materialized final state."""
        from source_flink_cdc_3_5_0_spark.sources.base import SEQ_COL
        from source_flink_cdc_3_5_0_spark.streaming.materialize import (
            latest_image,
        )

        # keyed churn: 100 keys, every 3rd updated, every 4th deleted
        base = [(i, "g%d" % (i % 5), i * 10) for i in range(100)]
        rows, seq = [], 0
        for k, g, v in base:
            rows.append((k, g, v, None, "+I", seq)); seq += 1
        for k, g, v in base:
            if k % 3 == 0:
                rows.append((k, g, v + 1, v, "+U", seq)); seq += 1
        for k, g, v in base:
            if k % 4 == 0:
                vv = v + 1 if k % 3 == 0 else v
                rows.append((k, g, vv, None, "-D", seq)); seq += 1
        df = spark.createDataFrame(
            rows, f"k long, g string, v long, bv long, {OP_COL} string, "
                  f"{SEQ_COL} long")
        chg = df.withColumn(BEFORE_COL, F.when(
            F.col("bv").isNotNull(), F.struct(F.col("bv"))))
        inc = {r["g"]: (r["n_rows"], r["sum_value"]) for r in
               incremental_agg(chg, ["g"], F.col("v"),
                               before_value=F.col(f"{BEFORE_COL}.bv"))
               .collect()}
        mat = latest_image(chg.drop(BEFORE_COL, "bv"), ["k"], seq_col=SEQ_COL)
        ref = {r["g"]: (r["n"], r["s"]) for r in
               mat.groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                                    F.sum("v").alias("s")).collect()}
        assert inc == ref

    def test_single_shuffle_partial_agg(self, spark):
        chg = _chg(spark, [("a", 1, None, "+I")])
        plan = (incremental_agg(chg, ["g"], F.col("v"),
                                before_value=F.col(f"{BEFORE_COL}.bv"))
                ._jdf.queryExecution().executedPlan().toString())
        assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
        assert plan.count("HashAggregate") >= 2, plan  # partial + final


class TestIncrementalAggModes:
    def test_pair_convention_without_before_value(self, spark):
        """No before_value: every +U is the adding half of a -U/+U pair
        (count +1) — a lone review finding: the group must survive."""
        df = _chg(spark, [
            ("a", 20, None, "+I"),
            ("a", 20, None, "-U"),
            ("a", 26, None, "+U"),
        ]).drop(BEFORE_COL, "bv")
        out = {r["g"]: (r["n_rows"], r["sum_value"])
               for r in incremental_agg(df, ["g"], F.col("v")).collect()}
        assert out == {"a": (1, 26)}

    def test_emit_deltas_keeps_zero_count_updates(self, spark):
        """Batch-wise maintenance: a micro-batch of pure updates has
        count delta 0 but a real sum delta — emit_deltas must keep it."""
        rows = [("a", 25, 20, "+U")]
        dropped = incremental_agg(_chg(spark, rows), ["g"], F.col("v"),
                                  before_value=F.col(f"{BEFORE_COL}.bv"))
        assert dropped.count() == 0  # default full-history mode drops it
        kept = {r["g"]: (r["n_rows"], r["sum_value"]) for r in
                incremental_agg(_chg(spark, rows), ["g"], F.col("v"),
                                before_value=F.col(f"{BEFORE_COL}.bv"),
                                emit_deltas=True).collect()}
        assert kept == {"a": (0, 5)}


class TestStreamingMaintenance:
    def test_batchwise_delta_merge_equals_full_recompute(self, spark):
        """The production loop: each micro-batch's deltas
        (emit_deltas=True) merge into a per-group state table; after any
        batch the state equals recomputing over all history. This is the
        no-per-key-state continuous aggregation the operator exists for."""
        import random

        from source_flink_cdc_3_5_0_spark.sources.base import SEQ_COL

        rng = random.Random(5)
        live = {}   # key -> (group, value)
        state = {}  # group -> [count, sum]
        history = []
        seq = 0

        def batch(n=12):
            nonlocal seq
            events = []
            for _ in range(n):
                k = rng.randrange(30)
                g = "g%d" % (k % 4)
                if k in live and rng.random() < 0.35:
                    _, old = live.pop(k)
                    events.append((g, old, None, "-D", seq))
                elif k in live:
                    _, old = live[k]
                    new = rng.randrange(100)
                    live[k] = (g, new)
                    events.append((g, new, old, "+U", seq))
                else:
                    v = rng.randrange(100)
                    live[k] = (g, v)
                    events.append((g, v, None, "+I", seq))
                seq += 1
            history.extend(events)
            return events

        for _ in range(5):
            events = batch()
            df = spark.createDataFrame(
                events, f"g string, v long, bv long, {OP_COL} string, "
                        f"{SEQ_COL} long")
            chg = df.withColumn(BEFORE_COL, F.when(
                F.col("bv").isNotNull(), F.struct(F.col("bv"))))
            deltas = incremental_agg(
                chg, ["g"], F.col("v"),
                before_value=F.col(f"{BEFORE_COL}.bv"),
                emit_deltas=True).collect()
            for r in deltas:  # the sink-side merge (state table upsert)
                c, s = state.get(r["g"], (0, 0))
                c, s = c + r["n_rows"], s + r["sum_value"]
                if c == 0 and s == 0:
                    state.pop(r["g"], None)
                else:
                    state[r["g"]] = (c, s)
            # ground truth from the live-rows model
            truth = {}
            for g, v in live.values():
                c, s = truth.get(g, (0, 0))
                truth[g] = (c + 1, s + v)
            assert {g: t for g, t in state.items() if t != (0, 0)} == truth


class TestIncrementalDistinct:
    def _run(self, spark, rows):
        from source_flink_cdc_3_5_0_spark.operators.retract import (
            incremental_distinct_count)
        df = spark.createDataFrame(rows, "g STRING, m BIGINT, __op STRING")
        return {r.g: r.n_distinct
                for r in incremental_distinct_count(df, ["g"], "m").collect()}

    def test_inserts_and_deletes(self, spark):
        got = self._run(spark, [
            ("a", 1, "+I"), ("a", 1, "+I"), ("a", 2, "+I"),
            ("a", 1, "-D"),                       # one copy of 1 remains
            ("b", 9, "+I"), ("b", 9, "-D"),       # b fully deleted
        ])
        assert got == {"a": 2}

    def test_member_move_via_update_pair(self, spark):
        got = self._run(spark, [
            ("a", 1, "+I"), ("a", 1, "-U"), ("a", 2, "+U"),
        ])
        assert got == {"a": 1}

    def test_mergeable_across_batches(self, spark):
        """Folding batch-level (group, member) nets equals processing the
        whole changelog at once — the property a streaming job relies on."""
        import pyspark.sql.functions as F

        from source_flink_cdc_3_5_0_spark.operators.retract import (
            incremental_distinct_count)
        b1 = [("a", 1, "+I"), ("a", 2, "+I"), ("b", 5, "+I")]
        b2 = [("a", 1, "-D"), ("a", 3, "+I"), ("b", 5, "-D")]
        whole = self._run(spark, b1 + b2)

        def nets(rows):
            df = spark.createDataFrame(rows, "g STRING, m BIGINT, __op STRING")
            d = F.when(F.col("__op").isin("+I", "+U"), 1).otherwise(-1)
            return df.groupBy("g", "m").agg(F.sum(d).alias("net"))

        folded = (nets(b1).unionByName(nets(b2))
                  .groupBy("g", "m").agg(F.sum("net").alias("net"))
                  .where(F.col("net") > 0)
                  .groupBy("g").agg(F.count(F.lit(1)).alias("n")))
        assert {r.g: r.n for r in folded.collect()} == whole

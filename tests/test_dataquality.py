"""Data-quality operators: column profiling, constraint validation, and
the char-trigram LM quality scorer (plan shapes + semantics)."""

import pyspark.sql.functions as F
import pytest

from source_flink_cdc_3_5_0_spark.extensions.dataquality import (
    accepted_values, foreign_key, in_range, not_null, profile_table, unique,
    validate_constraints)
from source_flink_cdc_3_5_0_spark.extensions.lm import (
    char_trigrams, lm_quality_score, train_trigram_model)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (3, "b", -4.0)],
        "id BIGINT, s STRING, x DOUBLE")


class TestProfile:
    def test_profile_values(self, spark, frame):
        rows = {r["col_name"]: r for r in profile_table(frame).collect()}
        assert set(rows) == {"id", "s", "x"}
        assert all(r["n_rows"] == 4 for r in rows.values())
        assert rows["id"]["n_null"] == 0 and rows["id"]["n_distinct"] == 3
        assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 3.0
        assert rows["id"]["min_str"] is None
        assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
        assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
        assert rows["s"]["min_num"] is None
        assert rows["x"]["n_null"] == 1 and rows["x"]["min_num"] == -4.0

    def test_no_expand_in_either_distinct_mode(self, spark, frame):
        """r11: exact mode computes one single-distinct aggregate per
        column (crossJoined onto the profile row) instead of the
        Expand-based multi-distinct rewrite — neither mode may carry an
        Expand, and exact mode must actually use per-column
        count(distinct) aggregates (approx uses HLL sketches)."""
        exact = profile_table(frame)._jdf.queryExecution().executedPlan().toString()
        approx = profile_table(frame, approx=True) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in exact
        assert "Expand" not in approx
        assert exact.count("count(distinct") >= 3, exact
        assert "approx_count_distinct" not in exact
        assert "approx_count_distinct" in approx

    def test_approx_mode_close_on_real_table(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = {r["col_name"]: r
                for r in profile_table(docs, ["doc_id", "lang"],
                                       approx=True).collect()}
        # HLL default rsd = 5%; doc_id is unique, lang has a handful
        assert abs(rows["doc_id"]["n_distinct"] - 500) <= 50
        assert rows["lang"]["n_distinct"] <= 10


class TestValidate:
    def test_all_kinds_fire(self, spark, frame):
        parent = spark.createDataFrame([(1,), (2,)], "pid BIGINT")
        out = {r["check"]: r for r in validate_constraints(frame, [
            unique("id_unique", "id"),
            not_null("s_not_null", "s"),
            accepted_values("s_accepted", "s", ["a"]),
            in_range("x_nonneg", "x", lo=0.0),
            foreign_key("id_fk", "id", parent, "pid"),
        ]).collect()}
        assert out["id_unique"]["violations"] == 1          # 3 appears twice
        assert out["s_not_null"]["violations"] == 1
        assert out["s_accepted"]["violations"] == 2         # two 'b' rows
        assert out["x_nonneg"]["violations"] == 1           # -4.0
        assert out["id_fk"]["violations"] == 2              # both id=3 rows
        assert not any(r["passed"] for r in out.values())

    def test_clean_table_passes(self, spark):
        clean = spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, s STRING")
        out = validate_constraints(clean, [
            unique("u", "id"), not_null("n", "s"),
            accepted_values("a", "s", ["a", "b"]),
        ]).collect()
        assert all(r["passed"] and r["violations"] == 0 for r in out)

    def test_row_rules_share_one_scan(self, spark, frame):
        """not_null + accepted + range compile to a single aggregate over
        one scan of the table — no per-rule passes."""
        plan = validate_constraints(frame, [
            not_null("a", "s"), accepted_values("b", "s", ["a"]),
            in_range("c", "x", lo=0.0),
        ])._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") == 1

    def test_null_fk_and_accepted_are_not_violations(self, spark, frame):
        parent = spark.createDataFrame([(9,)], "pid BIGINT")
        null_heavy = frame.withColumn("id", F.lit(None).cast("long"))
        out = {r["check"]: r for r in validate_constraints(null_heavy, [
            foreign_key("fk", "id", parent, "pid"),
            accepted_values("acc", "id", [9]),
        ]).collect()}
        assert out["fk"]["violations"] == 0
        assert out["acc"]["violations"] == 0


class TestLmQuality:
    def test_trigram_explosion(self, spark):
        df = spark.createDataFrame([(1, "abcd"), (2, "ab"), (3, None)],
                                   "doc_id BIGINT, text STRING")
        grams = {tuple(r) for r in char_trigrams(df).collect()}
        assert grams == {(1, "abc"), (1, "bcd")}

    def test_deterministic_continuation_scores_full(self, spark):
        # "ababab": every trigram's prefix continues one way -> p = 1e9
        df = spark.createDataFrame([(1, "ababab")], "doc_id BIGINT, text STRING")
        row = lm_quality_score(df).collect()[0]
        assert row["mean_p_scaled"] == 1_000_000_000.0
        assert row["n_trigrams"] == 4

    def test_oov_scores_zero_under_reference(self, spark):
        ref = spark.createDataFrame([(0, "ababab")], "doc_id BIGINT, text STRING")
        crawl = spark.createDataFrame([(1, "xyzxyz")], "doc_id BIGINT, text STRING")
        row = lm_quality_score(crawl, reference=ref).collect()[0]
        assert row["mean_p_scaled"] == 0.0

    def test_model_join_is_broadcast(self, spark):
        """The trigram vocabulary is charset-bounded (≤ |charset|³), so the
        model side broadcasts by default — no second shuffle of the gram
        stream; broadcast_model=False falls back to a shuffle join."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = lm_quality_score(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # The hint must hold even when Catalyst wouldn't volunteer a
        # broadcast; without it the fallback is a plain shuffle join.
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            hinted = lm_quality_score(docs)._jdf.queryExecution() \
                .executedPlan().toString()
            assert "BroadcastHashJoin" in hinted
            shuffled = lm_quality_score(docs, broadcast_model=False) \
                ._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in shuffled
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    def test_split_probabilities_sum_per_prefix(self, spark):
        # continuation MLE: per-prefix scaled probs sum to ~1e9 (floor loss)
        df = spark.createDataFrame([(1, "aab aac aab aad")],
                                   "doc_id BIGINT, text STRING")
        model = train_trigram_model(char_trigrams(df)).collect()
        per_prefix: dict = {}
        for r in model:
            per_prefix.setdefault(r["gram"][:2], []).append(r["p_scaled"])
        for probs in per_prefix.values():
            assert sum(probs) <= 1_000_000_000
            assert sum(probs) > 1_000_000_000 - len(probs)


class TestScd2History:
    def _hist(self, spark, rows):
        from source_flink_cdc_3_5_0_spark.operators.scd2 import (
            scd2_from_changelog)
        df = spark.createDataFrame(
            rows, "k BIGINT, v STRING, __op STRING, __seq BIGINT")
        return sorted((r.k, r.v, r.valid_from_seq, r.valid_to_seq, r.is_current)
                      for r in scd2_from_changelog(df, ["k"]).collect())

    def test_update_chain_and_delete(self, spark):
        got = self._hist(spark, [
            (1, "a", "+I", 10), (1, "b", "+U", 20), (1, "c", "+U", 30),
            (2, "x", "+I", 15), (2, None, "-D", 25),
        ])
        assert got == [
            (1, "a", 10, 20, False), (1, "b", 20, 30, False),
            (1, "c", 30, None, True),
            (2, "x", 15, 25, False),   # closed by the delete, no current row
        ]

    def test_reopen_after_delete(self, spark):
        got = self._hist(spark, [
            (1, "a", "+I", 1), (1, None, "-D", 2), (1, "b", "+I", 3),
        ])
        assert got == [(1, "a", 1, 2, False), (1, "b", 3, None, True)]

    def test_update_before_images_ignored(self, spark):
        got = self._hist(spark, [
            (1, "a", "+I", 1), (1, "a", "-U", 2), (1, "b", "+U", 2),
        ])
        # -U must not close or open anything; seq 2's +U closes seq 1
        assert got == [(1, "a", 1, 2, False), (1, "b", 2, None, True)]


class TestNormalizeText:
    def test_rules(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import normalize_text
        df = spark.createDataFrame(
            [(1, "  Café\t\tÑANDÚ  du  Lac\n"), (2, "plain"), (3, "")],
            "doc_id BIGINT, text STRING")
        got = {r.doc_id: r.normalized for r in normalize_text(df).collect()}
        assert got[1] == "cafe nandu du lac"
        assert got[2] == "plain"
        assert got[3] == ""

    def test_idempotent(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import normalize_text
        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .select("doc_id", "text"))
        once = normalize_text(docs).select(
            "doc_id", F.col("normalized").alias("text"))
        twice = normalize_text(once)
        assert twice.where(F.col("text") != F.col("normalized")).count() == 0


class TestNormalizeFuzz:
    """Cross-engine fuzz: the normalize generator must produce identical
    bytes in Spark and DuckDB for arbitrary text (the property the
    text_normalize oracle relies on), and be idempotent."""

    def test_fuzz_matches_duckdb(self, spark):
        import duckdb
        from hypothesis import given, settings, strategies as st

        from source_flink_cdc_3_5_0_spark.extensions.text import normalize_sql

        alphabet = ("aZ09 \t\n\r.,!?-_" "àáâãäåèéêëìíîïòóôõöùúûüýñç"
                    "ÀÉÎÕÜÑÇ" "中хш")

        @settings(max_examples=12, deadline=None)
        @given(st.text(alphabet=alphabet, max_size=40))
        def check(text):
            srow = (spark.createDataFrame([(text,)], "text string")
                    .selectExpr(normalize_sql("spark", "text") + " AS n")
                    .collect())[0]["n"]
            drow = duckdb.execute(
                f"SELECT {normalize_sql('duckdb', 't')} FROM (SELECT ?::VARCHAR AS t)",
                [text]).fetchone()[0]
            assert srow == drow, repr(text)

        check()

    def test_fuzz_idempotent(self, spark):
        from hypothesis import given, settings, strategies as st

        from source_flink_cdc_3_5_0_spark.extensions.text import normalize_sql

        @settings(max_examples=10, deadline=None)
        @given(st.text(alphabet="aZ09 \t\nàÉñ ç.", max_size=40))
        def check(text):
            df = spark.createDataFrame([(text,)], "text string")
            once = df.selectExpr(normalize_sql("spark", "text") + " AS text")
            twice = once.selectExpr(normalize_sql("spark", "text") + " AS n",
                                    "text")
            r = twice.collect()[0]
            assert r["n"] == r["text"]

        check()


class TestBlocklistAndParagraphs:
    def test_blocklist_word_boundaries(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import blocklist_filter
        df = spark.createDataFrame(
            [(1, "please Click Here now"), (2, "clickhere is one word"),
             (3, "totally clean text"), (4, "LOREM IPSUM and click here")],
            "doc_id BIGINT, text STRING")
        got = {r.doc_id: (r.n_blocked_terms, r.keep)
               for r in blocklist_filter(
                   df, ["lorem ipsum", "click here"]).collect()}
        assert got[1] == (1, False)
        assert got[2] == (0, True)       # no word-boundary match
        assert got[3] == (0, True)
        assert got[4] == (2, False)

    def test_paragraph_dedup_order_preserved(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import dedup_paragraphs
        df = spark.createDataFrame(
            [(1, "head\n\nbody\n\nhead\n\n \n\nbody\n\ntail")],
            "doc_id BIGINT, text STRING")
        r = dedup_paragraphs(df).collect()[0]
        assert r.deduped == "head\n\nbody\n\ntail"
        assert r.n_paras == 5 and r.n_unique == 3

    def test_paragraph_dedup_trim_equality(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import dedup_paragraphs
        df = spark.createDataFrame([(1, "a \n\na\n\nb")],
                                   "doc_id BIGINT, text STRING")
        r = dedup_paragraphs(df).collect()[0]
        # first occurrence keeps its ORIGINAL (untrimmed) form
        assert r.deduped == "a \n\nb"
        assert r.n_unique == 2

    def test_paragraph_dedup_no_python_no_shuffle(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.text import dedup_paragraphs
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = dedup_paragraphs(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in p and "MapInPandas" not in p \
            and "BatchEvalPython" not in p, p


class TestSchemaDrift:
    def test_statuses(self, spark):
        from source_flink_cdc_3_5_0_spark.extensions.dataquality import (
            profile_table, schema_drift)
        old_df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "d", 4.0)],
            "id BIGINT, s STRING, x DOUBLE")
        new_df = spark.createDataFrame(
            [(1, None, "p"), (2, None, "q"), (3, None, "r"), (4, "d", "s")],
            "id BIGINT, s STRING, y STRING")
        out = {r.col_name: r for r in schema_drift(
            profile_table(old_df), profile_table(new_df)).collect()}
        assert out["id"].status == "ok" and out["id"].null_rate_delta == 0.0
        assert out["s"].status == "null_rate_jump"      # 25% -> 75%
        assert out["s"].null_rate_delta == 0.5
        assert out["x"].status == "removed"
        assert out["y"].status == "added"
        assert out["x"].null_rate_delta is None


def test_profile_skip_distinct_has_no_expand(spark):
    from source_flink_cdc_3_5_0_spark.extensions.dataquality import profile_table
    li = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    p = profile_table(li, ["o_orderkey", "o_custkey"],
                      include_distinct=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in p, p
    rows = profile_table(li, ["o_orderkey"], include_distinct=False).collect()
    assert rows[0].n_distinct is None

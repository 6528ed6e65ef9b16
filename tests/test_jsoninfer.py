"""JSON schema inference (extensions/jsoninfer)."""

from source_flink_cdc_3_5_0_spark.extensions.jsoninfer import (
    CORRUPT_KEY, MALFORMED, infer_json_schema, json_type_observations)


def _docs(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "props STRING")


class TestObservations:
    def test_type_tokens(self, spark):
        df = _docs(spark, [
            '{"a": 1, "b": 1.5, "c": "s", "d": true, "e": null, '
            '"f": [1], "g": {"x": 1}}'])
        obs = {(r.key, r.jtype) for r in json_type_observations(df).collect()}
        assert obs == {("a", "BIGINT"), ("b", "DOUBLE"), ("c", "VARCHAR"),
                       ("d", "BOOLEAN"), ("e", "NULL"), ("f", "ARRAY"),
                       ("g", "OBJECT")}

    def test_malformed_and_non_object_and_null(self, spark):
        df = _docs(spark, ["{broken", "[1, 2]", '"just a string"', None])
        obs = [(r.key, r.jtype) for r in json_type_observations(df).collect()]
        # NULL input emits nothing; the other three are corrupt markers
        assert obs == [(CORRUPT_KEY, MALFORMED)] * 3


class TestInference:
    def test_widening_rules(self, spark):
        df = _docs(spark, [
            '{"i": 1, "m": 1, "s": "x", "n": null}',
            '{"i": 2, "m": 2.5, "s": 3, "n": null}',
        ])
        got = {(r.key, r.jtype): (r.n, r.inferred)
               for r in infer_json_schema(df).collect()}
        assert got[("i", "BIGINT")] == (2, "BIGINT")      # stable type
        assert got[("m", "BIGINT")][1] == "DOUBLE"        # int+double widen
        assert got[("m", "DOUBLE")][1] == "DOUBLE"
        assert got[("s", "VARCHAR")][1] == "VARCHAR"      # mixed -> varchar
        assert got[("s", "BIGINT")][1] == "VARCHAR"
        assert got[("n", "NULL")] == (2, "NULL")          # null-only stays

    def test_null_plus_type_ignores_null(self, spark):
        df = _docs(spark, ['{"k": null}', '{"k": 7}'])
        got = {(r.key, r.jtype): r.inferred
               for r in infer_json_schema(df).collect()}
        assert got[("k", "NULL")] == "BIGINT"
        assert got[("k", "BIGINT")] == "BIGINT"

    def test_counts_are_mergeable(self, spark):
        """Counts over a union equal the sum of per-part counts — the
        property that lets the histogram aggregate across files/days."""
        a = _docs(spark, ['{"k": 1}'] * 3)
        b = _docs(spark, ['{"k": "s"}'] * 2)
        whole = {(r.key, r.jtype): r.n
                 for r in infer_json_schema(a.unionAll(b)).collect()}
        pa = {(r.key, r.jtype): r.n for r in infer_json_schema(a).collect()}
        pb = {(r.key, r.jtype): r.n for r in infer_json_schema(b).collect()}
        for k in whole:
            assert whole[k] == pa.get(k, 0) + pb.get(k, 0)


class TestStreamingMergeability:
    def test_incremental_histogram_equals_batch(self, spark, tmp_path):
        """The type histogram maintained incrementally over micro-batches
        (foreachBatch, one file per trigger) must equal the one-shot batch
        histogram — the mergeability property in its streaming role:
        schema inference over an unbounded JSONL feed never re-reads old
        data."""
        import pyspark.sql.functions as F

        from source_flink_cdc_3_5_0_spark.extensions.jsoninfer import (
            infer_json_schema, json_type_observations)

        src = tmp_path / "feed"
        docs = [
            ['{"a": 1}', '{"a": 1.5, "b": "x"}'],
            ['{"a": null, "c": [1]}', "broken{"],
            ['{"b": true, "c": {"x": 1}}'],
        ]
        for i, chunk in enumerate(docs):
            (spark.createDataFrame([(d,) for d in chunk], "props STRING")
             .coalesce(1).write.mode("append").parquet(str(src)))

        acc: dict = {}

        def sink(batch_df, batch_id):
            for r in (json_type_observations(batch_df)
                      .groupBy("key", "jtype")
                      .agg(F.count(F.lit(1)).alias("n")).collect()):
                acc[(r.key, r.jtype)] = acc.get((r.key, r.jtype), 0) + r.n

        stream = (spark.readStream.schema("props STRING")
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        whole = {(r.key, r.jtype): r.n
                 for r in infer_json_schema(
                     spark.read.parquet(str(src))).collect()}
        assert acc == whole
        assert sum(acc.values()) > 0

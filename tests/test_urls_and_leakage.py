"""URL canonicalization (extensions/urls) and cross-split leakage
detection (extensions/decontam.cross_split_leakage)."""

import duckdb
import pyspark.sql.functions as F

from source_flink_cdc_3_5_0_spark.extensions.decontam import (
    cross_split_leakage)
from source_flink_cdc_3_5_0_spark.extensions.urls import (
    canonical_url_sql, canonicalize_urls, dedup_by_canonical_url)


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id BIGINT, url STRING")
    return [r.canonical_url for r in
            canonicalize_urls(df).orderBy("doc_id").collect()]


class TestCanonicalUrl:
    def test_rules(self, spark):
        got = _canon(spark, [
            "HTTP://Ex.COM/a",                 # scheme+host lowercase
            "http://ex.com:80/a",              # default port stripped
            "https://ex.com:443/a",            # https default port stripped
            "http://ex.com:8080/a",            # non-default port kept
            "http://ex.com/a#frag",            # fragment dropped
            "http://ex.com/a/",                # trailing slash stripped
            "http://ex.com/",                  # root path -> empty
            "http://ex.com/a?utm_source=x",    # all-utm query dropped
            "http://ex.com/a?b=1&utm_x=2&c=3", # utm params filtered, order kept
            "http://ex.com/A",                 # path case SIGNIFICANT
            "not a url",                       # unparseable -> NULL
        ])
        assert got[0] == "http://ex.com/a"
        assert got[1] == "http://ex.com/a"
        assert got[2] == "https://ex.com/a"
        assert got[3] == "http://ex.com:8080/a"
        assert got[4] == "http://ex.com/a"
        assert got[5] == "http://ex.com/a"
        assert got[6] == "http://ex.com"
        assert got[7] == "http://ex.com/a"
        assert got[8] == "http://ex.com/a?b=1&c=3"
        assert got[9] == "http://ex.com/A"
        assert got[10] is None

    def test_dialects_agree(self, spark):
        urls = ["HTTP://A.B:80/x/?utm_a=1&q=2#f", "https://C.d:443/",
                "http://h:9/p?utm_x=1", "junk", "ftp://files.example/x/y/"]
        sgot = _canon(spark, urls)
        dgot = [duckdb.execute(
            f"SELECT {canonical_url_sql('duckdb', 'u')} FROM (SELECT ?::VARCHAR AS u)",
            [u]).fetchone()[0] for u in urls]
        assert sgot == dgot

    def test_dedup_groups(self, spark):
        df = spark.createDataFrame(
            [(1, "http://ex.com/a"), (2, "HTTP://EX.com:80/a/"),
             (3, "http://ex.com/b"), (4, "bad url")],
            "doc_id BIGINT, url STRING")
        got = {r.doc_id: r for r in dedup_by_canonical_url(df).collect()}
        assert got[1].group_size == 2 and got[1].is_keeper
        assert got[2].group_size == 2 and not got[2].is_keeper
        assert got[3].group_size == 1 and got[3].is_keeper
        assert got[4].group_size == 0 and not got[4].is_keeper
        assert got[4].canonical_url is None


class TestCrossSplitLeakage:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, split STRING")
        out = cross_split_leakage(df, "split", **kw)
        got = sorted((r.test_id, r.train_id, r.jaccard) for r in out.collect())
        out.gram_base.unpersist()
        return got

    def test_cross_pair_found_intra_pair_not(self, spark):
        text = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, text, "train"),
            (2, text + " tail", "test"),      # cross-split near-copy -> caught
            (3, text + " end", "train"),      # intra-train near-copy -> NOT reported
            (4, "completely different words entirely unrelated content here",
             "test"),
        ]
        got = self._run(spark, rows, jaccard_threshold=0.5)
        assert [(t, tr) for t, tr, _ in got] == [(2, 1), (2, 3)]
        assert all(j >= 0.5 for _, _, j in got)

    def test_no_leakage_clean_splits(self, spark):
        rows = [(1, "alpha beta gamma delta epsilon zeta", "train"),
                (2, "one two three four five six seven", "test")]
        assert self._run(spark, rows) == []


class TestUrlReviewRegressions:
    def test_utm_underscore_not_a_wildcard(self, spark):
        """LIKE's '_' wildcard must not eat legitimate params that merely
        start with 'utm' + one char (e.g. 'utmost')."""
        got = _canon(spark, ["http://x.com/a?utmost=5",
                             "http://x.com/a?utmost=6",
                             "http://x.com/a?utm_term=z"])
        assert got[0] == "http://x.com/a?utmost=5"
        assert got[1] == "http://x.com/a?utmost=6"
        assert got[0] != got[1]            # distinct resources stay distinct
        assert got[2] == "http://x.com/a"  # real utm_ param still dropped
        # dialects agree on the fix
        import duckdb

        from source_flink_cdc_3_5_0_spark.extensions.urls import (
            canonical_url_sql)
        for u in ["http://x.com/a?utmost=5", "http://x.com/a?utm_term=z"]:
            d = duckdb.execute(
                f"SELECT {canonical_url_sql('duckdb', 'u')} "
                f"FROM (SELECT ?::VARCHAR AS u)", [u]).fetchone()[0]
            s = _canon(spark, [u])[0]
            assert s == d

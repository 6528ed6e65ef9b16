"""Repeatable adversarial-scaling experiment (round-4 verdict item 8).

Replicates documents/embeddings REPLICAS× with offset ids — each text
replica suffixed " r<n>" so replicas are NEAR-duplicates, each embedding
replica an IDENTICAL vector — deliberately adversarial for the near-dup
family, whose true output pair set then grows ~(R²/2)/1 per original
near-pair (every near-pair becomes an R×R family plus the R-choose-2
self-copies).  A near-dup operator whose runtime tracks OUTPUT growth is
bucket-bounded; one whose runtime tracks the R² PAIR SPACE has an
all-pairs path and fails the claim this script exists to regenerate
(PERFORMANCE.md "Measured scaling" table).

Usage:  python bench_scale.py            # 1x vs 10x at $SPARK_GRAFT_SF_DIR
Output: one JSON line per op {"op","t_base","t_scaled","ratio"} then a
final summary line {"metric":"bench_scale", ...} — small enough for any
tail capture.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))

# Hash-shuffle ops (expected ratio ≲ data ratio) + near-dup family
# (expected ratio tracks output growth, NOT R² pair space).
SCALE_QUERIES = [
    "dedup_exact",
    "sample_hash_split",
    "doc_length_percentiles",
    "text_normalize",
    "text_token_stats",
    "text_tfidf_top_terms",
    "dedup_lines",
    "ann_cosine_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_srp_neardup",
]

# id offset must clear every real doc_id/vec_id at any supported SF
ID_OFFSET = 100_000_000


def build_scaled_dir(base: str, replicas: int) -> str:
    """Materialize a synthetic SF dir: every table symlinked except
    documents/embeddings, which are replicated with offset ids (DuckDB —
    one-time setup, excluded from timings)."""
    import duckdb

    out = tempfile.mkdtemp(prefix="bench_scale_")
    for fname in os.listdir(base):
        if fname not in ("documents.parquet", "embeddings.parquet"):
            os.symlink(os.path.join(base, fname), os.path.join(out, fname))
    con = duckdb.connect()
    # one FILE per replica (directory dataset): a single merged parquet
    # would be one Spark scan split (files this small never cross
    # maxPartitionBytes), serializing every zero-shuffle stage and
    # measuring single-task starvation instead of operator scaling — a
    # real 10x corpus lives in many files, so the scaled fixture should
    # too (the base fixture keeps the driver's own single-file layout)
    os.makedirs(os.path.join(out, "documents.parquet"))
    os.makedirs(os.path.join(out, "embeddings.parquet"))
    for r in range(replicas):
        suffix = "" if r == 0 else f" r{r}"
        con.execute(f"""
            COPY (SELECT doc_id + {r * ID_OFFSET} AS doc_id,
                         text || '{suffix}' AS text, lang, source, n_chars
                  FROM read_parquet('{base}/documents.parquet'))
            TO '{out}/documents.parquet/part-{r:03d}.parquet'
            (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (SELECT vec_id + {r * ID_OFFSET} AS vec_id, embedding,
                         label
                  FROM read_parquet('{base}/embeddings.parquet'))
            TO '{out}/embeddings.parquet/part-{r:03d}.parquet'
            (FORMAT PARQUET)""")
    con.close()
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cdc-engine-bench-scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from source_flink_cdc_3_5_0_spark import entry_queries as EQ

    scaled = build_scaled_dir(SF_DIR, REPLICAS)
    # warm JVM + Python worker pool (same rationale as bench.py)
    EQ.load(spark, SF_DIR, "documents").count()

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            EQ.QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        return round(best, 3)

    rows = []
    for name in SCALE_QUERIES:
        t1 = timed(name, SF_DIR)
        tn = timed(name, scaled)
        row = {"op": name, "t_base": t1, "t_scaled": tn,
               "ratio": round(tn / t1, 2) if t1 else None}
        rows.append(row)
        print(json.dumps(row))

    print(json.dumps({
        "metric": "bench_scale",
        "replicas": REPLICAS,
        "sf_dir": SF_DIR,
        "max_ratio": max(r["ratio"] for r in rows),
        "ops": len(rows),
    }))
    shutil.rmtree(scaled, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

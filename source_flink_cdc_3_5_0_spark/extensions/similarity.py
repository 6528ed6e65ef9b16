"""Similarity search over embedding columns.

- brute-force cosine top-k: the exactness baseline; one broadcast join of the
  (small) query set against all candidates — no all-pairs shuffle, scales as
  O(n·q/executors) at 100 TB.
- IVF-style bucketed ANN: the scale path — coarse quantization by nearest of
  K centroid buckets (trained deterministically from a sample), candidates
  searched only within the query's ``nprobe`` nearest buckets. The bucket
  join replaces the cross join, cutting compute by ~K/nprobe.

All dot products run as built-in higher-order functions (``aggregate`` /
``zip_with``/``transform``) — JVM codegen, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk_bruteforce(candidates: DataFrame, queries: DataFrame, k: int = 5,
                           vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).

    ``queries`` is expected to be small → broadcast join; ranking is
    deterministic: (cosine rounded to 6 dp desc, neighbor id asc).
    """
    cand = candidates.select(F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cv"))
    qry = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    joined = cand.crossJoin(F.broadcast(qry)).where(F.col("cand_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def train_centroids(df: DataFrame, vec_col: str = "embedding", n_centroids: int = 16,
                    sample: int = 2048, iters: int = 5) -> list[list[float]]:
    """Deterministic k-means (fixed seed, fixed sample) on the driver; the
    centroid table is tiny and broadcast to executors. At 100 TB the sample
    read is a pushed-down ``LIMIT`` over one column."""
    rows = df.select(vec_col).limit(sample).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(42)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = X[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return [[float(v) for v in c] for c in cent]


def ivf_topk(candidates: DataFrame, queries: DataFrame, centroids: list[list[float]],
             k: int = 5, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF-bucketed approximate top-k: candidates pre-assigned to their
    nearest centroid; each query searches its ``nprobe`` nearest buckets."""
    spark = candidates.sparkSession
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "bucket INT, centroid ARRAY<DOUBLE>")

    def bucket_assign(df: DataFrame, vec: str, n: int, out: str) -> DataFrame:
        joined = df.crossJoin(F.broadcast(cent_df))
        dist = F.aggregate(
            F.zip_with(F.col(vec), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        w = Window.partitionBy(*df.columns).orderBy(dist.asc(), F.col("bucket").asc())
        return (joined.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= n).drop("__rk", "centroid")
                .withColumnRenamed("bucket", out))

    cand = bucket_assign(
        candidates.select(F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cv")),
        "cv", 1, "bucket")
    qry = bucket_assign(
        queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")),
        "qv", nprobe, "bucket")
    joined = cand.join(F.broadcast(qry), on="bucket").where(F.col("cand_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )

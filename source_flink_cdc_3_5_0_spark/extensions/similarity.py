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


def nearest_buckets(vec, centroids: list[list[float]], n: int):
    """Column of the ``n`` nearest centroid bucket ids for a vector column.

    Pure per-row projection: the centroid table rides along as an array
    literal (tiny — K·dim doubles, the same payload a broadcast would ship),
    distances evaluate as codegen'd higher-order functions, and the argmin is
    ``array_sort`` over (dist, bucket) structs. Zero joins, zero windows,
    zero shuffles — the round-1 version windowed over the FULL ROW (vector
    included) to pick argmin, shuffling every vector as a window key."""
    cent_arr = F.array(*[
        F.struct(
            F.lit(int(i)).alias("bucket"),
            F.array(*[F.lit(float(v)) for v in c]).alias("centroid"),
        )
        for i, c in enumerate(centroids)
    ])
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(vec, c["centroid"], lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x).alias("d"),
            c["bucket"].alias("bucket"),
        ),
    )
    # array_sort on struct<d,bucket> orders by dist asc then bucket asc —
    # the deterministic tie-break
    return F.transform(F.slice(F.array_sort(scored), 1, n), lambda s: s["bucket"])


def ivf_topk(candidates: DataFrame, queries: DataFrame, centroids: list[list[float]],
             k: int = 5, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF-bucketed approximate top-k: candidates pre-assigned to their
    nearest centroid; each query searches its ``nprobe`` nearest buckets."""
    cand = candidates.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn(
        "bucket", F.element_at(nearest_buckets(F.col("cv"), centroids, 1), 1))
    qry = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn(
        "bucket", F.explode(nearest_buckets(F.col("qv"), centroids, nprobe)))
    joined = cand.join(F.broadcast(qry), on="bucket").where(F.col("cand_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )

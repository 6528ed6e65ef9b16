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


def quantize_scalar(df: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", levels: int = 256) -> DataFrame:
    """Per-dimension scalar quantization (the memory-side ANN scale lever:
    float32 -> uint8 shrinks vector storage 4x; IVF+SQ is the standard
    billion-vector recipe). Two passes:

    1. per-dimension corpus min/max — one posexplode + partial-agg groupBy,
       collected to the driver (BOUNDED control plane: n_dims rows, never
       corpus rows) and re-broadcast as literal arrays;
    2. one codegen projection: code_d = clamp(floor((v - min_d) * levels /
       (max_d - min_d))) in [0, levels-1]; floor (not round) keeps the
       arithmetic bit-identical across engines. Constant dimensions code
       to 0.

    Emits (id, codes array<int>, mae double) where mae = mean |v - dequant|
    with dequant = min_d + (code + 0.5) * range_d / levels."""
    stats = (df.select(F.posexplode(_as_double(F.col(vec_col)))
                       .alias("pos", "v"))
             .groupBy("pos")
             .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
             .collect())
    mn = [0.0] * len(stats)
    mx = [0.0] * len(stats)
    for r in stats:
        mn[r["pos"]], mx[r["pos"]] = r["mn"], r["mx"]
    mn_arr = F.array(*[F.lit(float(v)) for v in mn])
    mx_arr = F.array(*[F.lit(float(v)) for v in mx])
    L = float(levels)

    def feat(x, i):
        lo = F.element_at(mn_arr, i + 1)
        hi = F.element_at(mx_arr, i + 1)
        rng = hi - lo
        code = F.when(rng > 0.0, F.least(
            F.lit(int(levels - 1)),
            F.greatest(F.lit(0),
                       F.floor((x - lo) * F.lit(L) / rng).cast("int"))
        )).otherwise(F.lit(0))
        deq = lo + (code.cast("double") + F.lit(0.5)) * rng / F.lit(L)
        return F.struct(code.alias("code"), F.abs(x - deq).alias("err"))

    # one interpreted-lambda pass producing (code, err) pairs; the pair
    # struct is materialized as a real column so the two extractions below
    # don't re-run the arithmetic (no codegen CSE inside lambdas)
    base = df.select(
        F.col(id_col),
        F.transform(_as_double(F.col(vec_col)), feat).alias("__f"))
    return base.select(
        id_col,
        F.transform("__f", lambda f: f["code"]).alias("codes"),
        F.round(F.aggregate("__f", F.lit(0.0), lambda a, f: a + f["err"])
                / F.size("__f"), 6).alias("mae"),
    )

"""Contiguous global row numbering without a single-reducer sort.

The naive Spark formulation — ``row_number().over(Window.orderBy(...))`` —
collapses the whole dataset into ONE partition (Spark even logs a
performance warning), which is a non-starter at 100 TB. The scale-correct
pattern, used here, is the classic two-phase ``zipWithIndex`` shape
re-expressed over DataFrames:

1. ``repartitionByRange`` on the order key (one range shuffle; partition
   *i*'s keys all sort before partition *i+1*'s) + ``sortWithinPartitions``
   — the global order is now the concatenation of locally-sorted
   partitions.
2. A tiny per-partition count aggregate (``num_partitions`` rows) is
   collected and turned into cumulative offsets. This is a SEPARATE
   action, so the source is scanned and range-shuffled twice per call —
   exactly the contract of ``RDD.zipWithIndex`` (its internal count job
   does the same); caching 100 TB to avoid the second pass would cost
   more than the pass. Callers who already have the input materialized
   (a parquet table) pay two cheap scans; callers with an expensive
   upstream plan should persist it themselves first.
3. A no-shuffle Arrow ``mapInPandas`` pass assigns LOCAL row numbers — the
   iterator covers a whole physical partition, so a running counter across
   batches numbers it 0..n-1 — and adds the partition's offset:
   ``global_id = offset[partition] + local_id``.

Output ids are invariant to the partition boundaries the range sampler
picks: ids derive only from the total order, which any boundary choice
preserves when the order key is unique. Because the two actions evaluate
the input independently, the input must be DETERMINISTIC (no rand()
columns, no unseeded sampling, no source mutated between the jobs) —
again the same requirement ``RDD.zipWithIndex`` has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PID = "__gri_pid"


def global_row_ids(df: DataFrame, order_cols: list[str],
                   id_name: str = "global_id",
                   num_partitions: int | None = None) -> DataFrame:
    """Add a dense 0-based ``id_name`` column following ``order_cols``.

    ``order_cols`` must be a total order (include a unique tiebreaker) —
    equal keys across a partition boundary would otherwise make the
    assignment depend on the sampled ranges.
    """
    import pandas as pd

    n_out = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(n_out, *[F.col(c) for c in order_cols])
              .sortWithinPartitions(*order_cols)
              .withColumn(_PID, F.spark_partition_id()))

    # control-plane job: n_out rows, reuses the exchange's shuffle files
    counts = {r[_PID]: r["cnt"] for r in
              ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt"))
              .collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in ranged.schema.fields
                       if f.name != _PID)
    out_schema = f"{fields}, {id_name} bigint"

    def number_partition(batches):
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            base = offsets.get(int(pdf[_PID].iloc[0]), 0) if len(pdf) else 0
            pdf[id_name] = pd.RangeIndex(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf.drop(columns=[_PID])

    return ranged.mapInPandas(number_partition, schema=out_schema)

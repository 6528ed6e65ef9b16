"""Snapshot-isolated lake sink — Paimon/Iceberg-style manifests.

Parity target: the reference's table-format sinks
(flink-cdc-pipeline-connector-{paimon,iceberg}): every commit produces an
immutable SNAPSHOT — a manifest listing the table's live data files —
readers pin one manifest (snapshot isolation: a concurrent commit never
changes what a running query sees), old snapshots stay readable (time
travel) until ``vacuum`` reclaims unreferenced files, and ``compact``
rewrites small files without changing visible data.

Physical layout (all JSON control files are tiny — O(buckets) entries):

    <root>/<tableId>/data/__bucket=N/part-*.parquet   append-only files
    <root>/<tableId>/_snapshots/<seq>.json            one manifest/commit
    <root>/<tableId>/_schema.json                     evolved schema sidecar
    <root>/<tableId>/_batch_<id>                      replay markers

Write path (copy-on-write at bucket granularity, like the default
:class:`.parquet_sink.ParquetUpsertSink` — but REPLACED buckets' old files
are kept on disk and only dropped from the manifest, which is what buys
time travel at the cost of needing ``vacuum``): reduce the batch to one
final image per key, read ONLY the touched buckets' files from the
current manifest, anti-join + union, append the merged buckets as new
files, commit a manifest carrying forward untouched buckets.  TRUNCATE
commits an empty manifest (history stays readable); DROP removes the
table directory.  The driver-side file bookkeeping is one directory
listing per touched bucket per commit — the same control-plane shape as
Delta/Paimon commit protocols.

MERGE-ON-READ mode (``mode="mor"`` — Paimon changelog tables / Iceberg v2
row-level deletes, the mode the reference's streaming CDC ingestion
actually runs): a commit APPENDS delta files carrying the batch's final
images (row kind + commit sequence) and touches nothing else — commit
cost is O(batch) regardless of table size, where copy-on-write rewrites
every touched bucket (a scattered-key CDC stream at 100 TB touches every
bucket every batch, i.e. rewrites the table continuously).  Readers merge
base + deltas per key (latest commit sequence wins, delete kinds drop the
key) — one window shuffle, bucket-aligned; ``compact`` folds the deltas
into new base files and commits a delta-free snapshot, after which reads
are pure scans again.  Same manifests, time travel, vacuum and replay
markers as copy-on-write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..common.events import (DropTableEvent, OP_COL, SchemaChangeEvent,
                             TruncateTableEvent)
from ..common.schema import Schema
from ..common.tableid import TableId
from ..operators.partitioning import portable_bucket_expr
from ..sources.base import SEQ_COL
from .base import DataSink, MetadataApplier

_BUCKET_COL = "__bucket"
_COMMIT_SEQ = "__commit_seq"


class _LakeMetadataApplier(MetadataApplier):
    """Schema changes update the sidecar (schema-on-read — existing files
    stay valid, readers null-fill); TRUNCATE commits an empty snapshot
    (old snapshots remain time-travelable); DROP removes the table."""

    def __init__(self, sink: "SnapshotLakeSink"):
        self.sink = sink

    def apply_schema_change(self, table_id: TableId, event: SchemaChangeEvent,
                            evolved_schema: Schema) -> None:
        import shutil

        if isinstance(event, DropTableEvent):
            shutil.rmtree(self.sink._table_dir(table_id), ignore_errors=True)
            return
        if isinstance(event, TruncateTableEvent):
            self.sink._commit(table_id, {})
            return
        path = self.sink._schema_path(table_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(evolved_schema.to_json())


class SnapshotLakeSink(DataSink):
    def __init__(self, root: str, num_buckets: int = 16, mode: str = "cow"):
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be cow|mor, got {mode!r}")
        self.root = root
        self.num_buckets = num_buckets
        self.mode = mode

    # -- layout ------------------------------------------------------------
    def _table_dir(self, tid: TableId) -> str:
        return os.path.join(self.root, tid.identifier())

    def _data_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "data")

    def _schema_path(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_schema.json")

    def _snap_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_snapshots")

    def _delta_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "delta")

    def metadata_applier(self) -> MetadataApplier:
        return _LakeMetadataApplier(self)

    # -- manifests ---------------------------------------------------------
    def snapshots(self, tid: TableId) -> list[int]:
        d = self._snap_dir(tid)
        if not os.path.isdir(d):
            return []
        return sorted(int(f[:-5]) for f in os.listdir(d)
                      if f.endswith(".json"))

    def _manifest(self, tid: TableId, seq: int | None = None) -> dict:
        seqs = self.snapshots(tid)
        if not seqs:
            return {"seq": -1, "buckets": {}}
        seq = seqs[-1] if seq is None else seq
        if seq not in seqs:
            raise ValueError(f"unknown snapshot {seq}; have {seqs}")
        with open(os.path.join(self._snap_dir(tid), f"{seq}.json")) as f:
            return json.load(f)

    def _commit(self, tid: TableId, buckets: dict[str, list[str]],
                batch_id=None, deltas: dict[str, list[str]] | None = None) -> int:
        snap_dir = self._snap_dir(tid)
        os.makedirs(snap_dir, exist_ok=True)
        seq = (self.snapshots(tid) or [-1])[-1] + 1
        tmp = os.path.join(snap_dir, f"{seq}.json.tmp")
        doc = {"seq": seq, "batch_id": None if batch_id is None
               else str(batch_id), "buckets": buckets}
        if deltas:
            doc["deltas"] = deltas
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.rename(tmp, os.path.join(snap_dir, f"{seq}.json"))
        return seq

    def _bucket_files(self, tid: TableId, bucket: int) -> set[str]:
        """Relative paths of the parquet files currently ON DISK for a
        bucket (manifest bookkeeping diffs this before/after a write)."""
        d = os.path.join(self._data_dir(tid), f"{_BUCKET_COL}={bucket}")
        if not os.path.isdir(d):
            return set()
        return {f"{_BUCKET_COL}={bucket}/{f}" for f in os.listdir(d)
                if f.endswith(".parquet")}

    def _delta_files_on_disk(self, tid: TableId, bucket: int) -> set[str]:
        d = os.path.join(self._delta_dir(tid), f"{_BUCKET_COL}={bucket}")
        if not os.path.isdir(d):
            return set()
        return {f"{_BUCKET_COL}={bucket}/{f}" for f in os.listdir(d)
                if f.endswith(".parquet")}

    def _pks(self, tid: TableId) -> list[str]:
        with open(self._schema_path(tid)) as f:
            return Schema.from_json(f.read()).primary_keys

    # -- write path --------------------------------------------------------
    def _bucket_of(self, df: DataFrame, pks: list[str]):
        integral = ("tinyint", "smallint", "int", "bigint")
        if len(pks) == 1 and dict(df.dtypes).get(pks[0]) in integral:
            key = F.coalesce(F.col(pks[0]).cast("bigint"), F.lit(0))
        else:
            key = F.abs(F.hash(*pks).cast("bigint"))
        return portable_bucket_expr(key, self.num_buckets)

    def write(self, table_id: TableId, df: DataFrame, schema: Schema,
              batch_id) -> None:
        from ..streaming.materialize import latest_image

        tdir = self._table_dir(table_id)
        marker = os.path.join(tdir, f"_batch_{batch_id}")
        if os.path.exists(marker):
            return  # replayed batch
        os.makedirs(tdir, exist_ok=True)
        spark = df.sparkSession
        pks = [k for k in schema.primary_keys if k in df.columns]
        names = [c.name for c in schema.columns if c.name in df.columns]
        if not pks:
            raise ValueError(
                f"snapshot lake sink requires primary keys for {table_id}")
        if OP_COL in df.columns:
            final = latest_image(
                df, pks, seq_col=SEQ_COL if SEQ_COL in df.columns else None,
                keep_delete_marker=True)
        else:
            final = df.withColumn(OP_COL, F.lit("+I"))
        # persist: the touched-bucket collect and the file write are two
        # actions — unpersisted, a nondeterministic batch could write a
        # bucket the manifest never records (and vacuum would delete)
        final = (final.withColumn(_BUCKET_COL, self._bucket_of(final, pks))
                 .persist())
        if self.mode == "mor":
            try:
                self._write_mor_commit(table_id, final, names, pks, batch_id)
            finally:
                final.unpersist()
            with open(marker, "w") as f:
                f.write("ok")
            return
        try:
            touched = sorted(r[0] for r in
                             final.select(_BUCKET_COL).distinct().collect())
            manifest = self._manifest(table_id)
            prev_buckets: dict[str, list[str]] = manifest["buckets"]
            out_cols = names + [_BUCKET_COL]
            upserts = final.where(F.col(OP_COL) != "-D").select(*out_cols)
            prev_files = [os.path.join(self._data_dir(table_id), p)
                          for b in touched
                          for p in prev_buckets.get(str(b), [])]
            if prev_files:
                current = (spark.read.option("basePath", self._data_dir(table_id))
                           .option("mergeSchema", "true").parquet(*prev_files))
                have = set(current.columns)
                aligned = current.select(*[
                    F.col(c) if c in have else F.lit(None).alias(c)
                    for c in out_cols])
                merged = (aligned.join(final.select(*pks), on=pks,
                                       how="left_anti")
                          .unionByName(upserts, allowMissingColumns=True))
            else:
                merged = upserts
            before = {b: self._bucket_files(table_id, b) for b in touched}
            (merged.repartition(F.col(_BUCKET_COL))
             .write.mode("append").partitionBy(_BUCKET_COL)
             .parquet(self._data_dir(table_id)))
            new_buckets = dict(prev_buckets)
            for b in touched:
                added = sorted(self._bucket_files(table_id, b) - before[b])
                if added:
                    new_buckets[str(b)] = added  # bucket REPLACED by commit
                else:
                    new_buckets.pop(str(b), None)  # all rows deleted
            self._commit(table_id, new_buckets, batch_id)
        finally:
            final.unpersist()
        with open(marker, "w") as f:
            f.write("ok")

    def _write_mor_commit(self, tid: TableId, final: DataFrame,
                          names: list[str], pks: list[str], batch_id) -> None:
        """Append-only delta commit: the batch's final images (row kind +
        commit sequence) land as new files under ``delta/``; base buckets
        and every previous delta file are carried forward untouched — the
        commit never reads or rewrites existing data (O(batch) at any
        table size)."""
        manifest = self._manifest(tid)
        seq = manifest["seq"] + 1
        delta_cols = names + [OP_COL, _BUCKET_COL]
        rows = (final.select(*delta_cols)
                .withColumn(_COMMIT_SEQ, F.lit(seq).cast("bigint")))
        touched = sorted(r[0] for r in
                         final.select(_BUCKET_COL).distinct().collect())
        before = {b: self._delta_files_on_disk(tid, b) for b in touched}
        (rows.repartition(F.col(_BUCKET_COL))
         .write.mode("append").partitionBy(_BUCKET_COL)
         .parquet(self._delta_dir(tid)))
        deltas = {k: list(v) for k, v in
                  (manifest.get("deltas") or {}).items()}
        for b in touched:
            added = sorted(self._delta_files_on_disk(tid, b) - before[b])
            if added:
                deltas[str(b)] = deltas.get(str(b), []) + added
        self._commit(tid, dict(manifest["buckets"]), batch_id, deltas=deltas)

    # -- read path ---------------------------------------------------------
    def read(self, spark: SparkSession, table_id: TableId,
             snapshot: int | None = None) -> DataFrame:
        """Read the table at a snapshot (default: latest) — time travel is
        ``read(spark, tid, snapshot=<seq>)``."""
        manifest = self._manifest(table_id, snapshot)
        paths = [os.path.join(self._data_dir(table_id), p)
                 for files in manifest["buckets"].values() for p in files]
        delta_paths = [os.path.join(self._delta_dir(table_id), p)
                       for files in (manifest.get("deltas") or {}).values()
                       for p in files]
        schema = None
        if os.path.exists(self._schema_path(table_id)):
            with open(self._schema_path(table_id)) as f:
                schema = Schema.from_json(f.read())
        if not paths and not delta_paths:
            if schema is None:
                raise ValueError(f"{table_id}: empty table and no schema")
            return spark.createDataFrame([], schema.struct_type())
        if delta_paths:
            df = self._merge_read(spark, table_id, paths, delta_paths)
        else:
            df = (spark.read.option("basePath", self._data_dir(table_id))
                  .option("mergeSchema", "true").parquet(*paths)
                  .drop(_BUCKET_COL, _COMMIT_SEQ))
        if schema is not None:
            from ..operators.schema_evolution import coercion_select

            df = coercion_select(df, schema)
        return df

    def _merge_read(self, spark: SparkSession, tid: TableId,
                    base_paths: list[str], delta_paths: list[str]) -> DataFrame:
        """Merge-on-read: latest commit sequence wins per key, delete row
        kinds drop the key. One bucket-aligned window shuffle — the read
        cost MoR trades for its O(batch) commits (compact() removes it)."""
        from pyspark.sql import Window

        pks = self._pks(tid)
        delta = (spark.read.option("basePath", self._delta_dir(tid))
                 .option("mergeSchema", "true").parquet(*delta_paths))
        parts = [delta]
        if base_paths:
            base = (spark.read.option("basePath", self._data_dir(tid))
                    .option("mergeSchema", "true").parquet(*base_paths))
            if OP_COL not in base.columns:
                base = base.withColumn(OP_COL, F.lit("+I"))
            if _COMMIT_SEQ not in base.columns:
                # pre-compact base files sort before every delta commit
                base = base.withColumn(_COMMIT_SEQ, F.lit(-1).cast("bigint"))
            parts.append(base)
        allr = parts[0]
        for p in parts[1:]:
            allr = allr.unionByName(p, allowMissingColumns=True)
        w = Window.partitionBy(*[F.col(k) for k in pks]).orderBy(
            F.col(_COMMIT_SEQ).desc())
        return (allr.withColumn("__rn", F.row_number().over(w))
                .where((F.col("__rn") == 1) & (F.col(OP_COL) != "-D"))
                .drop("__rn", OP_COL, _BUCKET_COL, _COMMIT_SEQ))

    # -- maintenance -------------------------------------------------------
    def vacuum(self, table_id: TableId, keep_last: int = 1) -> int:
        """Delete data files referenced by NO retained snapshot and drop
        the expired manifests. Returns the number of files removed."""
        seqs = self.snapshots(table_id)
        keep, drop = seqs[-keep_last:], seqs[:-keep_last]
        live: set[str] = set()
        live_delta: set[str] = set()
        for s in keep:
            m = self._manifest(table_id, s)
            for files in m["buckets"].values():
                live.update(files)
            for files in (m.get("deltas") or {}).values():
                live_delta.update(files)
        removed = 0
        for root, live_set in ((self._data_dir(table_id), live),
                               (self._delta_dir(table_id), live_delta)):
            for b_dir in os.listdir(root) if os.path.isdir(root) else []:
                if not b_dir.startswith(f"{_BUCKET_COL}="):
                    continue
                for f in os.listdir(os.path.join(root, b_dir)):
                    rel = f"{b_dir}/{f}"
                    if f.endswith(".parquet") and rel not in live_set:
                        os.remove(os.path.join(root, rel))
                        removed += 1
        for s in drop:
            os.remove(os.path.join(self._snap_dir(table_id), f"{s}.json"))
        return removed

    def compact(self, spark: SparkSession, table_id: TableId) -> None:
        """Rewrite every live bucket down to one file and commit the
        result as a new snapshot (older snapshots keep working until
        vacuum).  With outstanding MoR deltas, folds base + deltas into
        fresh delta-free base files first (the LSM-compaction step that
        returns reads to pure scans)."""
        manifest = self._manifest(table_id)
        if manifest.get("deltas"):
            self._compact_mor(spark, table_id, manifest)
            return
        new_buckets: dict[str, list[str]] = {}
        for b, files in manifest["buckets"].items():
            before = self._bucket_files(table_id, int(b))
            paths = [os.path.join(self._data_dir(table_id), p) for p in files]
            (spark.read.option("basePath", self._data_dir(table_id))
             .option("mergeSchema", "true").parquet(*paths)
             .coalesce(1)
             .write.mode("append").partitionBy(_BUCKET_COL)
             .parquet(self._data_dir(table_id)))
            new_buckets[b] = sorted(
                self._bucket_files(table_id, int(b)) - before)
        self._commit(table_id, new_buckets)

    def _compact_mor(self, spark: SparkSession, tid: TableId,
                     manifest: dict) -> None:
        """Fold base + delta files into new base files (one per bucket)
        and commit a delta-free snapshot.  New rows carry the compaction's
        commit sequence so later delta commits always sort after them."""
        base_paths = [os.path.join(self._data_dir(tid), p)
                      for files in manifest["buckets"].values() for p in files]
        delta_paths = [os.path.join(self._delta_dir(tid), p)
                       for files in manifest["deltas"].values() for p in files]
        merged = self._merge_read(spark, tid, base_paths, delta_paths)
        pks = self._pks(tid)
        new_seq = manifest["seq"] + 1
        rows = (merged
                .withColumn(_BUCKET_COL, self._bucket_of(merged, pks))
                .withColumn(_COMMIT_SEQ, F.lit(new_seq).cast("bigint"))
                .persist())
        try:
            touched = sorted(r[0] for r in
                             rows.select(_BUCKET_COL).distinct().collect())
            before = {b: self._bucket_files(tid, b) for b in touched}
            (rows.repartition(F.col(_BUCKET_COL))
             .write.mode("append").partitionBy(_BUCKET_COL)
             .parquet(self._data_dir(tid)))
            new_buckets = {
                str(b): sorted(self._bucket_files(tid, b) - before[b])
                for b in touched
                if self._bucket_files(tid, b) - before[b]}
            self._commit(tid, new_buckets)
        finally:
            rows.unpersist()

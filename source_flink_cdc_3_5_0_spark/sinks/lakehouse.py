"""Snapshot-isolated lake sink — Paimon/Iceberg-style manifests.

Parity target: the reference's table-format sinks
(flink-cdc-pipeline-connector-{paimon,iceberg}): every commit produces an
immutable SNAPSHOT — a manifest listing the table's live data files —
readers pin one manifest (snapshot isolation: a concurrent commit never
changes what a running query sees), old snapshots stay readable (time
travel) until ``vacuum`` reclaims unreferenced files, and ``compact``
rewrites small files without changing visible data.

Physical layout (all JSON control files are tiny — O(buckets) entries):

    <root>/<tableId>/data/__bucket=N/part-*.parquet   append-only base files
    <root>/<tableId>/delta/__bucket=N/part-*.parquet  MoR delta files
    <root>/<tableId>/_snapshots/<seq>.json            one manifest/commit
    <root>/<tableId>/_stats/s<seq>_*.json             zone-map stat shards
    <root>/<tableId>/_schema.json                     evolved schema sidecar
    <root>/<tableId>/_table.json                      layout {num_buckets, mode}
    <root>/<tableId>/_tags.json                       named snapshot refs
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
_UNSET = object()  # "not passed" sentinel (None is a meaningful value)


class CommitConflictError(RuntimeError):
    """A concurrent writer committed the same snapshot sequence first
    (Iceberg's CommitFailedException).  The failed commit wrote only
    unreferenced data files — re-read the manifest and retry the write;
    ``vacuum`` reclaims the orphans."""


# -- zone maps (manifest file statistics) ----------------------------------
#
# Iceberg/Paimon manifests carry per-file column stats (lower/upper bound,
# null count) harvested from the parquet footers at COMMIT time; planners
# prune whole data files whose bounds cannot satisfy a scan predicate
# before any task is scheduled.  Same here: stats are read driver-side
# from the footers of the files a commit just wrote (O(new files) control
# plane — the data is never re-scanned) and stored in the snapshot
# manifest; ``read(..., filters=…)`` drops provably-dead files and then
# applies the predicate for real.  Pruning is conservative: unknown
# types, missing stats, or tag mismatches keep the file.

def _norm_stat(v):
    """Normalize a footer min/max value to (tag, comparable) or None.

    Comparables must ORDER correctly within a tag: decimals keep their
    string form for JSON but are re-parsed to Decimal at compare time
    (see ``_cmp_key`` — lexicographic '30' > '100' would silently prune
    matching files); tz-AWARE datetimes are converted to UTC and tagged
    'tsz', distinct from naive 'ts' — a naive filter value under an
    unknown session timezone can NOT be soundly compared against a UTC
    instant, so that mismatch keeps the file (the residual filter does
    the real work)."""
    import datetime as _dt
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return ("n", int(v))
    if isinstance(v, (int, float)):
        return ("n", v)
    if isinstance(v, Decimal):
        return ("c", str(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            u = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return ("tsz", u.isoformat(sep=" "))
        return ("ts", v.isoformat(sep=" "))
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, str):
        return ("s", v)
    return None  # bytes etc. — no pruning on this column


def _cmp_key(tag: str, v):
    """Comparable form of a normalized stat/filter value for one tag."""
    if tag == "c":
        from decimal import Decimal

        return Decimal(v)
    return v


def _footer_stats(path: str) -> dict:
    """Per-column {lo, hi, nulls, t} + row count from one parquet footer."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    cols: dict[str, dict] = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            name = col.path_in_schema
            s = col.statistics
            ent = cols.setdefault(
                name, {"lo": None, "hi": None, "nulls": 0, "t": None})
            if s is None:
                ent["t"] = "x"  # a row group without stats poisons the col
                continue
            ent["nulls"] += s.null_count or 0
            if not s.has_min_max:
                # all-null row group: contributes no bounds, not poison
                continue
            lo, hi = _norm_stat(s.min), _norm_stat(s.max)
            if lo is None or hi is None or lo[0] != hi[0]:
                ent["t"] = "x"
                continue
            if ent["t"] is None:
                ent["t"], ent["lo"], ent["hi"] = lo[0], lo[1], hi[1]
            elif ent["t"] == lo[0]:
                ent["lo"] = min(ent["lo"], lo[1])
                ent["hi"] = max(ent["hi"], hi[1])
            else:
                ent["t"] = "x"
    return {"rows": md.num_rows,
            "cols": {k: v for k, v in cols.items() if v["t"] != "x"}}


def _file_excluded(stats: dict, filters) -> bool:
    """True iff the per-file stats PROVE no row can satisfy the AND of
    ``filters`` (comparisons are null-rejecting, so all-null columns
    exclude the file for every supported op)."""
    cols = stats.get("cols", {})
    nrows = stats.get("rows", 0)
    for col, op, val in filters:
        ent = cols.get(col)
        if ent is None:
            continue
        if ent["lo"] is None:
            if nrows and ent["nulls"] >= nrows:
                return True  # every value null: no comparison matches
            continue
        vals = list(val) if op == "in" else [val]
        normed = [_norm_stat(v) for v in vals]
        if any(n is None or n[0] != ent["t"] for n in normed):
            continue
        tag = ent["t"]
        lo, hi = _cmp_key(tag, ent["lo"]), _cmp_key(tag, ent["hi"])
        keys = [_cmp_key(tag, n[1]) for n in normed]
        if op in ("=", "=="):
            if keys[0] < lo or keys[0] > hi:
                return True
        elif op == "in":
            if all(k < lo or k > hi for k in keys):
                return True
        elif op == "<":
            if lo >= keys[0]:
                return True
        elif op == "<=":
            if lo > keys[0]:
                return True
        elif op == ">":
            if hi <= keys[0]:
                return True
        elif op == ">=":
            if hi < keys[0]:
                return True
    return False


def _zvalue_col(df: DataFrame, cols: list[str], bits: int = 12):
    """Z-order (Morton) key over 2+ numeric/timestamp columns — the
    Delta OPTIMIZE ZORDER / Iceberg z-order rewrite strategy.  Each
    column is min-max normalized to a ``bits``-wide integer from a
    bounded driver-side (min, max) aggregate, then the bit strings are
    interleaved so file ranges stay tight on EVERY participating column
    (a single-column sort gives perfect bounds on one column and useless
    bounds on the rest).  Nulls sort to 0.  Pure Column expression —
    no UDF, stays in codegen."""
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double",
               "date", "timestamp", "timestamp_ntz")
    dtypes = dict(df.dtypes)
    nexprs: dict[str, object] = {}
    for c in cols:
        base = dtypes.get(c, "").split("(")[0]
        if base not in numeric and not base.startswith("decimal"):
            raise ValueError(
                f"zorder column {c!r} has non-orderable-numeric type "
                f"{dtypes.get(c)!r}; cast or hash it first")
        # date/ntz cannot cast to double directly; route through
        # timestamp first (monotonic — a constant session-tz shift
        # cannot reorder values, which is all z-ordering needs)
        if base in ("date", "timestamp_ntz"):
            nexprs[c] = F.col(c).cast("timestamp").cast("double")
        else:
            nexprs[c] = F.col(c).cast("double")
    bounds = df.agg(*[F.min(nexprs[c]).alias(f"lo_{i}")
                      for i, c in enumerate(cols)],
                    *[F.max(nexprs[c]).alias(f"hi_{i}")
                      for i, c in enumerate(cols)]).collect()[0]
    z = F.lit(0).cast("bigint")
    n = len(cols)
    top = (1 << bits) - 1
    for ci, c in enumerate(cols):
        lo, hi = bounds[f"lo_{ci}"], bounds[f"hi_{ci}"]
        if lo is None or hi is None or hi <= lo:
            scaled = F.lit(0).cast("bigint")
        else:
            scaled = F.floor((nexprs[c] - F.lit(lo))
                             / F.lit(hi - lo) * F.lit(float(top)))
        scaled = F.coalesce(scaled, F.lit(0)).cast("bigint")
        for bit in range(bits):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(scaled, bit).bitwiseAND(F.lit(1)),
                bit * n + ci))
    return z


def _filters_to_column(filters):
    col = None
    for name, op, val in filters:
        c = F.col(name)
        if op in ("=", "=="):
            cond = c == F.lit(val)
        elif op == "in":
            vals = list(val)
            # col IN () is vacuously false (and isin() would throw)
            cond = c.isin(*vals) if vals else F.lit(False)
        elif op == "<":
            cond = c < F.lit(val)
        elif op == "<=":
            cond = c <= F.lit(val)
        elif op == ">":
            cond = c > F.lit(val)
        elif op == ">=":
            cond = c >= F.lit(val)
        else:
            raise ValueError(f"unsupported filter op {op!r}")
        col = cond if col is None else (col & cond)
    return col


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
            # replay-safe WITHOUT bookkeeping: dropping removes the
            # table's data markers too, so a replayed batch that also
            # recreated the table re-lands its writes and converges
            shutil.rmtree(self.sink._table_dir(table_id), ignore_errors=True)
            return
        if isinstance(event, TruncateTableEvent):
            # round-9 review (data loss): data WRITES are replay-skipped
            # by batch markers, so a replayed truncate must be too — an
            # unconditional empty commit on re-delivery erased the
            # post-truncate rows the first pass committed (their marker
            # made the rewrite a no-op). Same contract as the DDL
            # spool: per-delivery ordinal (reset by begin_batch) vs a
            # durable per-batch applied-count.
            ctx = self.batch_ctx
            if ctx is not None:
                key = (str(table_id), str(ctx))
                n = self.sink._ddl_pass_state.get(key, 0)
                self.sink._ddl_pass_state[key] = n + 1
                spath = os.path.join(self.sink._table_dir(table_id),
                                     "_truncate_state.json")
                try:
                    with open(spath) as f:
                        st = json.load(f)
                except (OSError, ValueError):
                    st = {}
                if st.get("batch") == str(ctx) and n < st.get("applied", 0):
                    return  # this delivery replays an applied truncate
                self.sink._commit(table_id, {})
                tmp = spath + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"batch": str(ctx), "applied": n + 1}, f)
                os.replace(tmp, spath)
                return
            self.sink._commit(table_id, {})
            return
        self.sink._ensure_meta(table_id)
        path = self.sink._schema_path(table_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(evolved_schema.to_json())


class SnapshotLakeSink(DataSink):
    def __init__(self, root: str, num_buckets: int = 16, mode: str = "cow",
                 filelist_shard_span: int = 8):
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be cow|mor, got {mode!r}")
        self.root = root
        self.num_buckets = num_buckets
        self.mode = mode
        # buckets per file-list shard (Iceberg manifest-file granularity):
        # a commit rewrites only the shards whose bucket GROUP changed, so
        # commit write amplification is O(touched buckets / span), never
        # O(live files).  Purely a WRITE-side layout knob — readers merge
        # whatever shards a snapshot references, so mixed spans coexist.
        self.filelist_shard_span = max(1, int(filelist_shard_span))
        self._shard_cache: dict[tuple[str, str], dict] = {}
        self._filelist_cache: dict[tuple[str, str], dict] = {}
        #: per-DELIVERY truncate ordinals (reset by begin_batch) — the
        #: applier objects are created fresh per call, so the counters
        #: live on the sink (see _LakeMetadataApplier's truncate path)
        self._ddl_pass_state: dict[tuple[str, str], int] = {}

    @classmethod
    def for_table(cls, root: str, table_id: TableId,
                  num_buckets: int | None = None,
                  mode: str | None = None) -> "SnapshotLakeSink":
        """Open an EXISTING table with its persisted bucket count and
        changelog mode (the ``_table.json`` written at create time) —
        the safe constructor for readers and maintenance tools.
        Explicit arguments must match the persisted values."""
        meta_path = os.path.join(root, table_id.identifier(), "_table.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        nb = meta.get("num_buckets", num_buckets)
        md = meta.get("mode", mode)
        if nb is None or md is None:
            raise ValueError(
                f"{table_id}: no persisted table metadata at {meta_path}; "
                "pass num_buckets and mode explicitly")
        if num_buckets is not None and num_buckets != nb:
            raise ValueError(
                f"{table_id}: requested num_buckets={num_buckets} but the "
                f"table was created with {nb}")
        if mode is not None and mode != md:
            raise ValueError(
                f"{table_id}: requested mode={mode!r} but the table was "
                f"created with {md!r}")
        return cls(root, num_buckets=nb, mode=md)

    # -- layout ------------------------------------------------------------
    def _table_dir(self, tid: TableId) -> str:
        return os.path.join(self.root, tid.identifier())

    def _meta_path(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_table.json")

    def _ensure_meta(self, tid: TableId, create: bool = True) -> None:
        """Persist {num_buckets, mode} once, and REFUSE to operate on a
        table whose persisted layout disagrees with this instance — a
        bucket-count mismatch would make PK point-lookup pruning return
        silently missing rows, which must be an error instead.
        ``create=False`` (read paths) only validates."""
        path = self._meta_path(tid)
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
            if meta.get("num_buckets") != self.num_buckets:
                raise ValueError(
                    f"{tid}: table has num_buckets="
                    f"{meta.get('num_buckets')} but this sink was built "
                    f"with {self.num_buckets}; use "
                    "SnapshotLakeSink.for_table() to open existing tables")
            if meta.get("mode") != self.mode:
                raise ValueError(
                    f"{tid}: table has mode={meta.get('mode')!r} but this "
                    f"sink was built with {self.mode!r}; use "
                    "SnapshotLakeSink.for_table()")
            return
        if not create:
            return
        os.makedirs(self._table_dir(tid), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"num_buckets": self.num_buckets, "mode": self.mode},
                      f)

    def _data_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "data")

    def _schema_path(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_schema.json")

    def _snap_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_snapshots")

    def _delta_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "delta")

    def begin_batch(self, batch_id) -> None:
        # new delivery (incl. same-process re-delivery): truncate replay
        # detection restarts at ordinal 0, like the DDL spool's reset
        self._ddl_pass_state = {}

    def metadata_applier(self) -> MetadataApplier:
        return _LakeMetadataApplier(self)

    # -- manifests ---------------------------------------------------------
    def snapshots(self, tid: TableId) -> list[int]:
        d = self._snap_dir(tid)
        if not os.path.isdir(d):
            return []
        return sorted(int(f[:-5]) for f in os.listdir(d)
                      if f.endswith(".json"))

    def _manifest_raw(self, tid: TableId, seq: int | None = None) -> dict:
        """The snapshot document as written (file-list SHARD REFS, not
        materialized paths) — what _commit diffs against to carry
        untouched shards forward by reference."""
        seqs = self.snapshots(tid)
        if not seqs:
            return {"seq": -1, "buckets": {}}
        seq = seqs[-1] if seq is None else seq
        if seq not in seqs:
            raise ValueError(f"unknown snapshot {seq}; have {seqs}")
        with open(os.path.join(self._snap_dir(tid), f"{seq}.json")) as f:
            return json.load(f)

    def _manifest(self, tid: TableId, seq: int | None = None,
                  buckets_needed=None) -> dict:
        """The RESOLVED snapshot: ``buckets``/``deltas`` materialized by
        merging the snapshot's file-list shards (immutable, cached per
        sink instance).  Pre-shard snapshots carry the listing inline and
        pass through unchanged — every reader sees the same shape either
        way.  Callers must not mutate the inner file lists (they are
        shared with the shard cache); every writer here builds new lists.

        ``buckets_needed`` (a set of bucket ids) resolves ONLY the shard
        groups owning those buckets — the PK point-lookup read path, whose
        driver-side metadata cost is then O(touched shards) instead of
        O(live files) (the commit's recorded ``filelist_span`` maps bucket
        → group; every ref in a snapshot is guaranteed written under that
        span).  The returned ``buckets``/``deltas`` are PARTIAL: callers
        doing anything beyond reading those buckets must resolve fully."""
        doc = self._manifest_raw(tid, seq)
        refs = doc.get("file_shards")
        if refs is None:
            return doc
        span = doc.get("filelist_span")
        if buckets_needed is not None and span:
            gids = {str(int(b) // span) for b in buckets_needed}
            wanted = [s for g, s in refs.items() if g in gids]
        else:
            wanted = list(refs.values())
        buckets: dict[str, list[str]] = {}
        deltas: dict[str, list[str]] = {}
        for shard in wanted:
            content = self._load_filelist_shard(tid, shard)
            buckets.update(content.get("buckets") or {})
            deltas.update(content.get("deltas") or {})
        doc["buckets"] = buckets
        if deltas:
            doc["deltas"] = deltas
        return doc

    def _filelist_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_filelists")

    def _load_filelist_shard(self, tid: TableId, shard: str) -> dict:
        """One immutable file-list shard (cached — shards never change
        after commit, so the cache cannot go stale)."""
        key = (tid.identifier(), shard)
        cached = self._filelist_cache.get(key)
        if cached is not None:
            return cached
        path = os.path.join(self._filelist_dir(tid), shard)
        try:
            with open(path) as f:
                out = json.load(f)
        except OSError:
            # a referenced-but-missing shard means real data loss for the
            # snapshot (unlike stats shards, which only lose pruning) —
            # surface it instead of silently reading a partial table
            raise ValueError(
                f"{tid}: file-list shard {shard} referenced by a snapshot "
                "is missing — was _filelists/ deleted out-of-band?")
        self._filelist_cache[key] = out
        return out

    def _commit(self, tid: TableId, buckets: dict[str, list[str]],
                batch_id=None, deltas: dict[str, list[str]] | None = None) -> int:
        snap_dir = self._snap_dir(tid)
        os.makedirs(snap_dir, exist_ok=True)
        seq = (self.snapshots(tid) or [-1])[-1] + 1
        # per-writer tmp name so racing writers don't collide pre-commit
        tmp = os.path.join(snap_dir, f"{seq}.json.{os.getpid()}.tmp")
        import time as _time

        doc = {"seq": seq, "batch_id": None if batch_id is None
               else str(batch_id), "committed_at": _time.time()}
        deltas = deltas or {}
        # stats only for BASE files: delta files are never pruned (see
        # scan_files) and read_changes selects them by manifest listing,
        # so delta stats would be dead weight copied forward every commit.
        # SHARDED (Iceberg manifest-list shape): each commit writes ONE
        # immutable shard holding only its NEW files' footer stats and
        # carries the previous shard list forward by reference — commit
        # control-plane is O(new files), never O(all live files), which
        # is what keeps a million-file table's commits flat
        prev = self._manifest(tid) if self.snapshots(tid) else {}
        prev_shards = list(prev.get("stats_shards") or [])
        # a file listed in the PREVIOUS manifest is covered by its shard
        # chain BY CONSTRUCTION — deriving coverage from the bucket
        # listing (not by loading every shard) is what actually keeps the
        # commit O(new files). EXCEPT a pre-shard (inline-stats) previous
        # manifest, which HAS no chain: its files must migrate into a
        # shard once via the legacy dict below, or their zone-map stats
        # silently vanish and pruning dies for them (round-9 review) —
        # a one-time O(live files) dict-copy commit, no footer re-reads.
        legacy = prev.get("stats") or {}  # pre-shard manifests
        covered = (set() if legacy and not prev.get("stats_shards")
                   else {rel for fs in prev.get("buckets", {}).values()
                         for rel in fs})
        new_entries: dict[str, dict] = {}
        live: set[str] = set()
        for files in buckets.values():
            for rel in files:
                live.add(rel)
                if rel in covered:
                    continue
                st = legacy.get(rel)
                if st is None:
                    try:
                        st = _footer_stats(
                            os.path.join(self._data_dir(tid), rel))
                    except Exception:
                        st = {"rows": 0, "cols": {}}  # unreadable: no prune
                new_entries[rel] = st
        if live and not (live & covered):
            # full rewrite (compaction / truncate+reload): nothing from
            # the old shard chain is still live, so RESET the list — the
            # shard-ref growth is bounded by commits since the last full
            # compaction instead of table lifetime
            prev_shards = []
        import uuid as _uuid

        if new_entries:
            sdir = self._stats_dir(tid)
            os.makedirs(sdir, exist_ok=True)
            # per-writer unique shard name: racing committers must never
            # share a shard path (the loser's file would otherwise
            # overwrite content a winning manifest references)
            shard = f"s{seq}_{os.getpid()}_{_uuid.uuid4().hex[:8]}.json"
            with open(os.path.join(sdir, shard), "w") as f:
                json.dump(new_entries, f)
            prev_shards = prev_shards + [shard]
        doc["stats_shards"] = prev_shards
        # SHARDED LIVE-FILE LIST (Iceberg manifest files under the
        # manifest list): buckets are grouped into spans of
        # ``filelist_shard_span``; the commit writes ONE new shard per
        # group whose content changed vs the previous snapshot and
        # carries every untouched group forward BY REFERENCE — so the
        # write amplification of a commit is O(touched buckets/span)
        # shard files + one O(groups) snapshot doc, never O(live files).
        # A rollback whose content equals an old snapshot re-uses that
        # snapshot's shards wholesale (zero shard writes).
        span = self.filelist_shard_span
        prev_refs: dict[str, str] = dict(prev.get("file_shards") or {})
        prev_b: dict[str, list] = prev.get("buckets") or {}
        prev_d: dict[str, list] = prev.get("deltas") or {}

        def _gid(b: str) -> str:
            return str(int(b) // span)

        groups: dict[str, dict] = {}
        for kind, src in (("buckets", buckets), ("deltas", deltas)):
            for b, files in src.items():
                if files:
                    g = groups.setdefault(_gid(b),
                                          {"buckets": {}, "deltas": {}})
                    g[kind][b] = list(files)
        changed: set[str] = set()
        for b in set(buckets) | set(prev_b):
            if buckets.get(b) != prev_b.get(b):
                changed.add(_gid(b))
        for b in set(deltas) | set(prev_d):
            if deltas.get(b) != prev_d.get(b):
                changed.add(_gid(b))
        if prev and (not prev_refs or prev.get("filelist_span") != span):
            # previous snapshot was pre-shard (inline listing) or written
            # with a different shard span: re-shard everything under the
            # current span this commit, so the recorded filelist_span is
            # true for EVERY ref this snapshot carries (pruned point-
            # lookup resolution depends on it)
            changed = set(groups) | set(prev_refs)
        refs: dict[str, str] = {}
        fdir = self._filelist_dir(tid)
        for g in set(groups) | set(prev_refs):
            if g not in changed:
                refs[g] = prev_refs[g]
                continue
            content = groups.get(g)
            if not content:
                continue  # group fully emptied: drop the reference
            # CONTENT-ADDRESSED shard name: equal content → equal file, so
            # (a) a rollback whose listing matches an old snapshot reuses
            # that snapshot's shards without writing a byte, and (b) two
            # racing writers producing the same shard are idempotent (same
            # name implies same bytes — no clobber hazard)
            import hashlib

            blob = json.dumps(content, sort_keys=True).encode()
            fname = f"f{hashlib.sha256(blob).hexdigest()[:24]}.json"
            fpath = os.path.join(fdir, fname)
            if os.path.exists(fpath):
                # refresh the vacuum grace window: a dead-but-present
                # shard being re-referenced must not be reaped mid-commit
                os.utime(fpath)
            else:
                os.makedirs(fdir, exist_ok=True)
                tmp_sh = f"{fpath}.{os.getpid()}.{_uuid.uuid4().hex[:8]}.tmp"
                with open(tmp_sh, "w") as f:
                    f.write(blob.decode())
                os.replace(tmp_sh, fpath)  # same-content race is benign
            refs[g] = fname
        doc["file_shards"] = refs
        # span + file count recorded so READERS can (a) resolve only the
        # shard groups a point lookup touches and (b) report scan totals
        # without materializing the full listing
        doc["filelist_span"] = span
        doc["n_files"] = sum(len(fs) for fs in buckets.values())
        with open(tmp, "w") as f:
            json.dump(doc, f)
        # optimistic concurrency: atomically CREATE (never overwrite) the
        # manifest — two writers racing to commit seq N cannot both win,
        # the loser gets a conflict instead of silently clobbering the
        # winner's snapshot (os.rename would overwrite)
        final = os.path.join(snap_dir, f"{seq}.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflictError(
                f"{tid}: snapshot {seq} was committed concurrently; "
                "re-read the manifest and retry (orphaned data files are "
                "unreferenced — vacuum reclaims them)") from None
        os.unlink(tmp)
        return seq

    def _stats_dir(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_stats")

    def _load_shard(self, tid: TableId, shard: str) -> dict:
        """One immutable stats shard (cached per sink instance — shards
        never change after commit, so the cache cannot go stale)."""
        key = (tid.identifier(), shard)
        cached = self._shard_cache.get(key)
        if cached is not None:
            return cached
        path = os.path.join(self._stats_dir(tid), shard)
        try:
            with open(path) as f:
                out = json.load(f)
        except OSError:
            out = {}  # referenced-but-missing shard: no pruning
        self._shard_cache[key] = out
        return out

    def file_stats(self, table_id: TableId, snapshot: int | None = None,
                   _manifest: dict | None = None) -> dict:
        """Merged zone-map stats for a snapshot's base files: the union
        of its stats shards (plus legacy inline stats)."""
        m = (_manifest if _manifest is not None
             else self._manifest(table_id, snapshot))
        merged: dict[str, dict] = dict(m.get("stats") or {})
        for sh in m.get("stats_shards") or []:
            merged.update(self._load_shard(table_id, sh))
        return merged

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
    def _schema_pk_integral(self, schema: Schema) -> bool:
        """Whether the (single) PK is integral PER THE TABLE SCHEMA — the
        one authority both the write path's bucket placement and the read
        path's point-lookup pruning must share: deciding from a batch's
        incidental dtypes instead would let a mistyped batch place rows
        in buckets a point lookup never scans."""
        import pyspark.sql.types as T

        pks = schema.primary_keys
        if len(pks) != 1:
            return False
        field = next((fl for fl in schema.struct_type().fields
                      if fl.name == pks[0]), None)
        return field is not None and isinstance(
            field.dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType))

    def _bucket_of(self, df: DataFrame, pks: list[str], schema: Schema):
        if self._schema_pk_integral(schema):
            key = F.coalesce(F.col(pks[0]).cast("bigint"), F.lit(0))
        else:
            # cast to the schema's declared types so the hash — and thus
            # the bucket — is stable whatever dtypes a batch arrives with
            types = {fl.name: fl.dataType
                     for fl in schema.struct_type().fields}
            key = F.abs(F.hash(
                *[F.col(k).cast(types[k]) if k in types else F.col(k)
                  for k in pks]).cast("bigint"))
        return portable_bucket_expr(key, self.num_buckets)

    def _table_schema(self, tid: TableId) -> Schema:
        with open(self._schema_path(tid)) as f:
            return Schema.from_json(f.read())

    def _staged_write(self, df: DataFrame,
                      dest_dir: str) -> dict[str, list[str]]:
        """Write a ``__bucket``-partitioned frame through a writer-unique
        STAGING dir, then move each part file into ``dest_dir`` —
        returning EXACTLY the files this writer added, per bucket.

        Round-9 review: the old before/after directory-listing diff
        absorbed a CONCURRENT writer's files into this commit's manifest
        (the advertised retry-on-conflict multi-writer protocol then
        duplicated every pre-existing row the loser had merged). Part
        names carry Spark task UUIDs, so moves can't collide."""
        import shutil
        import uuid as _uuid

        staging = "%s.stage-%d-%s" % (dest_dir.rstrip("/"), os.getpid(),
                                      _uuid.uuid4().hex[:8])
        # callers choose the partitioning/sort layout (bucket repartition
        # for commits, range-clustering for compaction) — the helper only
        # stages and moves
        (df.write.mode("overwrite").partitionBy(_BUCKET_COL)
         .parquet(staging))
        added: dict[str, list[str]] = {}
        try:
            for b_dir in os.listdir(staging):
                if not b_dir.startswith(f"{_BUCKET_COL}="):
                    continue
                b = b_dir.split("=", 1)[1]
                os.makedirs(os.path.join(dest_dir, b_dir), exist_ok=True)
                for f in os.listdir(os.path.join(staging, b_dir)):
                    if not f.endswith(".parquet"):
                        continue
                    os.rename(os.path.join(staging, b_dir, f),
                              os.path.join(dest_dir, b_dir, f))
                    added.setdefault(b, []).append(f"{b_dir}/{f}")
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return {b: sorted(v) for b, v in added.items()}

    def write(self, table_id: TableId, df: DataFrame, schema: Schema,
              batch_id) -> None:
        from ..streaming.materialize import latest_image

        self._ensure_meta(table_id)
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
        final = final.withColumn(_BUCKET_COL,
                                 self._bucket_of(final, pks, schema))
        if self.mode == "mor":
            # single-pass commit (optimization r11, guide §2.4/§5): the
            # staged write's added_map IS the touched-bucket set, so the
            # MOR path needs neither the pre-write distinct().collect()
            # job nor the persist that existed only to keep that collect
            # and the write consistent — the manifest is derived from the
            # files actually written, so it matches them by construction
            # even for a nondeterministic batch
            self._write_mor_commit(table_id, final, names, pks, batch_id)
            with open(marker, "w") as f:
                f.write("ok")
            return
        # persist: the touched-bucket collect and the file write are two
        # actions — unpersisted, a nondeterministic batch could write a
        # bucket the manifest never records (and vacuum would delete)
        final = final.persist()
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
            added_map = self._staged_write(
                merged.repartition(F.col(_BUCKET_COL)),
                self._data_dir(table_id))
            new_buckets = dict(prev_buckets)
            for b in touched:
                added = added_map.get(str(b), [])
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
        added_map = self._staged_write(
            rows.repartition(F.col(_BUCKET_COL)), self._delta_dir(tid))
        deltas = {k: list(v) for k, v in
                  (manifest.get("deltas") or {}).items()}
        # touched buckets = exactly the buckets the staged write produced
        # (partitionBy writes no empty partitions) — no separate
        # distinct().collect() pass over the batch
        for b in sorted(added_map, key=int):
            deltas[b] = deltas.get(b, []) + added_map[b]
        self._commit(tid, dict(manifest["buckets"]), batch_id, deltas=deltas)

    # -- read path ---------------------------------------------------------
    def _pk_point_buckets(self, tid: TableId, filters) -> set[int] | None:
        """Bucket ids implied by an equality/IN filter on the table's
        single INTEGRAL primary key — the point-lookup planner: a PK row
        can only live in ``portable_bucket(pk)``, so a ``pk = v`` scan
        needs ONE bucket's files regardless of table size (the same
        guarantee Iceberg's bucket partition transform gives).  Computed
        driver-side with :func:`portable_bucket_py`, the bit-identical
        Python replica of the write path's bucket expression.  Returns
        None when not derivable (no filters, composite/non-integral PK,
        non-int filter values) — pruning then falls back to zone maps
        alone."""
        import pyspark.sql.types as T

        from ..operators.partitioning import portable_bucket_py

        if not filters or not os.path.exists(self._schema_path(tid)):
            return None
        with open(self._schema_path(tid)) as f:
            schema = Schema.from_json(f.read())
        pks = schema.primary_keys
        if len(pks) != 1:
            return None
        field = next((fl for fl in schema.struct_type().fields
                      if fl.name == pks[0]), None)
        if field is None or not isinstance(
                field.dataType,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return None
        out: set[int] | None = None
        for c, op, val in filters:
            if c != pks[0] or op not in ("=", "==", "in"):
                continue
            vals = list(val) if op == "in" else [val]
            if not all(isinstance(v, int) and not isinstance(v, bool)
                       for v in vals):
                continue
            bs = {portable_bucket_py(v, self.num_buckets) for v in vals}
            out = bs if out is None else (out & bs)
        return out

    def scan_files(self, table_id: TableId, snapshot: int | None = None,
                   filters=None, _manifest: dict | None = None,
                   _pk_allowed=_UNSET) -> tuple[list[str], int]:
        """Plan a scan: (base files kept after zone-map pruning, total base
        files in the snapshot).  With no filters every file is kept.  MoR
        DELTA files are never pruned — a newer delta version must shadow an
        older matching base row even when the new value itself falls outside
        the predicate, so only base files are prunable (same reason Iceberg
        applies delete files before residual filters).  ``_manifest`` lets
        ``read`` pass its already-loaded manifest instead of re-parsing."""
        self._ensure_meta(table_id, create=False)
        manifest = (_manifest if _manifest is not None
                    else self._manifest(table_id, snapshot))
        # n_files is recorded at commit time so a shard-pruned (partial)
        # manifest still reports the snapshot's true file total
        total = manifest.get("n_files",
                             sum(len(fs) for fs in
                                 manifest["buckets"].values()))
        if not filters:
            return [p for fs in manifest["buckets"].values() for p in fs], \
                total
        allowed = (_pk_allowed if _pk_allowed is not _UNSET
                   else self._pk_point_buckets(table_id, filters))
        rels = [p for b, fs in manifest["buckets"].items()
                if allowed is None or int(b) in allowed
                for p in fs]
        stats = self.file_stats(table_id, _manifest=manifest)
        kept = [p for p in rels
                if not _file_excluded(stats.get(p, {}), filters)]
        return kept, total

    def read(self, spark: SparkSession, table_id: TableId,
             snapshot: int | None = None, filters=None) -> DataFrame:
        """Read the table at a snapshot (default: latest) — time travel is
        ``read(spark, tid, snapshot=<seq>)``.  ``filters`` is a pyarrow-style
        AND list ``[(col, op, value), ...]`` (ops ``= < <= > >= in``): data
        files whose manifest zone maps prove no row can match are dropped
        from the scan driver-side, then the predicate is applied for real
        (pruning is an optimization, never the filter itself)."""
        self._ensure_meta(table_id, create=False)
        # computed ONCE here (schema parse + bucket hash) and shared with
        # scan_files: a PK point lookup restricts BASE and DELTA files to
        # the owning bucket (both write paths bucket the final image by
        # PK); zone-map stats still never prune deltas (shadowing, see
        # scan_files).  The manifest itself is then resolved SHARD-PRUNED
        # — only the file-list shards owning those buckets are read, so a
        # point lookup's metadata cost is O(touched shards) driver-side.
        pk_allowed = (self._pk_point_buckets(table_id, filters)
                      if filters else None)
        manifest = self._manifest(table_id, snapshot,
                                  buckets_needed=pk_allowed)
        kept, _total = self.scan_files(table_id, snapshot, filters,
                                       _manifest=manifest,
                                       _pk_allowed=pk_allowed)
        paths = [os.path.join(self._data_dir(table_id), p) for p in kept]
        delta_paths = [os.path.join(self._delta_dir(table_id), p)
                       for b, files in (manifest.get("deltas") or {}).items()
                       if pk_allowed is None or int(b) in pk_allowed
                       for p in files]
        schema = None
        if os.path.exists(self._schema_path(table_id)):
            with open(self._schema_path(table_id)) as f:
                schema = Schema.from_json(f.read())
        if not paths and not delta_paths:
            if schema is None:
                raise ValueError(f"{table_id}: empty table and no schema")
            df = spark.createDataFrame([], schema.struct_type())
            cond = _filters_to_column(filters) if filters else None
            return df.where(cond) if cond is not None else df
        if delta_paths:
            df = self._merge_read(spark, table_id, paths, delta_paths)
        else:
            df = (spark.read.option("basePath", self._data_dir(table_id))
                  .option("mergeSchema", "true").parquet(*paths)
                  .drop(_BUCKET_COL, _COMMIT_SEQ))
        if schema is not None:
            from ..operators.schema_evolution import coercion_select

            df = coercion_select(df, schema)
        cond = _filters_to_column(filters) if filters else None
        return df.where(cond) if cond is not None else df

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

    # -- incremental (changelog) read --------------------------------------
    def read_changes(self, spark: SparkSession, table_id: TableId,
                     from_snapshot: int, to_snapshot: int | None = None
                     ) -> DataFrame:
        """CDC OUT of the lake table (Paimon streaming read / Iceberg
        incremental scan): the row-level changes between two snapshots as a
        changelog DataFrame — data columns + ``__op`` (+I/+U/-D, new image
        for upserts, old image for deletes) + ``__commit_seq``.

        Two plans, picked from the manifests alone:

        * **delta fast path** (MoR history, the streaming-ingestion case):
          when base buckets are unchanged and the delta list only grew, the
          change set IS the delta files committed in ``(from, to]`` — read
          exactly those files, nothing else.  O(changes), never O(table):
          this is what makes the lake table consumable as a stream.
        * **state diff fallback** (copy-on-write commits, TRUNCATE,
          compaction mixed into the range): join the two snapshot states on
          the primary key and classify +I/+U/-D.  Bucket pruning keeps the
          join to the buckets whose file sets actually changed — the bucket
          is a pure function of the PK, so it is recomputed on the read
          rather than stored.  A pure compaction diffs to zero rows.
        """
        self._ensure_meta(table_id, create=False)
        m0 = self._manifest(table_id, from_snapshot)
        m1 = self._manifest(table_id, to_snapshot)
        d0 = {(b, p) for b, fs in (m0.get("deltas") or {}).items()
              for p in fs}
        d1 = {(b, p) for b, fs in (m1.get("deltas") or {}).items()
              for p in fs}
        pks = self._pks(table_id)
        if m0["buckets"] == m1["buckets"] and d0 <= d1:
            new_rels = sorted(p for _, p in d1 - d0)
            if not new_rels:
                empty = self.read(spark, table_id, snapshot=to_snapshot)
                return (empty.withColumn(OP_COL, F.lit("+I"))
                        .withColumn(_COMMIT_SEQ, F.lit(0).cast("bigint"))
                        .limit(0))
            paths = [os.path.join(self._delta_dir(table_id), p)
                     for p in new_rels]
            df = (spark.read.option("basePath", self._delta_dir(table_id))
                  .option("mergeSchema", "true").parquet(*paths))
            data_cols = [c for c in df.columns
                         if c not in (OP_COL, _COMMIT_SEQ, _BUCKET_COL)]
            return df.select(*data_cols, OP_COL, _COMMIT_SEQ)
        # state-diff fallback
        changed = {b for b in set(m0["buckets"]) | set(m1["buckets"])
                   if m0["buckets"].get(b) != m1["buckets"].get(b)}
        changed |= {b for b, _ in d0 ^ d1}
        old = self.read(spark, table_id, snapshot=from_snapshot)
        new = self.read(spark, table_id, snapshot=to_snapshot)
        if changed != set(m0["buckets"]) | set(m1["buckets"]):
            want = [int(b) for b in changed]
            sch = self._table_schema(table_id)
            old = old.where(self._bucket_of(old, pks, sch).isin(want))
            new = new.where(self._bucket_of(new, pks, sch).isin(want))
        data_cols = new.columns
        o = old.select(*[F.col(c).alias(f"__o_{c}") for c in data_cols])
        n = new.select(*[F.col(c).alias(f"__n_{c}") for c in data_cols])
        cond = None
        for k in pks:
            c = F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}"))
            cond = c if cond is None else (cond & c)
        j = o.join(n, on=cond, how="full_outer")
        in_old = F.col(f"__o_{pks[0]}").isNotNull()
        in_new = F.col(f"__n_{pks[0]}").isNotNull()
        non_pk = [c for c in data_cols if c not in pks]
        if non_pk:
            same = F.struct(*[F.col(f"__o_{c}") for c in non_pk]).eqNullSafe(
                F.struct(*[F.col(f"__n_{c}") for c in non_pk]))
        else:
            same = F.lit(True)
        op = (F.when(~in_old, F.lit("+I"))
              .when(~in_new, F.lit("-D"))
              .otherwise(F.lit("+U")))
        picked = [F.when(in_new, F.col(f"__n_{c}"))
                  .otherwise(F.col(f"__o_{c}")).alias(c) for c in data_cols]
        return (j.where(~in_old | ~in_new | ~same)
                .select(*picked, op.alias(OP_COL),
                        F.lit(m1["seq"]).cast("bigint").alias(_COMMIT_SEQ)))

    def merge(self, table_id: TableId, df: DataFrame, schema: Schema,
              batch_id, delete_where=None) -> None:
        """MERGE-style sugar over :meth:`write` for callers without a
        changelog envelope: every ``df`` row upserts by primary key
        (+U); rows matching ``delete_where`` (a Column) are keyed
        deletes instead — Delta/Iceberg ``MERGE INTO`` reduced to the
        sink's changelog contract."""
        clash = [c for c in (OP_COL, SEQ_COL) if c in df.columns]
        if clash:
            raise ValueError(
                f"merge() is for envelope-free DataFrames but {clash} "
                "already present — pass changelog rows to write() instead")
        op = (F.when(delete_where, F.lit("-D")).otherwise(F.lit("+U"))
              if delete_where is not None else F.lit("+U"))
        self.write(table_id,
                   df.select("*", op.alias(OP_COL),
                             F.lit(0).cast("bigint").alias(SEQ_COL)),
                   schema, batch_id)

    def maintenance(self, spark: SparkSession, table_id: TableId,
                    max_files_per_bucket: int = 8,
                    max_delta_files: int = 16, **compact_kwargs) -> bool:
        """Threshold-triggered compaction (the auto-maintenance loop a
        streaming ingestion job calls after each commit): compacts when
        any bucket holds more than ``max_files_per_bucket`` base files
        or the table has more than ``max_delta_files`` MoR delta files.
        Returns True iff a compaction ran.  Extra kwargs (``order_by``,
        ``zorder``, ``files_per_bucket``) pass through to
        :meth:`compact` so the maintenance rewrite can cluster."""
        m = self._manifest(table_id)
        n_deltas = sum(len(fs) for fs in (m.get("deltas") or {}).values())
        fat_bucket = any(len(fs) > max_files_per_bucket
                         for fs in m["buckets"].values())
        if n_deltas <= max_delta_files and not fat_bucket:
            return False
        self.compact(spark, table_id, **compact_kwargs)
        return True

    # -- refs: rollback + tags (Iceberg table refs) ------------------------
    def rollback(self, table_id: TableId, to_snapshot: int) -> int:
        """Roll the table back to an earlier snapshot by COMMITTING a new
        manifest with the old snapshot's content (Iceberg
        ``rollback_to_snapshot``): history stays intact — the bad
        snapshots remain time-travelable until vacuum — and readers
        pinned to the latest seq atomically see the restored state.
        Returns the new snapshot seq."""
        m = self._manifest(table_id, to_snapshot)  # validates membership
        return self._commit(table_id, dict(m["buckets"]),
                            deltas={k: list(v) for k, v in
                                    (m.get("deltas") or {}).items()} or None)

    def snapshot_as_of(self, table_id: TableId, ts: float) -> int:
        """The snapshot current AT wall-clock ``ts`` (epoch seconds or a
        datetime) — Iceberg's ``FOR SYSTEM_TIME AS OF``.  Resolves to the
        last snapshot whose ``committed_at`` ≤ ts; raises if the table
        had no snapshot yet at that time (or the manifests predate the
        committed_at field and were since vacuumed)."""
        import datetime as _dt

        if isinstance(ts, _dt.datetime):
            ts = ts.timestamp()
        best = None
        snap_dir = self._snap_dir(table_id)
        # raw docs, listed once: committed_at lives in the snapshot doc
        # itself, so the lookup must not materialize any sharded file
        # listing (and must not re-list the snapshot dir per snapshot)
        for s in self.snapshots(table_id):
            try:
                with open(os.path.join(snap_dir, f"{s}.json")) as f:
                    at = json.load(f).get("committed_at")
            except (OSError, ValueError):
                continue
            if at is not None and at <= ts:
                best = s
        if best is None:
            raise ValueError(
                f"{table_id}: no snapshot existed at {ts} "
                f"(have {self.snapshots(table_id)})")
        return best

    def _tags_path(self, tid: TableId) -> str:
        return os.path.join(self._table_dir(tid), "_tags.json")

    def tag(self, table_id: TableId, name: str,
            snapshot: int | None = None) -> int:
        """Name a snapshot (Iceberg tag): ``read(..., snapshot=sink.
        tag_seq(tid, name))`` pins it forever; vacuum REFUSES to expire
        tagged snapshots.  Defaults to the latest snapshot."""
        seqs = self.snapshots(table_id)
        seq = seqs[-1] if snapshot is None else snapshot
        if seq not in seqs:
            raise ValueError(f"unknown snapshot {seq}; have {seqs}")
        tags = self.tags(table_id)
        tags[name] = seq
        p = self._tags_path(table_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(tags, f)
        os.replace(tmp, p)  # atomic like every other control file
        return seq

    def tags(self, table_id: TableId) -> dict[str, int]:
        p = self._tags_path(table_id)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def tag_seq(self, table_id: TableId, name: str) -> int:
        tags = self.tags(table_id)
        if name not in tags:
            raise ValueError(f"unknown tag {name!r}; have {sorted(tags)}")
        return tags[name]

    # -- the table as a STREAM (changelog source) --------------------------
    def stream_changes(self, spark: SparkSession,
                       table_id: TableId) -> DataFrame:
        """The MoR table's changelog as a REAL Structured Streaming
        source: delta commits are append-only parquet files, so Spark's
        file stream source over ``delta/`` IS the change stream — each
        delta file processed exactly once per checkpoint, rows carrying
        ``__op`` + ``__commit_seq``.  Pair with ``foreachBatch`` to feed
        downstream incremental jobs (e.g. the signature-store dedup).
        Compaction never re-emits (it writes base files, not deltas).
        RETENTION: vacuum expires delta files with their snapshots — a
        consumer lagging more than ``vacuum(keep_last=N)`` commits
        behind loses those changes permanently (the Kafka-retention
        contract; see :meth:`vacuum`), so size keep_last to the slowest
        consumer or pin a tag it has not passed.  Batch analog:
        :meth:`read_changes`."""
        import pyspark.sql.types as T

        self._ensure_meta(table_id, create=False)
        if self.mode != "mor":
            raise ValueError(
                "stream_changes needs mode='mor' (copy-on-write commits "
                "rewrite buckets in place; use read_changes' state diff)")
        with open(self._schema_path(table_id)) as f:
            schema = Schema.from_json(f.read())
        fields = list(schema.struct_type().fields) + [
            T.StructField(OP_COL, T.StringType()),
            T.StructField(_COMMIT_SEQ, T.LongType()),
            T.StructField(_BUCKET_COL, T.IntegerType()),
        ]
        return (spark.readStream.schema(T.StructType(fields))
                .option("basePath", self._delta_dir(table_id))
                .parquet(os.path.join(self._delta_dir(table_id),
                                      f"{_BUCKET_COL}=*"))
                .drop(_BUCKET_COL))

    # -- maintenance -------------------------------------------------------
    def vacuum(self, table_id: TableId, keep_last: int = 1) -> int:
        """Delete data files referenced by NO retained snapshot and drop
        the expired manifests.  TAGGED snapshots are always retained
        (Iceberg: refs block snapshot expiration).  Returns the number
        of files removed.

        RETENTION CONTRACT for changelog consumers: ``keep_last`` is the
        delta-retention window — a ``stream_changes`` consumer lagging
        more than keep_last commits behind the head loses the vacuumed
        deltas permanently (the same contract as Kafka retention); size
        keep_last to the slowest consumer's worst-case lag, or tag a
        snapshot the consumer has not passed to block expiration."""
        if keep_last < 1:
            # seqs[-0:] is the WHOLE list — keep_last=0 silently kept
            # everything (round-9 review); at least the head must
            # survive anyway (readers need a current snapshot)
            raise ValueError("keep_last must be >= 1 (got %d)" % keep_last)
        seqs = self.snapshots(table_id)
        tagged = set(self.tags(table_id).values())
        keep = sorted(set(seqs[-keep_last:]) | (tagged & set(seqs)))
        drop = [s for s in seqs if s not in keep]
        live: set[str] = set()
        live_delta: set[str] = set()
        for s in keep:
            m = self._manifest(table_id, s)
            for files in m["buckets"].values():
                live.update(files)
            for files in (m.get("deltas") or {}).values():
                live_delta.update(files)
        # files referenced by the EXPIRED snapshots are reclaimable
        # immediately (they were committed; the snapshots aged out);
        # files referenced by NO snapshot at all may belong to an
        # in-flight commit that wrote its parquet BEFORE the atomic
        # manifest link — those get the same age grace the shard loop
        # below applies (round-9 review: reaping them immediately left
        # a racing winner's manifest referencing deleted files)
        dropped: set[str] = set()
        dropped_delta: set[str] = set()
        for s in drop:
            m = self._manifest(table_id, s)
            for files in m["buckets"].values():
                dropped.update(files)
            for files in (m.get("deltas") or {}).values():
                dropped_delta.update(files)
        removed = 0
        import time as _time

        now = _time.time()
        for root, live_set, dropped_set in (
                (self._data_dir(table_id), live, dropped),
                (self._delta_dir(table_id), live_delta, dropped_delta)):
            for b_dir in os.listdir(root) if os.path.isdir(root) else []:
                if not b_dir.startswith(f"{_BUCKET_COL}="):
                    continue
                for f in os.listdir(os.path.join(root, b_dir)):
                    rel = f"{b_dir}/{f}"
                    full = os.path.join(root, rel)
                    if not f.endswith(".parquet") or rel in live_set:
                        continue
                    if rel in dropped_set or \
                            now - os.path.getmtime(full) > 3600:
                        os.remove(full)
                        removed += 1
        for s in drop:
            os.remove(os.path.join(self._snap_dir(table_id), f"{s}.json"))
        # stats + file-list shards referenced by NO retained manifest
        # (incl. orphans from lost commit races) go with the expired
        # snapshots
        live_stats: set[str] = set()
        live_filelists: set[str] = set()
        for s in keep:
            raw = self._manifest_raw(table_id, s)
            live_stats.update(raw.get("stats_shards") or [])
            live_filelists.update((raw.get("file_shards") or {}).values())
        for sdir, live_set in ((self._stats_dir(table_id), live_stats),
                               (self._filelist_dir(table_id),
                                live_filelists)):
            for f in os.listdir(sdir) if os.path.isdir(sdir) else []:
                full = os.path.join(sdir, f)
                # age grace: an in-flight commit writes its shards BEFORE
                # the atomic manifest link — a concurrent vacuum must not
                # reap them as orphans (Iceberg's orphan-file cleanup uses
                # the same age-threshold discipline)
                if (f.endswith(".json") and f not in live_set
                        and now - os.path.getmtime(full) > 3600):
                    os.remove(full)
        return removed

    def compact(self, spark: SparkSession, table_id: TableId,
                order_by: list[str] | None = None,
                files_per_bucket: int = 1,
                zorder: list[str] | None = None,
                zorder_bits: int = 12) -> None:
        """Rewrite every live bucket and commit the result as a new
        snapshot (older snapshots keep working until vacuum).  With
        outstanding MoR deltas, folds base + deltas into fresh delta-free
        base files first (the LSM-compaction step that returns reads to
        pure scans).

        ``order_by`` CLUSTERS the rewrite (Iceberg ``rewrite_data_files``
        with a sort order / Paimon sort-compact): each bucket is
        range-partitioned into ``files_per_bucket`` files with disjoint
        ``order_by`` ranges and sorted within each file, which is what
        makes the manifest zone maps selective — a range predicate over
        the cluster key then prunes ~(1 - 1/files_per_bucket) of the
        scan before it is scheduled.

        ``zorder`` instead CLUSTERS ON MULTIPLE COLUMNS at once (Delta
        OPTIMIZE ZORDER BY): rows are range-split and sorted by a Morton
        interleave of the named columns, so a predicate on ANY of them
        prunes — the single-column sort's bounds are perfect on one
        column and useless on the others.  Mutually exclusive with
        ``order_by``."""
        if order_by and zorder:
            raise ValueError("order_by and zorder are mutually exclusive")
        self._ensure_meta(table_id, create=False)
        manifest = self._manifest(table_id)
        if manifest.get("deltas"):
            self._compact_mor(spark, table_id, manifest,
                              order_by=order_by,
                              files_per_bucket=files_per_bucket,
                              zorder=zorder, zorder_bits=zorder_bits)
            return
        zcol = None
        if zorder:
            all_paths = [os.path.join(self._data_dir(table_id), p)
                         for fs in manifest["buckets"].values() for p in fs]
            if all_paths:
                # GLOBAL min/max normalization (one bounded agg) so every
                # bucket's files share one z-space
                df_all = (spark.read
                          .option("basePath", self._data_dir(table_id))
                          .option("mergeSchema", "true").parquet(*all_paths))
                zcol = _zvalue_col(df_all, zorder, zorder_bits)
        def _rewrite_bucket(b: str, files: list[str]) -> tuple[str, list[str]]:
            paths = [os.path.join(self._data_dir(table_id), p) for p in files]
            df = (spark.read.option("basePath", self._data_dir(table_id))
                  .option("mergeSchema", "true").parquet(*paths))
            if zcol is not None:
                df = (df.withColumn("__zorder", zcol)
                      .repartitionByRange(files_per_bucket, F.col("__zorder"))
                      .sortWithinPartitions("__zorder")
                      .drop("__zorder"))
            elif order_by:
                df = (df.repartitionByRange(
                          files_per_bucket, *[F.col(c) for c in order_by])
                      .sortWithinPartitions(*order_by))
            else:
                df = df.coalesce(1)
            added_map = self._staged_write(df, self._data_dir(table_id))
            return b, added_map.get(str(b), [])

        # overlap the independent per-bucket rewrite jobs (optimization
        # r11, guide §2.6): each bucket's range-sample + clustered write
        # is a small job whose tail left the cluster idle when run
        # sequentially; _staged_write stages through a writer-unique dir
        # so concurrent rewrites cannot collide, and the manifest merge
        # below is driver-side. File layout per bucket is identical to
        # the sequential form.
        items = list(manifest["buckets"].items())
        new_buckets: dict[str, list[str]] = {}
        if len(items) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(items))) as pool:
                for b, added in pool.map(lambda kv: _rewrite_bucket(*kv),
                                         items):
                    new_buckets[b] = added
        else:
            for b, files in items:
                new_buckets[b] = _rewrite_bucket(b, files)[1]
        self._commit(table_id, new_buckets)

    def _compact_mor(self, spark: SparkSession, tid: TableId,
                     manifest: dict, order_by: list[str] | None = None,
                     files_per_bucket: int = 1,
                     zorder: list[str] | None = None,
                     zorder_bits: int = 12) -> None:
        """Fold base + delta files into new base files (one per bucket)
        and commit a delta-free snapshot.  New rows carry the compaction's
        commit sequence so later delta commits always sort after them.
        With ``order_by`` the fold commits first, then the clustered
        copy-on-write rewrite runs as a second snapshot."""
        base_paths = [os.path.join(self._data_dir(tid), p)
                      for files in manifest["buckets"].values() for p in files]
        delta_paths = [os.path.join(self._delta_dir(tid), p)
                       for files in manifest["deltas"].values() for p in files]
        merged = self._merge_read(spark, tid, base_paths, delta_paths)
        pks = self._pks(tid)
        new_seq = manifest["seq"] + 1
        rows = (merged
                .withColumn(_BUCKET_COL,
                            self._bucket_of(merged, pks,
                                            self._table_schema(tid)))
                .withColumn(_COMMIT_SEQ, F.lit(new_seq).cast("bigint")))
        # single pass (optimization r11, guide §2.4/§5): the staged
        # write's added_map is the touched-bucket set — no persist +
        # distinct().collect() pre-pass; the committed manifest matches
        # the files written by construction
        added_map = self._staged_write(
            rows.repartition(F.col(_BUCKET_COL)), self._data_dir(tid))
        new_buckets = {b: v for b, v in added_map.items() if v}
        self._commit(tid, new_buckets)
        if order_by or zorder:
            self.compact(spark, tid, order_by=order_by,
                         files_per_bucket=files_per_bucket,
                         zorder=zorder, zorder_bits=zorder_bits)

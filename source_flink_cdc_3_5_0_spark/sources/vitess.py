"""Vitess VStream source: VGTID vector offsets, shard-range routing,
reshard handling, and the VStream Debezium envelope.

Parity targets (reference ``flink-cdc-connect/flink-cdc-source-connectors/
flink-connector-vitess-cdc``):

- **Builder surface + defaults** — `VitessSource.java:43-318`: port 15991,
  decoding plugin ``decoderbufs``, connector name ``flink``, tablet type
  RDONLY, gtid ``current``, ``stopOnReshard`` false, ``tombstonesOnDelete``
  true, schema-name adjustment NONE; ``gtid`` must be set together with
  ``shard`` (builder doc at :106-117). `VitessTableFactoryTest.java:146-171`
  pins the table-factory variant (same defaults except schema adjustment
  AVRO).
- **Config enums** — `config/TabletType.java` (MASTER/REPLICA/RDONLY),
  `config/SchemaAdjustmentMode.java` (AVRO/NONE).
- **Wire behavior** the reference rides on (Debezium's public
  ``io.debezium.connector.vitess``): VTGate's VStream gRPC delivers one
  MySQL-style changelog PER SHARD; the resume position is a **VGTID — a
  vector of per-shard GTID sets** serialized as a JSON array of
  ``{keyspace, shard, gtid}``; each record's ``source`` block carries
  ``keyspace``/``table``/``shard``/``vgtid`` (keyspace stands where other
  connectors put ``db``). A *reshard* replaces a shard with children that
  tile its keyspace-id range; ``stop_on_reshard`` decides whether the
  stream halts at that boundary with a resumable VGTID or follows the new
  shard set.

Spark-first shape: the envelope decode is one ``from_json`` projection
(JVM, codegen — no Python in the decode loop); shard routing over keyspace
ids is a codegen'd CASE chain on binary comparisons; only the per-shard
resume fold and reshard detection touch the driver, and both are O(shards)
— control-plane, like the JDBC chunk metadata.

Vindex note: ``binary``, ``binary_md5`` and Vitess's default ``hash``
vindex are all real — ``hash`` is null-key DES over the big-endian uint64,
implemented from the public FIPS 46-3 tables in `functions.des_vindex` and
validated against the classic zero-key DES known-answer and the Vitess
docs' keyspace-id examples.  ``binary_md5`` is the JVM/codegen routing
path; ``hash`` routes through an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..common.events import META_COL
from .base import SEQ_COL


# ---------------------------------------------------------------------------
# config surface (VitessSource.Builder / VitessTableFactory parity)
# ---------------------------------------------------------------------------

class TabletType(enum.Enum):
    """config/TabletType.java — which tablet the VStream serves from."""

    MASTER = "MASTER"
    REPLICA = "REPLICA"
    RDONLY = "RDONLY"


class SchemaAdjustmentMode(enum.Enum):
    """config/SchemaAdjustmentMode.java — schema-name sanitization."""

    AVRO = "AVRO"
    NONE = "NONE"


@dataclass
class VitessConfig:
    """VitessSource.Builder parity (defaults pinned at VitessSource.java:
    47-59; the table factory's only divergence is schema adjustment AVRO,
    VitessTableFactoryTest.java:157)."""

    hostname: str = None
    keyspace: str = None
    port: int = 15991
    username: str | None = None
    password: str | None = None
    plugin_name: str = "decoderbufs"
    name: str = "flink"
    tablet_type: TabletType = TabletType.RDONLY
    shard: str | None = None
    gtid: str = "current"
    stop_on_reshard: bool = False
    tombstones_on_delete: bool = True
    message_key_columns: tuple[str, ...] = ()
    schema_name_adjustment: SchemaAdjustmentMode = SchemaAdjustmentMode.NONE
    table_include_list: tuple[str, ...] = ()
    table_exclude_list: tuple[str, ...] = ()
    column_include_list: tuple[str, ...] = ()
    column_exclude_list: tuple[str, ...] = ()
    dbz_properties: dict = field(default_factory=dict)

    @classmethod
    def from_options(cls, options: dict) -> "VitessConfig":
        """Table-factory option spelling (VitessTableFactory): kebab-case
        keys, ``debezium.*`` passthrough, schema adjustment defaults AVRO."""
        dbz = {k[len("debezium."):]: v for k, v in options.items()
               if k.startswith("debezium.")}
        return cls(
            hostname=options.get("hostname"),
            keyspace=options.get("keyspace"),
            port=int(options.get("port", 15991)),
            username=options.get("username"),
            password=options.get("password"),
            plugin_name=options.get("decoding.plugin.name", "decoderbufs"),
            name=options.get("name", "flink"),
            tablet_type=TabletType(options.get("tablet-type", "RDONLY")),
            shard=options.get("shard"),
            gtid=options.get("gtid", "current"),
            stop_on_reshard=str(options.get(
                "stop-on-reshard", "false")).lower() == "true",
            tombstones_on_delete=str(options.get(
                "tombstones-on-delete", "true")).lower() == "true",
            schema_name_adjustment=SchemaAdjustmentMode(
                options.get("schema-name-adjustment", "AVRO")),
            dbz_properties=dbz,
        )

    def validate(self) -> None:
        """VitessValidator analog (delegating checks the connector would
        reject: required endpoints, gtid/shard pairing, enum values)."""
        if not self.hostname:
            raise ValueError("hostname is required (VTGate VStream server)")
        if not self.keyspace:
            raise ValueError("keyspace is required")
        if not (0 < int(self.port) < 65536):
            raise ValueError("port out of range: %r" % (self.port,))
        if self.gtid not in ("current", "") and self.shard is None:
            # VitessSource.java:106-117 — a pinned GTID is per-shard
            raise ValueError(
                "gtid %r requires an explicit shard (a GTID position names "
                "one shard's stream)" % self.gtid)
        if self.plugin_name != "decoderbufs":
            raise ValueError(
                "unsupported decoding plugin %r (reference supports "
                "decoderbufs)" % self.plugin_name)


# ---------------------------------------------------------------------------
# shard ranges over the keyspace-id space
# ---------------------------------------------------------------------------

@dataclass(frozen=True, order=True)
class ShardRange:
    """One shard's keyspace-id range, named like ``-80`` / ``40-80`` /
    ``c0-`` (hex bounds, left-aligned prefixes; ``-``/``0``/`` `` is the
    single shard of an unsharded keyspace).

    Bounds are prefix BYTES compared lexicographically — correct against
    full-length keyspace ids because a strict prefix sorts before anything
    it prefixes (b"\\x80" < b"\\x80\\x00...\\x00")."""

    start: bytes  # inclusive; b"" = -inf
    end: bytes    # exclusive; b"" = +inf

    @classmethod
    def parse(cls, shard: str) -> "ShardRange":
        s = (shard or "").strip()
        if s in ("", "-", "0"):
            return cls(b"", b"")
        if "-" not in s:
            raise ValueError("not a range shard name: %r" % shard)
        lo, hi = s.split("-", 1)
        for part in (lo, hi):
            if part and (len(part) % 2 or
                         any(c not in "0123456789abcdefABCDEF" for c in part)):
                raise ValueError("bad hex bound %r in shard %r" % (part, shard))
        return cls(bytes.fromhex(lo), bytes.fromhex(hi))

    @property
    def name(self) -> str:
        if not self.start and not self.end:
            return "-"
        return "%s-%s" % (self.start.hex(), self.end.hex())

    def contains(self, keyspace_id: bytes) -> bool:
        if self.start and keyspace_id < self.start:
            return False
        if self.end and keyspace_id >= self.end:
            return False
        return True

    def covers(self, other: "ShardRange") -> bool:
        lo_ok = not self.start or (other.start and other.start >= self.start)
        hi_ok = not self.end or (other.end and other.end <= self.end)
        return bool(lo_ok and hi_ok)

    def overlaps(self, other: "ShardRange") -> bool:
        """True iff the two ranges share any keyspace id."""
        lo_clear = bool(self.end and other.start and self.end <= other.start)
        hi_clear = bool(other.end and self.start and other.end <= self.start)
        return not (lo_clear or hi_clear)


def shards_tile(shards: list[str]) -> bool:
    """True iff the shard set partitions the keyspace-id space — contiguous,
    non-overlapping, from -inf to +inf (what a healthy keyspace serves)."""
    ranges = sorted(ShardRange.parse(s) for s in shards)
    if not ranges or ranges[0].start != b"" or ranges[-1].end != b"":
        return False
    return all(a.end == b.start and a.end != b""
               for a, b in zip(ranges, ranges[1:]))


def shard_for(keyspace_id: bytes, shards: list[str]) -> str:
    """The one shard owning ``keyspace_id`` (raises if the set doesn't)."""
    owners = [s for s in shards if ShardRange.parse(s).contains(keyspace_id)]
    if len(owners) != 1:
        raise ValueError("keyspace id %s owned by %d shards of %r"
                         % (keyspace_id.hex(), len(owners), shards))
    return owners[0]


def _tiles(parent: ShardRange, children: list[ShardRange]) -> bool:
    """True iff ``children`` (sorted) tile ``parent``'s range exactly."""
    return bool(children
                and children[0].start == parent.start
                and children[-1].end == parent.end
                and all(a.end == b.start
                        for a, b in zip(children, children[1:])))


def detect_reshard(old_shards: list[str],
                   new_shards: list[str]) -> dict[str, list[str]]:
    """Shard transitions between two serving sets, ``{parent: [children]}``
    where the parent's range equals the union of the children's ranges.
    A SPLIT maps an old parent to new children; a MERGE maps a new parent
    to old children (direction is recoverable from set membership).
    Returns {} ONLY when the sets are identical; any disappearance or
    appearance not explained by a clean transition raises — a silent {}
    must never mean 'half the keyspace lost coverage'."""
    old_set, new_set = set(old_shards), set(new_shards)
    gone = sorted(ShardRange.parse(s) for s in old_set - new_set)
    added = sorted(ShardRange.parse(s) for s in new_set - old_set)
    out: dict[str, list[str]] = {}
    used_added: set[str] = set()
    used_gone: set[str] = set()
    for parent in gone:  # splits
        children = sorted(c for c in added if parent.covers(c))
        if _tiles(parent, children):
            out[parent.name] = [c.name for c in children]
            used_added |= {c.name for c in children}
            used_gone.add(parent.name)
    for parent in added:  # merges
        if parent.name in used_added:
            continue
        children = sorted(g for g in gone
                          if g.name not in used_gone and parent.covers(g))
        if _tiles(parent, children):
            out[parent.name] = [c.name for c in children]
            used_gone |= {c.name for c in children}
            used_added.add(parent.name)
    unexplained = ([g.name for g in gone if g.name not in used_gone]
                   + [a.name for a in added if a.name not in used_added])
    if unexplained:
        raise ValueError(
            "shard set change is not a clean reshard: %r -> %r "
            "(unexplained: %r)"
            % (sorted(old_set), sorted(new_set), sorted(unexplained)))
    return out


# ---------------------------------------------------------------------------
# vindexes (keyspace-id functions)
# ---------------------------------------------------------------------------

def keyspace_id(value, vindex: str = "binary_md5") -> bytes:
    """Compute a row's keyspace id with a named Vitess vindex.

    ``binary_md5`` (md5 digest of the key bytes), ``binary`` (the key bytes
    themselves), and Vitess's default ``hash`` — null-key DES over the
    big-endian uint64, implemented for real from the FIPS 46-3 tables in
    `functions.des_vindex` (validated against the classic zero-key DES KAT
    and the Vitess docs' keyspace-id examples)."""
    if vindex == "hash":
        from ..functions.des_vindex import vitess_hash

        if not isinstance(value, int):
            raise TypeError("the 'hash' vindex applies to integer keys, "
                            "got %r" % type(value).__name__)
        return vitess_hash(value)
    raw = (value if isinstance(value, (bytes, bytearray))
           else str(value).encode("utf-8"))
    if vindex == "binary_md5":
        return hashlib.md5(bytes(raw)).digest()
    if vindex == "binary":
        return bytes(raw)
    raise ValueError("unknown vindex %r" % vindex)


def keyspace_id_col(key: Column, vindex: str = "binary_md5") -> Column:
    """Column form of `keyspace_id`.  ``binary_md5``/``binary`` are JVM-side
    (codegen'd md5/unhex — no Python); the ``hash`` vindex has no built-in
    DES so it runs as an Arrow-batched pandas UDF — prefer binary_md5 when
    the routing column is on the 100-TB path."""
    if vindex == "hash":
        from ..functions.des_vindex import vitess_hash

        # the key crosses into Python as a STRING: an Arrow int64 batch
        # that contains any null becomes a float64 pandas Series, and
        # float64 silently rounds keys >= 2^53 — string round-trip keeps
        # 64-bit keys exact in every batch
        @F.pandas_udf("binary")
        def _vhash(s: pd.Series) -> pd.Series:
            return s.map(lambda n: None if pd.isna(n) else vitess_hash(int(n)))

        return _vhash(key.cast("long").cast("string"))
    raw = key.cast("binary")
    if vindex == "binary_md5":
        return F.unhex(F.md5(raw))
    if vindex == "binary":
        return raw
    raise ValueError("vindex %r has no column form" % vindex)


def shard_col(ksid: Column, shards: list[str]) -> Column:
    """Route keyspace ids to shard names JVM-side: a CASE chain of binary
    comparisons (Spark compares BinaryType lexicographically unsigned —
    the same order the prefix bounds are defined in).  O(shards) whens,
    codegen'd; at 100 TB the routing is pure whole-stage compute."""
    expr = F.lit(None).cast("string")
    for s in sorted(shards, key=lambda s: ShardRange.parse(s)):
        r = ShardRange.parse(s)
        cond = F.lit(True)
        if r.start:
            cond = cond & (ksid >= F.lit(r.start))
        if r.end:
            cond = cond & (ksid < F.lit(r.end))
        expr = F.when(cond, F.lit(s)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# VGTID — the vector offset
# ---------------------------------------------------------------------------

def _parse_gtid_set(gtid: str) -> dict[str, list[tuple[int, int]]]:
    """MySQL GTID set ``uuid:1-100:200,uuid2:5`` -> {uuid: [(lo, hi)...]};
    an optional ``MySQL56/`` flavor prefix (Vitess position spelling) is
    stripped. ``current``/empty parse to {} (no position)."""
    s = (gtid or "").strip()
    if "/" in s:
        s = s.split("/", 1)[1]
    if s in ("", "current"):
        return {}
    out: dict[str, list[tuple[int, int]]] = {}
    for part in s.split(","):
        bits = part.strip().split(":")
        uuid, intervals = bits[0], bits[1:]
        if not intervals:
            raise ValueError("GTID %r has no intervals" % part)
        for iv in intervals:
            lo, _, hi = iv.partition("-")
            out.setdefault(uuid, []).append((int(lo), int(hi or lo)))
    return {u: sorted(v) for u, v in out.items()}


def gtid_covers(a: str, b: str) -> bool:
    """True iff GTID set ``a`` contains every transaction of ``b``."""
    sa, sb = _parse_gtid_set(a), _parse_gtid_set(b)
    for uuid, ivs in sb.items():
        mine = sa.get(uuid, [])
        for lo, hi in ivs:
            n = lo
            for mlo, mhi in mine:
                if mlo <= n and n <= mhi:
                    n = mhi + 1
                if n > hi:
                    break
            if n <= hi:
                return False
    return True


@dataclass(frozen=True)
class ShardGtid:
    keyspace: str
    shard: str
    gtid: str


@dataclass(frozen=True)
class Vgtid:
    """A VStream resume position: one GTID set per shard, serialized as the
    JSON array Debezium stores in its offsets and stamps into
    ``source.vgtid``."""

    shard_gtids: tuple[ShardGtid, ...]

    @classmethod
    def from_json(cls, s: str) -> "Vgtid":
        return cls(tuple(ShardGtid(d["keyspace"], d["shard"], d["gtid"])
                         for d in json.loads(s)))

    def to_json(self) -> str:
        return json.dumps(
            [{"keyspace": g.keyspace, "shard": g.shard, "gtid": g.gtid}
             for g in self.shard_gtids], separators=(",", ":"))

    @classmethod
    def current(cls, keyspace: str, shards: list[str]) -> "Vgtid":
        """gtid=``current`` startup: stream from each shard's present head."""
        return cls(tuple(ShardGtid(keyspace, s, "current") for s in shards))

    def shards(self) -> list[str]:
        return [g.shard for g in self.shard_gtids]

    def position(self, shard: str, keyspace: str | None = None) -> str | None:
        """This VGTID's position for ``shard`` (optionally pinned to one
        keyspace — shard NAMES like ``-80`` repeat across keyspaces, so a
        multi-keyspace VGTID must always pass ``keyspace``)."""
        for g in self.shard_gtids:
            if g.shard == shard and (keyspace is None
                                     or g.keyspace == keyspace):
                return g.gtid
        return None

    def advance(self, keyspace: str, shard: str, gtid: str) -> "Vgtid":
        """Replace (or add) one (keyspace, shard) position — what each
        decoded event's ``source.vgtid`` does to the running offset.  Keyed
        by BOTH fields: ``-80`` in ks1 and ``-80`` in ks2 are different
        streams and must not clobber each other."""
        rest = tuple(g for g in self.shard_gtids
                     if not (g.keyspace == keyspace and g.shard == shard))
        return Vgtid(tuple(sorted(
            rest + (ShardGtid(keyspace, shard, gtid),),
            key=lambda g: (g.keyspace, g.shard))))

    def covers(self, other: "Vgtid") -> bool:
        """Per-(keyspace, shard) GTID-set containment: this position has
        processed everything ``other`` has."""
        return all(
            self.position(g.shard, g.keyspace) is not None
            and gtid_covers(self.position(g.shard, g.keyspace), g.gtid)
            for g in other.shard_gtids)

    def reshard(self, mapping: dict[str, list[str]],
                keyspace: str | None = None) -> "Vgtid":
        """Apply a parent->children reshard: children start at their
        parent's position (Vitess copies the GTID through the split).
        ``keyspace`` scopes the mapping — shard names repeat across
        keyspaces, so a multi-keyspace VGTID must always pass it; a child
        that already has its own entry keeps it (never clobbered by the
        parent copy)."""
        existing = {(g.keyspace, g.shard) for g in self.shard_gtids}
        out = []
        for g in self.shard_gtids:
            if g.shard in mapping and (keyspace is None
                                       or g.keyspace == keyspace):
                out += [ShardGtid(g.keyspace, c, g.gtid)
                        for c in mapping[g.shard]
                        if (g.keyspace, c) not in existing]
            else:
                out.append(g)
        return Vgtid(tuple(sorted(out, key=lambda g: (g.keyspace, g.shard))))


# ---------------------------------------------------------------------------
# VStream envelope decode (Debezium vitess layout)
# ---------------------------------------------------------------------------

def decode_vstream(raw: DataFrame, payload_schema: T.StructType,
                   value_col: str = "value") -> DataFrame:
    """VStream Debezium-JSON -> engine changelog envelope.

    The envelope mechanics (single ``from_json`` projection, op map, seq
    fallback, zoned-timestamp side channels) are shared with
    `decode_debezium` via `decode_dbz_envelope` — only the ``source``
    block differs: VStream carries keyspace/shard/vgtid instead of
    db/schema (kept in ``__meta`` so the per-shard resume fold and reshard
    policy can read them).  Tombstones (the null-value record after a
    delete when ``tombstones_on_delete``) parse to op-less rows and are
    dropped — they exist for Kafka log compaction, not the changelog."""
    from .debezium import decode_dbz_envelope

    return decode_dbz_envelope(
        raw, payload_schema, value_col,
        source_fields=["keyspace", "table", "shard", "vgtid"],
        meta_entries=[("ts_ms", "ts_ms"), ("keyspace", "source.keyspace"),
                      ("table", "source.table"), ("shard", "source.shard"),
                      ("vgtid", "source.vgtid")],
        drop_opless=True,
    )


def _positions_agg(df: DataFrame, shard: Column, keyspace: Column,
                   vgtid: Column, seq: Column) -> list:
    """The shared per-(shard, keyspace) last-position aggregation.  ``seq``
    breaks ties with (length, lexicographic) on the vgtid string — a
    shard's GTID set only grows, so on the file path (where ``seq`` is
    millisecond ``ts_ms`` and same-ms ties are common) the longer/later
    spelling is the later position; without this, max_by could regress the
    resume point inside one millisecond.  O(shards) rows collected — the
    same control-plane class as Kafka offset commits."""
    return (df
            .where(shard.isNotNull())
            .groupBy(shard.alias("shard"),
                     # a missing source.keyspace must not fork a None group
                     # alongside the real keyspaces (unsortable state keys,
                     # bypassed reshard policy) — normalize to ""
                     F.coalesce(keyspace, F.lit("")).alias("keyspace"))
            .agg(F.max_by(vgtid, F.struct(seq, F.length(vgtid), vgtid))
                 .alias("vgtid"))
            .collect())


def _shard_positions(decoded: DataFrame) -> list:
    """`_positions_agg` over a DECODED micro-batch (``__meta`` map)."""
    return _positions_agg(
        decoded, F.col(META_COL)["shard"], F.col(META_COL)["keyspace"],
        F.col(META_COL)["vgtid"], F.col(SEQ_COL))


def _raw_shard_positions(raw: DataFrame, value_col: str) -> list:
    """`_positions_agg` straight off RAW VStream JSON — the streaming
    runner's offset fold, which must not depend on any table's payload
    schema (one pass over the whole micro-batch covers every table)."""
    v = F.col(value_col)
    return _positions_agg(
        raw,
        F.get_json_object(v, "$.source.shard"),
        F.get_json_object(v, "$.source.keyspace"),
        F.get_json_object(v, "$.source.vgtid"),
        F.get_json_object(v, "$.ts_ms").cast("long"))


def _fold_positions(rows: list, start: Vgtid,
                    skip: set | None = None) -> Vgtid:
    """Fold per-shard last positions into ``start`` — MONOTONE: a shard's
    entry only advances when the incoming GTID set is not already covered
    by the current one.  The in-batch max_by tie-break is a heuristic
    ((length, lex) of the spelling — a gap-fill like ``1-5:7 -> 1-7`` can
    shorten it), so the clamp here is what guarantees the persisted resume
    point never moves backwards; a heuristic mis-pick inside one batch
    costs at most re-delivery of the gap transactions (at-least-once,
    absorbed by the keyed sinks).

    ``skip``: (keyspace, shard) pairs to ignore — recently RETIRED shards,
    whose straggler positions must not resurrect entries the topology
    surgery already removed."""
    out = start
    for r in rows:
        if r["vgtid"] is None:
            continue
        ks = r["keyspace"] or ""  # None-keyspace rows group under ""
        if skip and (ks, r["shard"]) in skip:
            continue
        wire = Vgtid.from_json(r["vgtid"])
        pos = wire.position(r["shard"], ks) or wire.position(r["shard"])
        if pos is None:
            continue
        cur = out.position(r["shard"], ks)
        if cur is not None and gtid_covers(cur, pos):
            continue  # never regress below the running state
        out = out.advance(ks, r["shard"], pos)
    return out


def batch_vgtid(decoded: DataFrame, start: Vgtid) -> Vgtid:
    """Fold a decoded micro-batch into the resume VGTID: per (keyspace,
    shard), the ``source.vgtid`` of that shard's LAST event (by ``__seq``)
    replaces the shard's position."""
    return _fold_positions(_shard_positions(decoded), start)


def _classify_new_shards(known_shards: list[str], new: list[str]):
    """Classify never-seen shard names against the serving set.

    Returns ``(splits, merged_children, claimed, still_pending,
    discovered)``: ``splits`` maps a known parent to new children that
    tile it exactly; ``merged_children`` are known shards replaced by a
    covering new merge parent; ``claimed`` is every new shard explained as
    split child or merge parent; ``still_pending`` are split children
    whose quiet siblings haven't emitted yet (NOT an error — micro-batch
    boundaries give no same-batch guarantee); ``discovered`` are new
    shards overlapping NO known shard — late first contact (a shard with
    no traffic when the stream attached), adopted directly.  Only a shard
    that overlaps the known set without a clean split/merge explanation
    raises."""
    added = [ShardRange.parse(s) for s in new]
    splits: dict[str, list[str]] = {}
    claimed: set[str] = set()
    still_pending: set[str] = set()
    for p in known_shards:
        pr = ShardRange.parse(p)
        children = sorted(c for c in added if pr.covers(c))
        if not children:
            continue
        if _tiles(pr, children):
            splits[p] = [c.name for c in children]
            claimed |= {c.name for c in children}
        else:  # quiet siblings — defer adoption, don't crash the stream
            still_pending |= {c.name for c in children}
    merged_children: set[str] = set()
    discovered: set[str] = set()
    known_ranges = [ShardRange.parse(k) for k in known_shards]
    for c in added:
        if c.name in claimed or c.name in still_pending:
            continue
        parts = sorted(pr for pr in known_ranges if c.covers(pr))
        if _tiles(c, parts):
            merged_children |= {p.name for p in parts}
            claimed.add(c.name)
        elif not any(c.overlaps(kr) for kr in known_ranges):
            discovered.add(c.name)
    orphan = sorted(set(new) - claimed - still_pending - discovered)
    if orphan:
        raise ValueError(
            "shard(s) %r appeared without a clean parent split or merge "
            "from %r" % (orphan, sorted(known_shards)))
    return splits, merged_children, claimed, still_pending, discovered


@dataclass
class ReshardDecision:
    """Outcome of `apply_reshard_policy` for one micro-batch."""

    df: DataFrame                  # events to process this batch
    shards: list[str]              # serving shard set after the batch
    stopped: bool = False          # stop_on_reshard fired
    resume_vgtid: Vgtid | None = None  # resumable position when stopped
    pending: tuple[str, ...] = ()  # split children whose siblings are quiet


def apply_reshard_policy(decoded: DataFrame, known_shards: list[str],
                         start: Vgtid, *, stop_on_reshard: bool = False,
                         pending: tuple[str, ...] = (),
                         keyspace: str | None = None) -> ReshardDecision:
    """VitessSource's ``stopOnReshard`` semantics over one decoded
    micro-batch — the single-keyspace DataFrame wrapper around the same
    `advance_stream_state` transition the streaming runner persists
    (one implementation; this API only adds the DataFrame plumbing).

    ``stop_on_reshard=True`` HALTS: the returned ``df`` is EMPTY — nothing
    from the boundary batch is processed, so the resumable VGTID is the
    last COMMITTED position with completed-split children inheriting their
    parent's entry; the caller re-delivers the whole batch after the
    restart that adopts the children (replay-idempotent sinks absorb any
    overlap).  ``False`` (default) adopts the new serving set — split
    children (with quiet siblings deferring via ``pending``), merge
    parents, and late-discovered non-overlapping shards — and processes
    everything."""
    rows = _shard_positions(decoded)
    if keyspace is None:
        kss = sorted({r["keyspace"] for r in rows if r["keyspace"]})
        if len(kss) > 1:
            raise ValueError(
                "batch spans keyspaces %r: pass keyspace= to scope "
                "known_shards" % kss)
        keyspace = kss[0] if kss else ""
    state = VitessStreamState(
        vgtid=start,
        serving=((keyspace, tuple(known_shards)),),
        pending=tuple((keyspace, s) for s in pending))
    res, halt = advance_stream_state(rows, state,
                                     stop_on_reshard=stop_on_reshard)
    out_pending = tuple(sorted(s for ks, s in res.pending
                               if ks == keyspace))
    if halt:
        # informational resume vector: completed-split children inherit
        # the parent's COMMITTED entry (the state itself stays untouched —
        # the caller re-delivers the batch after restart, and the adopt
        # path performs the real surgery then)
        seen = sorted({r["shard"] for r in rows})
        new = sorted((set(seen) | set(pending)) - set(known_shards))
        splits = _classify_new_shards(list(known_shards), new)[0]
        return ReshardDecision(
            df=decoded.limit(0), shards=list(known_shards), stopped=True,
            resume_vgtid=start.reshard(splits, keyspace=keyspace),
            pending=out_pending)
    return ReshardDecision(
        df=decoded, shards=list(res.serving_map().get(keyspace, ())),
        resume_vgtid=None, pending=out_pending)


# ---------------------------------------------------------------------------
# streaming-runner integration: persisted VGTID offset + stopOnReshard
# ---------------------------------------------------------------------------

class StopOnReshardHalt(RuntimeError):
    """Raised by the streaming runner when ``stop_on_reshard`` fires.

    Raising (instead of returning) FAILS the micro-batch before any sink
    write, so Spark does NOT commit the epoch: the boundary batch
    re-delivers in full after the operator restarts the pipeline — no
    event of the boundary batch is ever lost, and nothing was written
    under the old topology to duplicate.  The restart arms ``resuming``:
    the re-delivered batch (and any cascade until the stream steadies)
    is ADOPTED rather than re-halted, so the halt fires exactly once per
    reshard instead of livelocking on its own re-delivery."""


#: How many micro-batches a retired shard (split parent / merged child)
#: stays remembered.  Within the window its straggler events are ignored
#: by the control plane (no merge-misclassification, no entry
#: resurrection — cutover stragglers arrive within seconds); after the
#: window the name is forgotten so a later reshard may legitimately
#: REVIVE it (ping-pong reshards recreate shard names).  A reshard
#: reverted within the window is indistinguishable from stragglers by
#: name alone — the operator waits out the window (documented ambiguity).
RETIRE_WINDOW = 8


def _validate_disjoint(shards, what: str) -> None:
    rs = sorted(ShardRange.parse(s) for s in shards)
    for a, b in zip(rs, rs[1:]):
        if a.overlaps(b):
            raise ValueError("%s has overlapping shards %r / %r"
                             % (what, a.name, b.name))


@dataclass(frozen=True)
class VitessStreamState:
    """The connector state the streaming runner persists per checkpoint —
    the analog of the reference's Debezium offset-store entry (one VGTID)
    plus per-KEYSPACE serving shard sets, in-flight partial splits, and a
    short memory of recently retired shards (shard names repeat across
    keyspaces, so everything is keyspace-scoped — same reason `Vgtid`
    keys on both).

    ``stopped=True`` marks a halted ``stop_on_reshard`` stream: the state
    is otherwise UNTOUCHED (the boundary batch was not processed, so
    nothing may advance); the operator restart clears the flag and sets
    ``resuming``, under which the re-delivered batch adopts the reshard.
    ``batches`` counts folded micro-batches — the clock for the
    `RETIRE_WINDOW` straggler memory."""

    vgtid: Vgtid = Vgtid(())
    serving: tuple = ()   # ((keyspace, (shard, ...)), ...)
    pending: tuple = ()   # ((keyspace, shard), ...)
    retired: tuple = ()   # ((keyspace, shard, retired_at_batch), ...)
    batches: int = 0
    stopped: bool = False
    resuming: bool = False

    @property
    def shards(self) -> tuple:
        """Union of serving shard names across keyspaces (the convenient
        single-keyspace view — the common connector config)."""
        return tuple(sorted({s for _, shs in self.serving for s in shs}))

    def serving_map(self) -> dict:
        return {ks: tuple(shs) for ks, shs in self.serving}

    def to_json(self) -> str:
        return json.dumps({
            "vgtid": json.loads(self.vgtid.to_json()),
            "serving": {ks: list(shs) for ks, shs in self.serving},
            "pending": [list(p) for p in self.pending],
            "retired": [list(r) for r in self.retired],
            "batches": self.batches,
            "stopped": self.stopped,
            "resuming": self.resuming}, separators=(",", ":"),
            sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "VitessStreamState":
        d = json.loads(s)
        # tolerate the earlier flat-shard-list format: entries that don't
        # fit the keyspace-scoped shape are dropped and the serving
        # baseline re-bootstraps from the next batch (one-way upgrade)
        pending = tuple(sorted(
            (p[0], p[1]) for p in d.get("pending", ())
            if isinstance(p, (list, tuple)) and len(p) == 2))
        retired = tuple(sorted(
            (r[0], r[1], int(r[2])) for r in d.get("retired", ())
            if isinstance(r, (list, tuple)) and len(r) == 3))
        return cls(
            vgtid=Vgtid.from_json(json.dumps(d.get("vgtid", []))),
            serving=tuple(sorted((ks, tuple(shs))
                                 for ks, shs in d.get("serving", {}).items())),
            pending=pending, retired=retired,
            batches=int(d.get("batches", 0)),
            stopped=bool(d.get("stopped", False)),
            resuming=bool(d.get("resuming", False)))


def fold_vstream_batch(raw: DataFrame, value_col: str,
                       state: VitessStreamState, *,
                       stop_on_reshard: bool = False,
                       ) -> tuple[VitessStreamState, bool]:
    """Advance the persisted Vitess stream state over one RAW micro-batch.

    Returns ``(new_state, halt)``.  ``halt=True`` is the stop-at-reshard
    boundary: the caller must NOT process ANY of this batch — persist the
    returned ``stopped`` state (otherwise identical: nothing advanced),
    then fail the batch so its epoch is not committed
    (`StopOnReshardHalt`); after the operator restart (which arms
    ``resuming``) the re-delivered batch adopts the reshard and replays
    in full.

    One raw-JSON aggregation per batch (`_raw_shard_positions`) — no
    payload schema needed, so the fold covers every table in the batch in
    a single pass and runs BEFORE per-table decode.  The state transition
    itself is the pure `advance_stream_state` (property-tested without
    Spark)."""
    return advance_stream_state(_raw_shard_positions(raw, value_col),
                                state, stop_on_reshard=stop_on_reshard)


def advance_stream_state(rows: list, state: VitessStreamState, *,
                         stop_on_reshard: bool = False,
                         ) -> tuple[VitessStreamState, bool]:
    """The pure state transition behind `fold_vstream_batch`: ``rows`` are
    per-(shard, keyspace) last-position mappings (anything supporting
    ``r["shard"]``/``r["keyspace"]``/``r["vgtid"]``), processed
    per-keyspace.

    First contact with a keyspace adopts the shards actually seen as the
    baseline — WITHOUT requiring them to tile (gtid ``current`` startup
    has no shard list until the stream speaks, and a shard with no
    traffic in the first window must not poison the stream): late
    arrivals that overlap nothing are adopted as ``discovered`` and never
    trigger a halt; only an overlapping-but-unexplained shard set raises.
    The serving-set invariant maintained here is pairwise DISJOINTNESS;
    full tiling holds once every live shard has spoken.

    Shards retired by a completed transition (split parents, merged
    children) are remembered for `RETIRE_WINDOW` batches: their straggler
    events are ignored by the control plane — without this, a late
    parent event after an adopted split reclassifies as a MERGE and
    flip-flops the serving set backwards.  After the window the name may
    be revived by a later reshard.

    ``stop_on_reshard=True`` halts (state unchanged + ``stopped``) when a
    split or merge is detected — unless ``state.resuming`` (armed by the
    operator restart after a halt), under which the transition is
    adopted; ``resuming`` disarms once a batch is steady."""
    if not rows:
        return state, False
    n = state.batches + 1
    active_retired = {(ks, sh) for ks, sh, at in state.retired
                      if n - at <= RETIRE_WINDOW}
    serving = state.serving_map()
    pending: dict = {}
    for ks, sh in state.pending:
        pending.setdefault(ks, set()).add(sh)
    by_ks: dict = {}
    for r in rows:
        by_ks.setdefault(r["keyspace"] or "", []).append(r)
    # pass 1: classify every keyspace BEFORE any fold — a halt must leave
    # the persisted position untouched (the batch will not be processed)
    plans: dict = {}
    resharding = False
    for ks, krows in sorted(by_ks.items()):
        seen = sorted({r["shard"] for r in krows
                       if (ks, r["shard"]) not in active_retired})
        known = serving.get(ks)
        if known is None:
            if seen:
                _validate_disjoint(seen, "first-contact serving set")
                plans[ks] = ("bootstrap", seen)
            continue
        new = sorted((set(seen) | pending.get(ks, set())) - set(known))
        if not new:
            plans[ks] = ("steady", None)
            continue
        payload = _classify_new_shards(list(known), new)
        plans[ks] = ("reshard", payload)
        splits, merged_children, _claimed, still_pending, _disc = payload
        if splits or merged_children or still_pending:
            resharding = True  # discovery alone is not a reshard
    if stop_on_reshard and resharding and not state.resuming:
        # halt: nothing advances — the re-delivered batch (post-restart,
        # resuming armed) performs the adoption below
        return VitessStreamState(
            vgtid=state.vgtid, serving=state.serving,
            pending=state.pending, retired=state.retired,
            batches=state.batches, stopped=True), True
    vg = _fold_positions(rows, state.vgtid, skip=active_retired)
    new_serving = dict(serving)
    # pending for keyspaces silent this batch carries over untouched
    new_pending = {ks: set(v) for ks, v in pending.items()
                   if ks not in by_ks}
    retire_now: list = []
    for ks, (kind, payload) in plans.items():
        if kind == "bootstrap":
            new_serving[ks] = tuple(payload)
            continue
        if kind == "steady":
            continue
        splits, merged_children, claimed, still_pending, discovered = payload
        after = sorted((set(new_serving[ks]) - set(splits) - merged_children)
                       | claimed | discovered)
        _validate_disjoint(after, "post-reshard serving set")
        # completed split: quiet children inherit the parent's position (a
        # child that already spoke keeps its own), parent entry retires;
        # merge: the old children's entries retire (the merge parent's
        # entry was folded from its own events) — all scoped to this ks
        entries = {(g.keyspace, g.shard): g.gtid for g in vg.shard_gtids}
        for parent, children in splits.items():
            gt = entries.pop((ks, parent), None)
            if gt is not None:
                for c in children:
                    entries.setdefault((ks, c), gt)
            retire_now.append((ks, parent))
        for sh in merged_children:
            entries.pop((ks, sh), None)
            retire_now.append((ks, sh))
        vg = Vgtid(tuple(sorted(
            (ShardGtid(k, s, g) for (k, s), g in entries.items()),
            key=lambda g: (g.keyspace, g.shard))))
        new_serving[ks] = tuple(after)
        if still_pending:
            new_pending[ks] = set(still_pending)
    retired = tuple(sorted(
        [(ks, sh, at) for ks, sh, at in state.retired
         if (ks, sh) in active_retired]
        + [(ks, sh, n) for ks, sh in retire_now]))
    pending_flat = tuple(sorted((ks, s) for ks, v in new_pending.items()
                                for s in v))
    still_resuming = state.resuming and (resharding or bool(pending_flat))
    return VitessStreamState(
        vgtid=vg,
        serving=tuple(sorted((ks, tuple(sorted(shs)))
                             for ks, shs in new_serving.items())),
        pending=pending_flat, retired=retired, batches=n,
        resuming=still_resuming), False

"""MongoDB change-stream codec + sample-bucket snapshot splitter.

Parity targets (reference `flink-cdc-connect/flink-cdc-source-connectors/
flink-connector-mongodb-cdc`):

- **Upsert changelog decode** — `MongoDBConnectorDeserializationSchema.java:
  125-170`: `insert` -> +I with ``fullDocument``; `delete` -> -D carrying only
  ``documentKey`` (MongoDB ships no deleted image); `update`/`replace` -> +U
  with ``fullDocument`` and NO before-image (``update`` whose post-lookup
  ``fullDocument`` is null — the document was deleted before the lookup — is
  dropped, reference comment at :148-152); collection-level events
  (`drop`/`rename`/`dropDatabase`/`invalidate`/`other`) are ignored. The
  result is an UPSERT changelog (no -U events) that downstream state needs to
  normalize — Flink plants a ChangelogNormalize; ours is
  `streaming.materialize.changelog_normalize`.
- **Full-changelog decode** — `MongoDBConnectorFullChangelogDeserializationSchema
  .java:60-130` (pre/post images enabled on MongoDB >= 6.0):
  ``fullDocumentBeforeChange`` supplies the -U/before image for update/replace
  and the carried image for deletes.
- **Envelope field names** — `internal/MongoDBEnvelope.java:47-85`
  (``_id._data`` resume token, ``clusterTime``, ``fullDocument``,
  ``documentKey``, ``operationType``, ``ns.db``/``ns.coll``).
- **Sample-bucket splitter** — `source/assigners/splitters/
  SampleBucketSplitStrategy.java:83-170`: collections whose key is not a
  numeric range (ObjectId/UUID/string `_id`) are split by *sampling*: draw
  ``numChunks x samplesPerChunk`` keys (full scan below a 102400-doc
  threshold), `$bucketAuto` them into equal-count buckets, and emit
  [sentinel-min, b0), [b0, b1) ... [bk, sentinel-max] splits — chunk sizes
  then track the observed key distribution, not the key arithmetic. The
  Spark mapping computes the equal-count cut points with a window rank over
  the *sample only* (bounded control-plane) and returns `ChunkRange`s.

Everything data-plane is built-in ``from_json`` + column expressions —
JVM-side, codegen'd; no Python in the decode loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from ..common.events import BEFORE_COL, META_COL, OP_COL
from .base import SEQ_COL
from .jdbc import ChunkRange

#: operationType -> engine op (MongoDBConnectorDeserializationSchema switch).
#: `update` with a null fullDocument and every collection-level type is
#: dropped by the decoder, so no entry here.
_MONGO_OPS = {"insert": "+I", "update": "+U", "replace": "+U", "delete": "-D"}

#: document count below which the reference samples the whole collection
#: (SampleBucketSplitStrategy.DEFAULT_SAMPLING_THRESHOLD).
SAMPLING_THRESHOLD = 102400


def mongo_changestream_schema(payload: T.StructType,
                              key_fields: tuple[str, ...] = ("_id",)
                              ) -> T.StructType:
    """Wire schema of one change-stream document (MongoDBEnvelope.java:47-85).

    ``documentKey`` carries only the shard-key/_id fields.  ``clusterTime``
    is NOT in the typed schema: real change streams ship it as a BSON
    Timestamp (extended JSON ``{"$timestamp": {"t": secs, "i": inc}}``)
    while simplified fixtures use plain epoch-seconds — a single from_json
    type can't hold both, so the decoder probes the raw string for either
    form (`_cluster_time_cols`).
    """
    key_struct = T.StructType(
        [f for f in payload.fields if f.name in key_fields])
    return T.StructType([
        T.StructField("_id", T.StructType(
            [T.StructField("_data", T.StringType(), True)]), True),
        T.StructField("operationType", T.StringType(), True),
        T.StructField("fullDocument", payload, True),
        T.StructField("fullDocumentBeforeChange", payload, True),
        T.StructField("documentKey", key_struct, True),
        T.StructField("ns", T.StructType([
            T.StructField("db", T.StringType(), True),
            T.StructField("coll", T.StringType(), True),
        ]), True),
    ])


def _cluster_time_cols(value: Column) -> tuple[Column, Column]:
    """(epoch-seconds, BSON-Timestamp-long) from the raw document string.

    Accepts BOTH wire forms: extended-JSON ``{"$timestamp":{"t":s,"i":n}}``
    (what real change streams ship) and a bare epoch-seconds integer
    (simplified fixtures).  The long form is ``(t << 32) | i`` — BSON
    Timestamp's own 64-bit ordering, which keeps same-second events on one
    document totally ordered by the server-assigned increment; a bare
    seconds value shifts into the same scale with i = 0.

    One full-document parse extracts the raw ``clusterTime`` snippet; the
    t/i probes then parse only that snippet (vs three full-doc parses)."""
    raw = F.get_json_object(value, "$.clusterTime")
    t = F.get_json_object(raw, "$['$timestamp'].t").cast("long")
    i = F.get_json_object(raw, "$['$timestamp'].i").cast("long")
    secs = F.coalesce(t, raw.cast("long"))
    return secs, (F.shiftleft(secs, 32)
                  + F.coalesce(i, F.lit(0)).cast("long"))


def decode_mongo_changestream(raw: DataFrame, payload_schema: T.StructType,
                              key_fields: tuple[str, ...] = ("_id",),
                              full_changelog: bool = False,
                              value_col: str = "value") -> DataFrame:
    """Change-stream JSON -> engine changelog envelope.

    Upsert mode (default, reference's changelog-mode `upsert`): deletes carry
    the ``documentKey`` fields with every other column null — exactly what
    MongoDB ships — and updates have no before-image. Run the result through
    `changelog_normalize` before any consumer that needs retractions or full
    delete images (sink merges, `incremental_agg` with before-values).

    ``full_changelog=True`` (collections with pre/post images, MongoDB 6.0+)
    additionally reads ``fullDocumentBeforeChange``: +U rows gain a
    ``__before`` struct and -D rows carry the full deleted image when the
    before image is present (reference FullChangelog variant).

    Seq: the Kafka/file ``offset`` column when present, else the BSON
    Timestamp long ``(t << 32) | i`` (ResumeTokenUtils.decodeTimestamp
    parity; the increment keeps same-second events on one document totally
    ordered — plain epoch-seconds would tie a delete with a reinsert in the
    same second and lose the reinsert to `latest_image`'s tie-break).
    """
    env = mongo_changestream_schema(payload_schema, key_fields)
    has_offset = "offset" in raw.columns
    val = F.col(value_col).cast("string")
    ct_secs, ct_long = _cluster_time_cols(val)
    parsed = raw.select(
        F.from_json(val, env).alias("v"),
        ct_secs.alias("__ct_secs"), ct_long.alias("__ct_long"),
        # parse ONCE (optimization r11): the non-deterministic barrier,
        # referenced by the keep-filter below, stops PushDownPredicates
        # from substituting from_json(...) into the filter under this
        # projection — without it every row paid the envelope parse twice
        # (once in the pushed filter, once here); see db2.py.
        F.spark_partition_id().alias("__pushdown_barrier"),
        *([F.col("offset")] if has_offset else []),
    )
    otype = F.col("v.operationType")
    keep = otype.isin(*_MONGO_OPS)
    # reference :148-152 — update whose post-lookup fullDocument vanished
    keep = keep & ~((otype == "update") & F.col("v.fullDocument").isNull())
    # always-false disjunct: keeps the predicate semantics, blocks pushdown
    parsed = parsed.where(keep | (F.col("__pushdown_barrier") < F.lit(-1)))

    op = F.coalesce(
        *[F.when(otype == k, F.lit(v)) for k, v in _MONGO_OPS.items()])
    # delete image: documentKey null-filled into the payload shape — unless
    # full-changelog mode has the real before image
    key_image = F.struct(*[
        F.col(f"v.documentKey.{f.name}").alias(f.name)
        if f.name in key_fields else
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in payload_schema.fields])
    del_image = key_image
    if full_changelog:
        del_image = F.coalesce(F.col("v.fullDocumentBeforeChange"), key_image)
    image = F.when(otype == "delete", del_image).otherwise(F.col("v.fullDocument"))
    before = (
        F.when((op == "+U") & F.col("v.fullDocumentBeforeChange").isNotNull(),
               F.col("v.fullDocumentBeforeChange"))
        if full_changelog else F.lit(None).cast(payload_schema))
    seq = F.col("offset") if has_offset else F.col("__ct_long")
    out = parsed.select(
        image.alias("__row"),
        op.alias(OP_COL),
        before.alias(BEFORE_COL),
        F.map_from_arrays(
            F.array(F.lit("db"), F.lit("coll"), F.lit("ts_ms"),
                    F.lit("resume_token")),
            F.array(F.col("v.ns.db"), F.col("v.ns.coll"),
                    (F.col("__ct_secs") * 1000).cast("string"),
                    F.col("v._id._data")),
        ).alias(META_COL),
        seq.cast("bigint").alias(SEQ_COL),
    )
    return out.select("__row.*", OP_COL, BEFORE_COL, META_COL, SEQ_COL)


def sample_bucket_chunks(df: DataFrame, key_col: str, *,
                         size_in_bytes: int, chunk_size_mb: int = 64,
                         doc_count: int | None = None,
                         samples_per_chunk: int = 20,
                         sampling_threshold: int = SAMPLING_THRESHOLD,
                         assign_unbounded_chunk_first: bool = False,
                         seed: int = 42) -> list[ChunkRange]:
    """Split a collection into key ranges by sampling (SampleBucketSplitStrategy).

    - whole collection smaller than one chunk -> single unbounded chunk
      (SingleSplitStrategy, :86-89);
    - ``numChunks = size/chunkSize + 1``; sample the whole key column below
      ``sampling_threshold`` docs, else ``numChunks*samples_per_chunk`` keys
      (:91-100);
    - equal-count cut points over the sorted sample (the `$bucketAuto`
      analog), emitted as [None, c0), [c0, c1) ... [ck, None) — the two
      sentinel-bounded end splits match ChunkUtils.minLowerBoundOfId /
      maxUpperBoundOfId (:129-160);
    - ``assign_unbounded_chunk_first`` moves the trailing unbounded split to
      the front (:163-167) — it is the one still growing under live writes,
      so assigning it first shrinks the stream-backfill overlap window.

    Scale posture: the only multi-row driver transfer is the cut-point
    collect — O(numChunks) rows, never the sample itself; the sample's sort
    is a Spark window over ``numChunks*samples_per_chunk`` rows (bounded by
    the caller's chunk budget, same control-plane class as the JDBC chunk
    metadata). Keys may be any orderable type (ObjectId hex strings, UUIDs,
    ints) — ranges compare with Column ``<``/``>=``; use `chunk_filter` for
    DataFrame predicates rather than ChunkRange.predicate's SQL rendering
    when keys are strings.
    """
    chunk_bytes = chunk_size_mb * 1024 * 1024
    if size_in_bytes < chunk_bytes:
        return [ChunkRange(None, None)]
    n = doc_count if doc_count is not None else df.count()
    num_chunks = int(size_in_bytes // chunk_bytes) + 1
    if n < sampling_threshold:
        sampled = df.select(key_col)
        m_expected = n
    else:
        m_expected = min(num_chunks * samples_per_chunk, n)
        sampled = df.select(key_col).sample(
            fraction=min(1.0, m_expected / n), seed=seed)
    # equal-count cut points: rank the sample, keep exactly the rows at
    # positions round(i*m/k), i=0..k (k buckets need k+1 bounds including
    # sample min/max). Two bounded jobs over the sample: a count, then a
    # rank-filter that ships only O(numChunks) rows to the driver.
    sampled = sampled.where(F.col(key_col).isNotNull())
    m = sampled.count()
    if m == 0:
        return [ChunkRange(None, None)]
    k = min(num_chunks, m)
    positions = sorted({max(1, round(i * m / k)) for i in range(k + 1)})
    w = Window.orderBy(F.col(key_col))
    cuts_df = (sampled
               .select(F.col(key_col).alias("k"),
                       F.row_number().over(w).alias("rn"))
               .where(F.col("rn").isin(positions)))
    bounds: list = []
    for _, v in sorted((r["rn"], r["k"]) for r in cuts_df.collect()):
        if not bounds or bounds[-1] != v:
            bounds.append(v)
    if not bounds:
        return [ChunkRange(None, None)]
    # sentinel-edge splits on BOTH ends are reference parity: the strategy
    # emits chunks.size()+2 splits (firstSplit [minSentinel, bucket0.min)
    # and lastSplit [lastBucket.max, maxSentinel], :129-165) — under live
    # writes the edge splits catch keys outside the sampled range
    chunks = [ChunkRange(None, bounds[0])]
    chunks += [ChunkRange(bounds[i], bounds[i + 1])
               for i in range(len(bounds) - 1)]
    chunks.append(ChunkRange(bounds[-1], None))
    if assign_unbounded_chunk_first:
        chunks.insert(0, chunks.pop())
    return chunks


def chunk_filter(key: Column, chunk: ChunkRange) -> Column:
    """Column predicate for one chunk — works for string/ObjectId keys where
    ChunkRange.predicate's unquoted SQL rendering would not."""
    cond = F.lit(True)
    if chunk.start is not None:
        cond = cond & (key >= F.lit(chunk.start))
    if chunk.end is not None:
        cond = cond & (key < F.lit(chunk.end))
    return cond


# ---------------------------------------------------------------------------
# ChangeStreamOffset (source/offset/ChangeStreamOffset.java parity)
# ---------------------------------------------------------------------------


def decode_resume_token_timestamp(token) -> int:
    """Resume token -> the BsonTimestamp long it encodes.

    A change-stream resume token's ``_data`` is a hex KeyString whose
    first byte is the timestamp kind marker (130) followed by the 8-byte
    big-endian BsonTimestamp value ``(seconds << 32) | increment`` — the
    public layout `ResumeTokens.decodeTimestamp` reads (mongo driver /
    mongo-kafka, Apache-2.0 docs). Accepts the token document
    ``{"_data": "hex"}`` or the bare hex string.
    """
    data = token
    if isinstance(data, dict):
        data = data.get("_id", data)
    if isinstance(data, dict):  # {"_data": ...} (possibly nested in _id)
        data = data.get("_data")
    if not isinstance(data, str):
        raise ValueError("not a change-stream resume token shape: %r"
                         % type(token).__name__)
    try:
        raw = bytes.fromhex(data)
    except ValueError:
        raise ValueError("resume token _data is not hex: %r" % data[:40])
    if len(raw) < 9 or raw[0] != 130:
        raise ValueError("not a change-stream resume token (lead byte "
                         "0x%02x)" % (raw[0] if raw else 0xFF))
    return int.from_bytes(raw[1:9], "big")


class ChangeStreamOffset:
    """`ChangeStreamOffset.java` parity: offset map {timestamp,
    resumeToken}, ordered by the BsonTimestamp; NO_STOPPING carries the
    maximum timestamp."""

    _MAX_TS = ((1 << 32) - 1) << 32 | ((1 << 32) - 1)

    def __init__(self, timestamp: int, resume_token_json: str | None = None):
        self.timestamp = timestamp
        self.resume_token_json = resume_token_json

    @classmethod
    def of_resume_token(cls, token: dict) -> "ChangeStreamOffset":
        import json

        return cls(decode_resume_token_timestamp(token),
                   json.dumps(token, separators=(",", ":")))

    @classmethod
    def no_stopping(cls) -> "ChangeStreamOffset":
        return cls(cls._MAX_TS)

    def offset_map(self) -> dict:
        return {"timestamp": str(self.timestamp),
                "resumeToken": self.resume_token_json}

    def to_json(self) -> str:
        import json

        return json.dumps(self.offset_map(), separators=(",", ":"))

    @classmethod
    def from_json(cls, s: str) -> "ChangeStreamOffset":
        import json

        d = json.loads(s)
        return cls(int(d["timestamp"]), d.get("resumeToken"))

    def compare(self, that: "ChangeStreamOffset") -> int:
        return (self.timestamp > that.timestamp) \
            - (self.timestamp < that.timestamp)

    def __eq__(self, other) -> bool:
        return isinstance(other, ChangeStreamOffset) \
            and self.offset_map() == other.offset_map()

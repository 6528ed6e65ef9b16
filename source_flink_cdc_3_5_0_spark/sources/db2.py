"""Db2 CDC source: ASN capture-table decode.

Parity target: the reference vendors Debezium's Db2 connector
(`flink-cdc-connect/flink-cdc-source-connectors/flink-connector-db2-cdc/
src/main/java/io/debezium/connector/db2/Db2Connection.java:62-73`): Db2's
SQL-Replication capture (ASNCDC) materializes changes into CD tables whose
rows carry ``IBMSNAP_COMMITSEQ`` (commit sequence, 16-byte hex),
``IBMSNAP_INTENTSEQ`` (statement sequence within the transaction) and a
RAW ``IBMSNAP_OPERATION`` of just 'D' or 'I' — an UPDATE appears as a
delete row immediately followed by an insert row. The reference's poll
query classifies them with a LEAD/LAG CASE::

    WHEN OP='D' AND LEAD(OP) OVER (PARTITION BY COMMITSEQ
                                   ORDER BY INTENTSEQ)='I' THEN 3
    WHEN OP='I' AND LAG(OP)  OVER (...)='D'                THEN 4
    WHEN OP='D' THEN 1
    WHEN OP='I' THEN 2

reproduced here as the SAME window expressions in Catalyst (including its
documented heuristic: a delete adjacent to an unrelated insert inside one
transaction classifies as an update pair — wire-faithful, not "fixed").
Downstream the 1/2/3/4 codes map to -D/+I/-U/+U exactly like the SQL
Server sibling (`Db2StreamingChangeEventSource.java:294-338`), with the
before-image attached to +U. Offsets are the same `LsnOffset` family.

Capture lines: ``{"db","schema","table","row":{IBMSNAP_* + data cols}}``
(the honest capture of a polled CD table); YAML ``type: db2-cdc-file``.
No in-band DDL (SQL Replication re-registers tables for schema changes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from ..common.events import BEFORE_COL, META_COL, OP_COL
from .base import SEQ_COL

COMMITSEQ_COL = "IBMSNAP_COMMITSEQ"
INTENTSEQ_COL = "IBMSNAP_INTENTSEQ"
OPERATION_COL = "IBMSNAP_OPERATION"

_OPS = {1: "-D", 2: "+I", 3: "-U", 4: "+U"}


def _wire_row_schema(payload: T.StructType) -> T.StructType:
    return T.StructType(list(payload.fields) + [
        T.StructField(COMMITSEQ_COL, T.StringType(), False),
        T.StructField(INTENTSEQ_COL, T.StringType(), False),
        T.StructField(OPERATION_COL, T.StringType(), False),
    ])


def db2_cdc_seq(commitseq: Column, intentseq: Column,
                opcode: Column) -> Column:
    """Monotone int64 ``__seq`` — the shared 44+18+1-bit hex budget
    (`sources.base.hex_pair_seq`); full hex order stays in ``__meta``."""
    from .base import hex_pair_seq

    return hex_pair_seq(commitseq, intentseq, opcode, before_code=3)


def decode_db2_cdc(raw: DataFrame, payload_schema: T.StructType,
                   value_col: str = "value") -> DataFrame:
    """Captured CD-table JSON lines -> engine changelog envelope.

    ONE ``from_json`` + the reference poll query's LEAD/LAG opcode CASE +
    a lag for the +U before-image — all Catalyst codegen.
    """
    env = T.StructType([
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("row", _wire_row_schema(payload_schema), True),
    ])
    v = F.from_json(F.col(value_col).cast("string"), env)
    # parse ONCE (optimization r11, guide §4.4's duplication applied to
    # JVM expressions): referencing the non-deterministic barrier column
    # in the filter keeps PushDownPredicates from pushing the null-row
    # check below this projection — without it the filter is rewritten
    # to isnotnull(from_json(...).row) under the project and every row
    # pays the JSON parse twice (measured in the r11 before-plan:
    # Filter (8) re-evaluates from_json below Project (9)). The
    # `barrier < -1` disjunct is always false, so the predicate is
    # semantically unchanged.
    parsed = (raw
              .select(v.alias("v"),
                      F.spark_partition_id().alias("__pushdown_barrier"))
              .where(F.col("v.row").isNotNull()
                     | (F.col("__pushdown_barrier") < F.lit(-1)))
              .select("v.*"))
    payload_cols = [f.name for f in payload_schema.fields]
    image = F.struct(*[F.col(f"row.{c}").alias(c) for c in payload_cols])
    raw_op = F.col(f"row.{OPERATION_COL}")
    # per-TABLE windows, like the reference's per-CD-table poll query —
    # a commit touching several tables must not pair a delete from one
    # with an insert into another
    w = (Window.partitionBy(F.col("db"), F.col("schema"), F.col("table"),
                            F.col(f"row.{COMMITSEQ_COL}"))
         .orderBy(F.col(f"row.{INTENTSEQ_COL}")))
    # materialize lead/lag ONCE each (optimization r11): referencing the
    # window expressions from every consumer inlined them — the r11
    # before-plan carried 10 lead/lag slots in one Window operator for
    # what is 2 distinct expressions (+ the before-image lag)
    staged = parsed.select(
        "db", "schema", "table", "row",
        F.lead(raw_op, 1, "X").over(w).alias("__lead_op"),
        F.lag(raw_op, 1, "X").over(w).alias("__lag_op"),
        F.lag(image).over(w).alias("__prev_image"))
    # the reference's exact classification (Db2Connection.java:64-69)
    opcode = (F.when((raw_op == "D") & (F.col("__lead_op") == "I"), F.lit(3))
              .when((raw_op == "I") & (F.col("__lag_op") == "D"), F.lit(4))
              .when(raw_op == "D", F.lit(1))
              .when(raw_op == "I", F.lit(2))
              .otherwise(F.raise_error(F.format_string(
                  # never-silently-drop (round 10): an IBMSNAP_OPERATION
                  # outside the D/I pairing contract (e.g. a capture
                  # configured to write 'U' rows) must surface, not flow
                  # through as a NULL op
                  "db2-cdc: unmodeled IBMSNAP_OPERATION %s at "
                  "commitseq=%s; row-bearing records are never silently "
                  "dropped (this decoder speaks the D/I-pair contract)",
                  raw_op, F.col(f"row.{COMMITSEQ_COL}")))))
    # a downstream filter on the op (e.g. latest_image dropping -U) still
    # re-inlines this CASE when pushed below the projection, but with
    # lead/lag materialized as plain columns the duplicated tree costs a
    # couple of string compares, not a re-evaluated window expression
    staged = staged.select(
        "db", "schema", "table", "row", "__prev_image",
        opcode.alias("__opcode"))
    oc = F.col("__opcode")
    op = F.coalesce(*[F.when(oc == k, F.lit(t)) for k, t in _OPS.items()])
    before = F.when(oc == 4, F.col("__prev_image"))
    meta = F.map_from_arrays(
        F.array(F.lit("commitseq"), F.lit("intentseq"), F.lit("operation"),
                F.lit("db"), F.lit("table")),
        F.array(F.col(f"row.{COMMITSEQ_COL}"), F.col(f"row.{INTENTSEQ_COL}"),
                oc.cast("string"), F.col("db"), F.col("table")))
    out = staged.select(
        image.alias("__row"),
        op.alias(OP_COL),
        before.alias(BEFORE_COL),
        meta.alias(META_COL),
        db2_cdc_seq(F.col(f"row.{COMMITSEQ_COL}"),
                    F.col(f"row.{INTENTSEQ_COL}"), oc).alias(SEQ_COL),
    )
    return out.select("__row.*", OP_COL, BEFORE_COL, META_COL, SEQ_COL)


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def _seq_hex(n: int) -> str:
    """16-byte IBMSNAP sequence rendered as fixed-width 32-char hex."""
    return "%032X" % n


class Db2CdcWriter:
    """Capture lines exactly as a CD-table poll returns them: RAW
    'D'/'I' operations — an update is the D row then the I row, adjacent
    by intent sequence within one commit sequence."""

    def __init__(self, db: str = "testdb", schema: str = "DB2INST1"):
        self.db, self.schema = db, schema
        self._commit = 0x1000
        self._intent = 0
        self.lines: list[str] = []

    def begin_txn(self) -> str:
        self._commit += 0x10
        self._intent = 0
        return _seq_hex(self._commit)

    def _emit(self, table: str, op: str, row: dict) -> None:
        import json

        self._intent += 1
        rec = {"db": self.db, "schema": self.schema, "table": table,
               "row": {**row, COMMITSEQ_COL: _seq_hex(self._commit),
                       INTENTSEQ_COL: _seq_hex(self._intent),
                       OPERATION_COL: op}}
        self.lines.append(json.dumps(rec, separators=(",", ":")))

    def insert(self, table: str, row: dict) -> None:
        self._emit(table, "I", row)

    def delete(self, table: str, row: dict) -> None:
        self._emit(table, "D", row)

    def update(self, table: str, before: dict, after: dict) -> None:
        self._emit(table, "D", before)
        self._emit(table, "I", after)

    def getvalue(self) -> str:
        return "\n".join(self.lines)

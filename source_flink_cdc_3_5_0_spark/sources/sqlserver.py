"""SQL Server CDC source: change-table decode (the real capture path).

Parity target: the reference vendors Debezium's
`io.debezium.connector.sqlserver.SqlServerStreamingChangeEventSource`
(`flink-cdc-connect/flink-cdc-source-connectors/flink-connector-sqlserver-
cdc/src/main/java/io/debezium/connector/sqlserver/
SqlServerStreamingChangeEventSource.java`): SQL Server CDC works by the
agent materializing every change into a per-table CHANGE TABLE, polled via
``cdc.fn_cdc_get_all_changes_<capture_instance>`` between LSNs. Each polled
row carries:

- ``__$start_lsn`` — the transaction's commit LSN (10 bytes, rendered as
  fixed-width hex; lexical order IS numeric order);
- ``__$seqval`` — the row's sequence value within the transaction
  (an UPDATE's before and after rows SHARE one seqval);
- ``__$operation`` — 1 DELETE, 2 INSERT, 3 UPDATE_BEFORE, 4 UPDATE_AFTER
  (`SqlServerChangeRecordEmitter.OP_*`, consumed at
  `SqlServerStreamingChangeEventSource.java:391-440` where the paired
  3-then-4 rows become one update);
- ``__$update_mask`` — a bitmask of captured columns that changed.

This module decodes captured/scripted change-table rows (JSON lines:
``{"db","schema","table","row":{…}}`` — the honest capture of a polled
relational table) into the engine changelog envelope with a SINGLE
``from_json`` + window plan — pure Catalyst codegen, no Python in the data
path, unlike the binary wire sources. The update before-image attaches via
a lag window over (lsn, seqval). DDL never flows in-band (SQL Server
requires a new capture instance for schema changes — reference behavior),
so there is no schema-event stream here.

Offsets are the 10-byte LSNs already modeled in
:mod:`.legacy_offsets` (`LsnOffset.java` parity); the YAML surface is
``type: sqlserver-cdc-file`` and the max commit LSN persists per committed
batch through the runner's shared connector-offset hook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from ..common.events import BEFORE_COL, META_COL, OP_COL
from .base import SEQ_COL

#: change-table metadata columns (sys.sp_cdc_enable_table output shape)
LSN_COL = "__$start_lsn"
SEQVAL_COL = "__$seqval"
OPERATION_COL = "__$operation"
UPDATE_MASK_COL = "__$update_mask"

_OPS = {1: "-D", 2: "+I", 3: "-U", 4: "+U"}


def _wire_row_schema(payload: T.StructType) -> T.StructType:
    return T.StructType(list(payload.fields) + [
        T.StructField(LSN_COL, T.StringType(), False),
        T.StructField(SEQVAL_COL, T.StringType(), False),
        T.StructField(OPERATION_COL, T.IntegerType(), False),
        T.StructField(UPDATE_MASK_COL, T.StringType(), True),
    ])


def sqlserver_cdc_seq(lsn: Column, seqval: Column, operation: Column) -> Column:
    """Monotone int64 ``__seq`` from (commit LSN, seqval, op) — the shared
    44+18+1-bit hex budget (`sources.base.hex_pair_seq`); full
    fixed-width-hex lexical order stays in ``__meta`` for audits."""
    from .base import hex_pair_seq

    return hex_pair_seq(lsn, seqval, operation, before_code=3)


def changed_columns(mask: Column, payload: T.StructType) -> Column:
    """``__$update_mask`` hex -> csv of changed captured-column names.

    Bit i (LSB-first) marks the i-th captured column. Masks wider than 64
    bits (tables >64 captured columns) keep only the low 64 — documented
    truncation; the mask is advisory metadata, never load-bearing.

    The 64-bit word splits into two 32-bit halves decoded separately:
    ``conv(hex, 16, 10)`` of a full 16-hex-char mask with bit 63 set
    yields an unsigned decimal above Long.MAX whose ``cast('long')`` is
    null — each half stays within 32 bits and casts exactly.
    """
    padded = F.lpad(F.right(mask, F.lit(16)), 16, "0")
    hi = F.conv(F.substring(padded, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(padded, 9, 8), 16, 10).cast("long")
    # shiftright instead of lit(1 << i): 1 << 63 overflows a JVM long
    names = [F.when(F.shiftright(lo if i < 32 else hi, i % 32)
                    .bitwiseAND(F.lit(1)) == 1, F.lit(f.name))
             for i, f in enumerate(payload.fields[:64])]
    return F.concat_ws(",", *names)


def decode_sqlserver_cdc(raw: DataFrame, payload_schema: T.StructType,
                         value_col: str = "value") -> DataFrame:
    """Captured change-table JSON lines -> engine changelog envelope.

    ONE ``from_json`` projection + ONE (lsn, seqval) window: the paired
    UPDATE rows (op 3 then 4, same seqval) become -U and +U with the
    before-image attached to +U via ``lag`` — entirely JVM codegen, the
    per-key state is one row. ``__meta`` carries lsn/seqval/operation plus
    the decoded changed-column list.
    """
    env = T.StructType([
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("row", _wire_row_schema(payload_schema), True),
    ])
    v = F.from_json(F.col(value_col).cast("string"), env)
    # parse ONCE (optimization r11): the non-deterministic barrier column
    # referenced in the filter keeps PushDownPredicates from rewriting the
    # null-row check to isnotnull(from_json(...).row) below the project,
    # which would evaluate the JSON parse twice per row (see db2.py, the
    # same pattern; the `< -1` disjunct is always false).
    parsed = (raw
              .select(v.alias("v"),
                      F.spark_partition_id().alias("__pushdown_barrier"))
              .where(F.col("v.row").isNotNull()
                     | (F.col("__pushdown_barrier") < F.lit(-1)))
              .select("v.*"))
    payload_cols = [f.name for f in payload_schema.fields]
    image = F.struct(*[F.col(f"row.{c}").alias(c) for c in payload_cols])
    op_num = F.col(f"row.{OPERATION_COL}")
    op = F.when(op_num == 1, F.lit("-D")) \
        .when(op_num == 2, F.lit("+I")) \
        .when(op_num == 3, F.lit("-U")) \
        .when(op_num == 4, F.lit("+U")) \
        .otherwise(F.raise_error(F.format_string(
            # never-silently-drop (round 10, the binlog type-39/40
            # lesson): an unmodeled __$operation is a row-bearing
            # record — a NULL op would flow through downstream
            "sqlserver-cdc: unknown __$operation %s at lsn=%s; "
            "row-bearing records are never silently dropped",
            op_num.cast("string"), F.col(f"row.{LSN_COL}"))))
    w = (Window.partitionBy(F.col(f"row.{LSN_COL}"),
                            F.col(f"row.{SEQVAL_COL}"))
         .orderBy(op_num))
    # materialize the lag expressions once (optimization r11): inlining
    # them at every consumer multiplies the Window operator's expression
    # slots (db2.py had 10 slots for 2 distinct lead/lags before this)
    parsed = parsed.select(
        "*",
        F.lag(op_num).over(w).alias("__prev_op"),
        F.lag(image).over(w).alias("__prev_img"))
    prev_op = F.col("__prev_op")
    prev_img = F.col("__prev_img")
    # capture contract: an UPDATE's op-3/op-4 pair shares one (lsn, seqval)
    # and a capture file never splits mid-transaction, so the pair is
    # always co-batched. An op-4 row with no adjacent op-3 means a capture
    # file violated that — surface it rather than emitting a +U with a
    # silently-null before-image (never-silently-drop posture).
    before = (F.when((op_num == 4) & (prev_op == 3), prev_img)
              .when(op_num == 4, F.raise_error(F.format_string(
                  "sqlserver-cdc: UPDATE after-image (op 4) at lsn=%s "
                  "seqval=%s has no paired op-3 before-image in this "
                  "batch; update pairs must not split across capture "
                  "files", F.col(f"row.{LSN_COL}"),
                  F.col(f"row.{SEQVAL_COL}")))))
    meta = F.map_from_arrays(
        F.array(F.lit("lsn"), F.lit("seqval"), F.lit("operation"),
                F.lit("updated_columns"), F.lit("db"), F.lit("table")),
        F.array(F.col(f"row.{LSN_COL}"), F.col(f"row.{SEQVAL_COL}"),
                op_num.cast("string"),
                changed_columns(F.col(f"row.{UPDATE_MASK_COL}"),
                                payload_schema),
                F.col("db"), F.col("table")))
    out = parsed.select(
        image.alias("__row"),
        op.alias(OP_COL),
        before.alias(BEFORE_COL),
        meta.alias(META_COL),
        sqlserver_cdc_seq(F.col(f"row.{LSN_COL}"),
                          F.col(f"row.{SEQVAL_COL}"), op_num)
        .alias(SEQ_COL),
    )
    return out.select("__row.*", OP_COL, BEFORE_COL, META_COL, SEQ_COL)


# ---------------------------------------------------------------------------
# fixture writer (the capture path's stand-in, like the other wire writers)
# ---------------------------------------------------------------------------


def render_lsn(n: int) -> str:
    """int -> the 10-byte LSN's fixed-width 20-char hex rendering."""
    return "%020X" % n


class SqlServerCdcWriter:
    """Produce capture lines exactly as a change-table poll would return
    them: one JSON object per row with the ``__$`` metadata columns.
    UPDATE emits the paired op-3/op-4 rows sharing one seqval."""

    def __init__(self, db: str = "testdb", schema: str = "dbo"):
        self.db, self.schema = db, schema
        self._lsn = 0x1000
        self._seq = 0
        self.lines: list[str] = []

    def begin_txn(self) -> str:
        """New commit LSN; rows until the next begin share it."""
        self._lsn += 0x10
        self._seq = 0
        return render_lsn(self._lsn)

    def _emit(self, table: str, op: int, row: dict, mask: int,
              seqval: int | None = None) -> None:
        import json

        if seqval is None:
            self._seq += 1
            seqval = self._seq
        rec = {"db": self.db, "schema": self.schema, "table": table,
               "row": {**row, LSN_COL: render_lsn(self._lsn),
                       SEQVAL_COL: render_lsn(seqval),
                       OPERATION_COL: op,
                       UPDATE_MASK_COL: "%X" % mask}}
        self.lines.append(json.dumps(rec, separators=(",", ":")))

    def insert(self, table: str, row: dict, n_cols: int | None = None) -> None:
        self._emit(table, 2, row, (1 << (n_cols or len(row))) - 1)

    def delete(self, table: str, row: dict, n_cols: int | None = None) -> None:
        self._emit(table, 1, row, (1 << (n_cols or len(row))) - 1)

    def update(self, table: str, before: dict, after: dict,
               changed_mask: int) -> None:
        # the pair shares ONE seqval (wire behavior)
        self._seq += 1
        seq = self._seq
        for op, row in ((3, before), (4, after)):
            self._emit(table, op, row, changed_mask, seqval=seq)

    def getvalue(self) -> str:
        return "\n".join(self.lines)

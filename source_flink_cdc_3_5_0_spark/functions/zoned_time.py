"""TIMESTAMP_TZ (zoned timestamp) fidelity helpers.

Parity target: ``flink-cdc-common/.../types/ZonedTimestampType.java`` — the
reference preserves the ORIGINAL UTC offset of a zoned timestamp end to end
(Debezium emits Postgres ``timestamptz`` / MySQL ``TIMESTAMP`` with zone as
``io.debezium.time.ZonedTimestamp`` ISO-8601 strings, e.g.
``2024-03-01T10:15:30.123456+05:30``).

Spark has no offset-preserving timestamp type (``TimestampType`` is an
instant, rendered in the session zone), so the engine carries zoned values
as a PAIR of columns:

- ``<name>``              TimestampType  — the instant (UTC micros)
- ``<name>__tz_offset``   StringType     — the original offset (``+05:30``,
                                           ``Z`` normalized to ``+00:00``)

A column is declared zoned with ``Column(..., zoned=True)``; the flag rides
in ``StructField.metadata`` so every consumer of ``Schema.struct_type()``
(codecs, coercion, sinks) can discover it without a side table. Ordering,
equality, windows etc. all operate on the instant column — exactly the
reference's comparison semantics for zoned values — while the offset column
is plain data that survives transforms/sinks and lets the Kafka encoder
render the value back in its original zone.

All expressions are built-in (codegen'd); everything is session-timezone
independent: ``convert_timezone`` with an explicit per-row target offset
produces the wall clock, never ``date_format`` on a zoned instant.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

OFFSET_SUFFIX = "__tz_offset"

# trailing ISO offset: +HH:MM / -HH:MM / +HHMM / Z
_OFFSET_RE = r"(Z|[+-]\d{2}:?\d{2})\s*$"


def offset_col_name(name: str) -> str:
    return name + OFFSET_SUFFIX


def zoned_field_names(struct: T.StructType) -> list[str]:
    """Names of fields declared ``zoned`` (via Column metadata)."""
    return [f.name for f in struct.fields
            if (f.metadata or {}).get("zoned")]


def wire_schema(struct: T.StructType) -> T.StructType:
    """The JSON wire shape of a payload: zoned fields travel as ISO-8601
    offset STRINGS (Debezium's ZonedTimestamp convention), everything else
    keeps its declared type."""
    fields = []
    for f in struct.fields:
        if (f.metadata or {}).get("zoned"):
            fields.append(T.StructField(f.name, T.StringType(), f.nullable,
                                        f.metadata))
        else:
            fields.append(f)
    return T.StructType(fields)


def split_zoned(col: Column) -> tuple[Column, Column]:
    """ISO-8601 offset string -> (instant TimestampType, offset string).

    The instant comes from Spark's string->timestamp cast, which honors a
    trailing offset (no session-zone dependence when one is present). The
    offset is extracted textually and normalized: ``Z``/``+0530`` ->
    ``+00:00``/``+05:30``; a string with NO offset gets ``+00:00`` (the
    reference treats offset-less zoned input as UTC)."""
    raw_off = F.regexp_extract(col, _OFFSET_RE, 1)
    norm = (
        F.when(raw_off.isin("", "Z"), F.lit("+00:00"))
        .when(raw_off.rlike(r"^[+-]\d{4}$"),
              F.concat(F.substring(raw_off, 1, 3), F.lit(":"),
                       F.substring(raw_off, 4, 2)))
        .otherwise(raw_off)
    )
    # ensure offset-less strings parse as UTC regardless of session zone
    with_off = F.when(raw_off == "", F.concat(col, F.lit("Z"))).otherwise(col)
    instant = F.to_timestamp(with_off)
    return instant, F.when(col.isNull(), F.lit(None)).otherwise(norm)


def render_zoned(instant: Column, offset: Column) -> Column:
    """(instant, offset) -> ISO-8601 string in the ORIGINAL offset.

    ``convert_timezone(targetTz=offset)`` yields the wall clock at that
    offset as NTZ — date_format on NTZ applies no session shift, so the
    rendering is deterministic on any cluster timezone. Null offset renders
    at UTC."""
    off = F.coalesce(offset, F.lit("+00:00"))
    # sourceTz=None -> session zone, matching the instant->NTZ cast, so the
    # composition is session-independent
    wall = F.convert_timezone(None, off, instant.cast("timestamp_ntz"))
    body = F.date_format(wall, "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.date_format(wall, "SSSSSS")
    with_frac = F.when(frac == "000000", body).otherwise(
        F.concat(body, F.lit("."), F.regexp_replace(frac, "0+$", "")))
    return F.when(instant.isNull(), F.lit(None)).otherwise(
        F.concat(with_frac, off))

"""Convenience API: run engine transforms directly on DataFrames.

This is the programmatic face of the pipeline (what a notebook user calls);
the YAML path in :mod:`.pipeline` routes through the same operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common.schema import Schema
from .common.tableid import TableId
from .operators.transform import PostTransform, TransformRule
from .sources.base import attach_envelope, strip_envelope


def transform_table(
    df: DataFrame,
    projection: str | None = None,
    filter: str | None = None,  # noqa: A002 - YAML key name
    table_id: str = "default_namespace.default_schema.tbl",
    primary_keys: list[str] | None = None,
    with_envelope: bool = False,
    udfs: set[str] | None = None,
    converter_after_transform: str | None = None,
) -> DataFrame:
    """Apply one transform rule (projection/filter in the CDC dialect) to a
    DataFrame through the engine's PostTransform operator.

    The plan produced is a single Catalyst select/where — run ``.explain()``
    on the result to see filters pushed into the scan.
    """
    tid = TableId.parse(table_id)
    schema = Schema.from_struct_type(df.schema, primary_keys=primary_keys or [])
    rule = TransformRule(
        source_table=_exact_pattern(tid),
        projection=projection,
        filter=filter,
        primary_keys=tuple(primary_keys or ()),
        converter_after_transform=converter_after_transform,
    )
    post = PostTransform([rule], udfs)
    src = attach_envelope(df) if with_envelope else df
    out = post.apply(src, tid, schema)
    return out if with_envelope else strip_envelope(out)


def _exact_pattern(tid: TableId) -> str:
    def esc(part: str) -> str:
        out = []
        for ch in part:
            if ch in ".\\^$*+?()[]{}|":
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    parts = [p for p in (tid.namespace, tid.schema_name, tid.table_name) if p]
    return ".".join(esc(p) for p in parts)

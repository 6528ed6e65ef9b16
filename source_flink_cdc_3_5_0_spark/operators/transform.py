"""Transform operators: column pruning + projection/filter on DataFrames.

Parity targets:
- ``PreTransformOperator`` (flink-cdc-runtime/.../transform/
  PreTransformOperator.java:63-127): drop columns not referenced by any
  projection/filter of matching rules; apply primary-keys / partition-keys /
  table-options overrides to the table's schema metadata.
- ``PostTransformOperator`` (...:275-414): per matching rule, evaluate
  projection expressions against the pre-row, test the filter on pre ∪ post
  row, attach metadata columns; FIRST-MATCH dispatch across rules — a
  matching rule without a filter terminates the chain
  (``getEffectiveTransformers:399-414``).
- ``SOFT_DELETE`` converter (transform/converter/SoftDeleteConverter.java:30-40).

Spark-first: each rule compiles to ONE ``select`` + optional ``where`` —
Catalyst then performs the column pruning the PreTransform operator exists
for, and whole-stage codegen fuses the chain. PreTransform here is therefore
mostly *schema* bookkeeping (pruned CreateTableEvent parity), while the data
path trusts Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..common.events import BEFORE_COL, META_COL, OP_COL
from ..sources.base import SEQ_COL
from ..common.schema import Column, Schema
from ..common.tableid import TableId, cached_selectors
from ..common.types import STRING
from ..functions.dialect import (
    Compiled,
    ExpressionError,
    ProjectionColumn,
    compile_expression,
    ensure_lenient_sql,
    parse_projection,
)


@dataclass(frozen=True)
class TransformRule:
    """One YAML ``transform`` block (composer/definition/TransformDef.java)."""

    source_table: str  # Selectors pattern
    projection: str | None = None
    filter: str | None = None
    primary_keys: tuple[str, ...] = ()
    partition_keys: tuple[str, ...] = ()
    table_options: tuple[tuple[str, str], ...] = ()
    converter_after_transform: str | None = None  # e.g. 'SOFT_DELETE'
    description: str | None = None

    def matches(self, table_id: TableId) -> bool:
        return cached_selectors(self.source_table).is_match(table_id)

    @property
    def has_projection(self) -> bool:
        return self.projection is not None and self.projection.strip() not in ("", "*", "\\*")

    @property
    def has_filter(self) -> bool:
        return self.filter is not None and self.filter.strip() != ""


def effective_rules(rules: list[TransformRule], table_id: TableId) -> list[TransformRule]:
    """First-match semantics (PostTransformOperator.java:399-414): collect
    matching rules in order; a matching rule WITHOUT a filter ends the chain
    (later rules never see the table)."""
    out: list[TransformRule] = []
    for r in rules:
        if r.matches(table_id):
            out.append(r)
            if not r.has_filter:
                break
    return out


def metadata_bindings(table_id: TableId) -> dict[str, str]:
    """Static metadata column values (MetadataColumns.java:30-40); the
    op-type column is dynamic and bound to the envelope ``__op`` column."""
    return {
        "__namespace_name__": table_id.namespace,
        "__schema_name__": table_id.schema_name,
        "__table_name__": table_id.table_name,
    }


# Connector-declared metadata columns usable in any transform expression
# (SupportedMetadataColumn.java / OpTsMetadataColumn.java): name -> SQL over
# the envelope's ``__meta`` map. Resolved per-row when the source carries
# ``__meta``; referencing one against a source without it fails analysis —
# the same contract as a connector not declaring the column.
SOURCE_METADATA_COLUMNS: dict[str, str] = {
    "op_ts": f"CAST(`{META_COL}`['ts_ms'] AS BIGINT)",
}


@dataclass
class CompiledTransform:
    """A rule compiled against a concrete table schema."""

    rule: TransformRule
    projection_cols: list[ProjectionColumn]
    filter_compiled: Compiled | None
    output_schema: Schema
    referenced_columns: set[str]


class PreTransform:
    """Schema-side column pruning + PK/partition/option overrides.

    Data-side pruning is intentionally left to Catalyst (expressing the
    transform as select/where makes ``ColumnPruning`` fire for free — see
    SURVEY.md §4.1); this class computes the *pruned schema* so that
    CreateTableEvents and sink DDL see exactly what the reference would
    produce (TransformParser.generateReferencedColumns:207-249).
    """

    def __init__(self, rules: list[TransformRule], udfs: set[str] | None = None):
        self.rules = rules
        self.udfs = udfs or set()

    def referenced_columns(self, table_id: TableId, schema: Schema) -> list[str] | None:
        """Columns referenced by any matching rule, in schema order; ``None``
        means 'all' (no matching rule with a projection, or a wildcard)."""
        rules = effective_rules(self.rules, table_id)
        if not rules:
            return None
        referenced: set[str] = set()
        binds = metadata_bindings(table_id)
        for r in rules:
            if not r.has_projection:
                return None
            for item in parse_projection(r.projection, self.udfs, binds):
                if item.is_wildcard:
                    return None
                referenced |= item.compiled.columns
            if r.has_filter:
                referenced |= compile_expression(r.filter, self.udfs, binds).columns
            referenced |= set(r.primary_keys) | set(r.partition_keys)
        names = [c.name for c in schema.columns if c.name in referenced]
        return names

    def pruned_schema(self, table_id: TableId, schema: Schema) -> Schema:
        cols = self.referenced_columns(table_id, schema)
        out = schema
        if cols is not None:
            out = schema.with_columns([c for c in schema.columns if c.name in set(cols)])
        for r in effective_rules(self.rules, table_id):
            if r.primary_keys:
                out = out.with_primary_keys(list(r.primary_keys))
            if r.partition_keys:
                out = out.with_partition_keys(list(r.partition_keys))
            if r.table_options:
                out = out.with_options(dict(r.table_options))
        return out


class PostTransform:
    """Projection + filter + metadata columns, as one Catalyst select/where."""

    def __init__(self, rules: list[TransformRule], udfs: set[str] | None = None):
        self.rules = rules
        self.udfs = udfs or set()

    # -- schema path (PostTransformOperator.processSchemaChangeEvent) ----
    def compile(self, table_id: TableId, schema: Schema) -> list[CompiledTransform]:
        out = []
        binds = metadata_bindings(table_id)
        for r in effective_rules(self.rules, table_id):
            out.append(self._compile_rule(r, table_id, schema, binds))
        return out

    def _compile_rule(self, rule: TransformRule, table_id: TableId, schema: Schema,
                      binds: dict[str, str]) -> CompiledTransform:
        phys_names = [c.name for c in schema.columns]
        referenced: set[str] = set()
        if rule.has_projection:
            items = parse_projection(rule.projection, self.udfs, binds)
            # expand wildcard to physical columns (TransformParser.expandWildcard)
            expanded: list[ProjectionColumn] = []
            seen: set[str] = set()
            explicit = {i.alias for i in items if not i.is_wildcard}
            for item in items:
                if item.is_wildcard:
                    for name in phys_names:
                        if name not in explicit and name not in seen:
                            expanded.append(ProjectionColumn(name, name, compile_expression(f"`{name}`"), forwarded_column=name))
                            seen.add(name)
                else:
                    if item.alias in seen:
                        raise ExpressionError(f"duplicate projection alias {item.alias!r}")
                    expanded.append(item)
                    seen.add(item.alias)
            items = expanded
            for i in items:
                referenced |= i.compiled.columns
        else:
            items = [
                ProjectionColumn(name, name, compile_expression(f"`{name}`"), forwarded_column=name)
                for name in phys_names
            ]
        filt = None
        if rule.has_filter:
            filt = compile_expression(rule.filter, self.udfs, binds, context="filter")
            referenced |= filt.columns

        out_cols = []
        for i in items:
            if i.forwarded_column is not None and schema.get_column(i.forwarded_column):
                src = schema.get_column(i.forwarded_column)
                # carry the FULL column identity — dropping the zoned
                # flag silently demoted TIMESTAMP_TZ columns to plain
                # timestamps in the derived sink schema (round-9 review)
                out_cols.append(Column(i.alias, src.data_type, src.nullable,
                                       src.comment, src.default_expr,
                                       zoned=src.zoned))
            else:
                # type is inferred by Catalyst at runtime; schema-side we mark
                # STRING placeholder lazily replaced after first batch planning
                out_cols.append(Column(i.alias, STRING, True))
        out_names = {c.name for c in out_cols}
        pks = tuple(rule.primary_keys) or schema.primary_keys
        if not rule.primary_keys:
            # inherited PKs the projection dropped must not survive into
            # the sink schema — a CREATE TABLE naming a ghost column
            # fails on relational sinks and keyed semantics silently
            # degrade (round-9 review); an EXPLICIT override is still
            # validated downstream as the user's intent
            pks = tuple(k for k in pks if k in out_names)
        out_schema = Schema(
            columns=tuple(out_cols),
            primary_keys=pks,
            partition_keys=tuple(rule.partition_keys) or schema.partition_keys,
            options=tuple(rule.table_options) or schema.options,
        )
        return CompiledTransform(rule, items, filt, out_schema, referenced)

    # -- data path -------------------------------------------------------
    def apply(self, df: DataFrame, table_id: TableId, schema: Schema) -> DataFrame:
        """Apply the first-match rule chain to a changelog DataFrame.

        Envelope columns (``__op``, optional ``__before``/``__meta``) pass
        through; projections are computed on the after-image columns; the
        before-image struct is projected with the same expressions
        (PostTransformOperator.java:293-317 projects both images).
        """
        ensure_lenient_sql(df.sparkSession)
        compiled = self.compile(table_id, schema)
        if not compiled:
            return df
        has_op = OP_COL in df.columns
        has_before = BEFORE_COL in df.columns
        binds = metadata_bindings(table_id)

        if len(compiled) == 1:
            # fast path: single rule keeps the filter inline (pushdown-friendly)
            return self._apply_rule(df, compiled[0], has_op, has_before)

        # First-match-per-row (PostTransformOperator.processDataChangeEvent:
        # 288-331 returns on the FIRST transformer whose filter passes; rows
        # passing no filter are dropped). Each rule's pass-predicate is
        # rewritten over the pre-row, and rule i only sees rows that failed
        # rules 0..i-1 — no duplication across overlapping filters.
        phys = frozenset(df.columns)
        passes = [self._pass_expr(ct, has_op, META_COL in df.columns, phys)
                  for ct in compiled]
        frames: list[DataFrame] = []
        prior_any = None
        for idx, ct in enumerate(compiled):
            cond = passes[idx] if prior_any is None else (passes[idx] & ~prior_any)
            frames.append(self._apply_rule(df.where(cond), ct, has_op, has_before,
                                           apply_filter=False))
            prior_any = passes[idx] if prior_any is None else (prior_any | passes[idx])
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def _pass_expr(self, ct: CompiledTransform, has_op: bool, has_meta: bool,
                   physical: frozenset = frozenset()):
        """Rule's filter as a pre-row boolean Column (null -> False).

        Filter references resolve aliases-first (aliases shadow physical
        columns), so alias references are inlined with their defining
        projection expression via placeholders (no cascading substitution).
        """
        if ct.filter_compiled is None:
            return F.lit(True)
        sql = ct.filter_compiled.sql
        alias_sql = {i.alias: i.compiled.sql for i in ct.projection_cols}
        subs: list[tuple[str, str]] = []
        for k, name in enumerate(sorted(ct.filter_compiled.columns, key=len, reverse=True)):
            expr = alias_sql.get(name)
            if expr is not None and expr != f"`{name}`":
                ph = f"\x00{k}\x00"
                sql = sql.replace(f"`{name}`", ph)
                subs.append((ph, f"({expr})"))
        for ph, expr in subs:
            sql = sql.replace(ph, expr)
        sql = self._render_dynamic(sql, has_op, has_meta, physical)
        return F.coalesce(F.expr(sql).cast("boolean"), F.lit(False))

    @staticmethod
    def _render_dynamic(sql: str, has_op: bool, has_meta: bool,
                        physical: frozenset = frozenset()) -> str:
        """Bind dynamic metadata references: ``__data_event_type__`` -> the
        envelope op column; connector metadata (``op_ts``) -> its ``__meta``
        expression when the source carries the map. A PHYSICAL column with a
        metadata name shadows the metadata binding (reference precedence:
        SupportedMetadataColumn resolves only unknown names)."""
        if has_op:
            sql = sql.replace("`__data_event_type__`", f"`{OP_COL}`")
        if has_meta:
            for name, expr in SOURCE_METADATA_COLUMNS.items():
                if name not in physical:
                    sql = sql.replace(f"`{name}`", f"({expr})")
        return sql

    def _apply_rule(self, df: DataFrame, ct: CompiledTransform, has_op: bool,
                    has_before: bool, apply_filter: bool = True) -> DataFrame:
        has_meta = META_COL in df.columns
        physical = frozenset(df.columns)

        def render(sql: str) -> str:
            return self._render_dynamic(sql, has_op, has_meta, physical)

        proj_exprs = [F.expr(render(i.compiled.sql)).alias(i.alias) for i in ct.projection_cols]
        passthrough = []
        if has_op:
            passthrough.append(F.col(OP_COL))
        if has_before:
            # project the before-image with the same expressions, evaluated
            # over the before struct's fields
            from ..functions.dialect import METADATA_COLUMNS

            btype = df.schema[BEFORE_COL].dataType
            bfields = set(btype.fieldNames()) if hasattr(btype, "fieldNames") else set()
            before_fields = []
            for i in ct.projection_cols:
                sql = i.compiled.sql
                for col in sorted(i.compiled.columns, key=len, reverse=True):
                    if ((col in METADATA_COLUMNS or col in SOURCE_METADATA_COLUMNS)
                            and col not in physical):
                        continue  # metadata cols bind per-row, not per-image
                    if col in bfields:
                        sql = sql.replace(f"`{col}`", f"`{BEFORE_COL}`.`{col}`")
                    elif col in physical:
                        # physical column with no before-image field (e.g. a
                        # zoned __tz_offset side channel — decode carries only
                        # the instant in before): bind a typed NULL
                        sql = sql.replace(
                            f"`{col}`",
                            f"CAST(NULL AS {df.schema[col].dataType.simpleString()})")
                before_fields.append(F.expr(render(sql)).alias(i.alias))
            passthrough.append(
                F.when(F.col(BEFORE_COL).isNotNull(), F.struct(*before_fields))
                .otherwise(F.lit(None))
                .alias(BEFORE_COL)
            )
        if has_meta:
            passthrough.append(F.col(META_COL))
        if SEQ_COL in df.columns:
            # per-key ordering survives the transform (sink merges order on it)
            passthrough.append(F.col(SEQ_COL))
        # zoned side channels: a FORWARDED zoned column keeps its
        # original-offset column alive under its output alias (round-9
        # review: any matching rule — even a pure filter — dropped the
        # __tz_offset columns and the sink re-rendered at UTC)
        from ..functions.zoned_time import offset_col_name

        proj_aliases = {i.alias for i in ct.projection_cols}
        for i in ct.projection_cols:
            if i.forwarded_column is not None:
                off = offset_col_name(i.forwarded_column)
                out_off = offset_col_name(i.alias)
                if off in df.columns and out_off not in proj_aliases:
                    passthrough.append(F.col(off).alias(out_off))

        projected = df.select(*proj_exprs, *passthrough)
        if ct.filter_compiled is not None and apply_filter:
            # filter sees pre ∪ post row; aliases shadow originals. We select
            # original columns not shadowed + projected, filter, then drop.
            aliases = {i.alias for i in ct.projection_cols}
            extra = [c for c in df.columns if c not in aliases
                     and c not in (OP_COL, BEFORE_COL, META_COL, SEQ_COL)]
            if extra:
                staged = df.select(
                    *[F.col(c).alias(f"__pre_{c}") for c in extra],
                    *proj_exprs, *passthrough,
                )
                filter_sql = ct.filter_compiled.sql
                for c in sorted(extra, key=len, reverse=True):
                    if c not in aliases:
                        filter_sql = filter_sql.replace(f"`{c}`", f"`__pre_{c}`")
                staged = staged.where(F.expr(render(filter_sql)))
                projected = staged.drop(*[f"__pre_{c}" for c in extra])
            else:
                projected = projected.where(F.expr(render(ct.filter_compiled.sql)))
        if ct.rule.converter_after_transform:
            projected = apply_converter(projected, ct.rule.converter_after_transform, has_op, has_before)
        return projected


def apply_converter(df: DataFrame, name: str, has_op: bool, has_before: bool) -> DataFrame:
    """Post-transform converters (PostTransformConverters.java registry)."""
    if name.upper() != "SOFT_DELETE":
        raise ValueError(f"unknown converter-after-transform: {name}")
    if not has_op:
        return df
    # SOFT_DELETE: rewrite -D into +I carrying the before image
    # (SoftDeleteConverter.java:30-40). In our envelope a delete row already
    # carries the before image in the data columns, so only the op flips.
    return df.withColumn(
        OP_COL,
        F.when(F.col(OP_COL) == "-D", F.lit("+I")).otherwise(F.col(OP_COL)),
    )

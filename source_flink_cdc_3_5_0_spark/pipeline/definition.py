"""YAML pipeline definition -> typed PipelineDef.

Parity target: ``YamlPipelineDefinitionParser``
(flink-cdc-cli/.../parser/YamlPipelineDefinitionParser.java:59-193) and the
IR ``PipelineDef`` (flink-cdc-composer/.../definition/PipelineDef.java):
``source`` -> ``transform[]`` -> ``route[]`` -> ``sink`` + ``pipeline`` map,
plus UDF and model declarations.

Key names mirror the reference's YAML surface
(docs/content/docs/core-concept/*.md): ``source-table``, ``sink-table``,
``projection``, ``filter``, ``primary-keys``, ``partition-keys``,
``table-options``, ``converter-after-transform``, ``replace-symbol``,
``schema.change.behavior``, ``local-time-zone``, ``parallelism``,
``user-defined-function``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from ..operators.route import RouteRule
from ..operators.schema_evolution import SchemaChangeBehavior
from ..operators.transform import TransformRule


@dataclass(frozen=True)
class SourceDef:
    type: str
    options: tuple[tuple[str, str], ...] = ()
    name: str | None = None

    def options_dict(self) -> dict[str, str]:
        return dict(self.options)


@dataclass(frozen=True)
class SinkDef:
    type: str
    options: tuple[tuple[str, str], ...] = ()
    name: str | None = None
    include_schema_types: tuple[str, ...] = ()
    exclude_schema_types: tuple[str, ...] = ()

    def options_dict(self) -> dict[str, str]:
        return dict(self.options)


@dataclass(frozen=True)
class UdfDef:
    """pipeline.user-defined-function entry: name + python callable path."""

    name: str
    classpath: str  # 'module:callable' for python functions


@dataclass(frozen=True)
class ModelDef:
    """AI model function declaration (composer/definition/ModelDef.java)."""

    name: str  # e.g. GET_EMBEDDING
    model: str
    options: tuple[tuple[str, str], ...] = ()


@dataclass
class PipelineConfig:
    name: str = "pipeline"
    parallelism: int = 1
    local_time_zone: str = "UTC"
    schema_change_behavior: SchemaChangeBehavior = SchemaChangeBehavior.LENIENT
    batch_mode: bool = False
    extra: dict = field(default_factory=dict)


@dataclass
class PipelineDef:
    source: SourceDef
    sink: SinkDef
    routes: list[RouteRule] = field(default_factory=list)
    transforms: list[TransformRule] = field(default_factory=list)
    udfs: list[UdfDef] = field(default_factory=list)
    models: list[ModelDef] = field(default_factory=list)
    config: PipelineConfig = field(default_factory=PipelineConfig)


def _opts(d: dict, skip: set[str]) -> tuple[tuple[str, str], ...]:
    return tuple(sorted((str(k), str(v)) for k, v in d.items() if k not in skip))


def _split_list(v) -> tuple[str, ...]:
    if v is None:
        return ()
    if isinstance(v, (list, tuple)):
        return tuple(str(x).strip() for x in v)
    return tuple(s.strip() for s in str(v).split(",") if s.strip())


def parse_yaml_pipeline(text: str) -> PipelineDef:
    doc = yaml.safe_load(text)
    if not isinstance(doc, dict) or "source" not in doc or "sink" not in doc:
        raise ValueError("pipeline YAML needs 'source' and 'sink' blocks")

    s = doc["source"]
    source = SourceDef(type=str(s["type"]), name=s.get("name"),
                       options=_opts(s, {"type", "name"}))
    k = doc["sink"]
    sink = SinkDef(
        type=str(k["type"]), name=k.get("name"),
        include_schema_types=_split_list(k.get("include.schema.changes")),
        exclude_schema_types=_split_list(k.get("exclude.schema.changes")),
        options=_opts(k, {"type", "name", "include.schema.changes", "exclude.schema.changes"}),
    )

    routes = [
        RouteRule(
            source_table=r["source-table"],
            sink_table=r["sink-table"],
            replace_symbol=r.get("replace-symbol", "<>"),
            description=r.get("description"),
        )
        for r in doc.get("route") or []
    ]
    transforms = [
        TransformRule(
            source_table=t["source-table"],
            projection=t.get("projection"),
            filter=t.get("filter"),
            primary_keys=_split_list(t.get("primary-keys")),
            partition_keys=_split_list(t.get("partition-keys")),
            table_options=_opts(
                dict(kv.split("=", 1) for kv in _split_list(t.get("table-options"))), set()
            ) if t.get("table-options") else (),
            converter_after_transform=t.get("converter-after-transform"),
            description=t.get("description"),
        )
        for t in doc.get("transform") or []
    ]

    p = doc.get("pipeline") or {}
    udfs = [
        UdfDef(name=u["name"], classpath=u["classpath"])
        for u in p.get("user-defined-function") or []
    ]
    models = [
        ModelDef(name=m["model-name"], model=m.get("model", ""),
                 options=_opts(m, {"model-name", "model"}))
        for m in p.get("model") or []
    ]
    config = PipelineConfig(
        name=p.get("name", "pipeline"),
        parallelism=int(p.get("parallelism", 1)),
        local_time_zone=p.get("local-time-zone", "UTC"),
        schema_change_behavior=SchemaChangeBehavior(
            str(p.get("schema.change.behavior", "lenient")).lower()
        ),
        batch_mode=str(p.get("execution.runtime-mode", "STREAMING")).upper() == "BATCH",
        extra={k2: v for k2, v in p.items() if k2 not in {
            "name", "parallelism", "local-time-zone", "schema.change.behavior",
            "execution.runtime-mode", "user-defined-function", "model"}},
    )
    return PipelineDef(source=source, sink=sink, routes=routes,
                       transforms=transforms, udfs=udfs, models=models, config=config)

from .schema_evolution import (
    SchemaChangeBehavior,
    apply_schema_change_event,
    coercion_select,
    get_common_schema,
    lenientize,
    normalize_schema_change_events,
)
from .schema_registry import SchemaRegistry
from .route import RouteRule, TableIdRouter
from .transform import TransformRule, PreTransform, PostTransform

__all__ = [
    "SchemaChangeBehavior",
    "apply_schema_change_event",
    "coercion_select",
    "get_common_schema",
    "lenientize",
    "normalize_schema_change_events",
    "SchemaRegistry",
    "RouteRule",
    "TableIdRouter",
    "TransformRule",
    "PreTransform",
    "PostTransform",
]

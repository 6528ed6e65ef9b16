from .definition import PipelineDef, SourceDef, SinkDef, UdfDef, parse_yaml_pipeline
from .composer import PipelineComposer, PipelineExecution

__all__ = [
    "PipelineDef",
    "SourceDef",
    "SinkDef",
    "UdfDef",
    "parse_yaml_pipeline",
    "PipelineComposer",
    "PipelineExecution",
]

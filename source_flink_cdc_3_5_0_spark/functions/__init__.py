from .dialect import compile_expression, parse_projection, ExpressionError
from .datetime_patterns import translate_java_pattern

__all__ = [
    "compile_expression",
    "parse_projection",
    "ExpressionError",
    "translate_java_pattern",
]

"""UDF fixtures for pipeline user-defined-function tests."""


def format_val(v: int) -> str:
    return f"v={v}"

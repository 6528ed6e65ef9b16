"""Table identity and regex-based table selectors.

Parity target: ``flink-cdc-common/.../event/TableId.java`` (3-part id
``namespace.schemaName.tableName``) and ``schema/Selectors.java`` +
``utils/Predicates.java``: a selector pattern is split on **unescaped dots**
into 1-3 parts (``\\.`` protects a dot from the splitter and is unescaped to
``.`` inside the part), and each part is an anchored regex matched against
the corresponding id component. Docs idiom: ``mydb.\\.*`` = every table of
``mydb``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache


@dataclass(frozen=True, order=True)
class TableId:
    """3-part table identity: ``namespace.schema_name.table_name``.

    Parts may be empty; string form omits empty leading parts, mirroring
    ``TableId.java`` (tableName / schemaName.tableName / ns.schema.table).
    """

    namespace: str
    schema_name: str
    table_name: str

    @staticmethod
    def parse(identifier: str) -> "TableId":
        parts = identifier.split(".")
        if len(parts) == 1:
            return TableId("", "", parts[0])
        if len(parts) == 2:
            return TableId("", parts[0], parts[1])
        if len(parts) == 3:
            return TableId(parts[0], parts[1], parts[2])
        raise ValueError(f"Invalid table identifier (1-3 dot-parts): {identifier!r}")

    def identifier(self) -> str:
        if self.namespace:
            return f"{self.namespace}.{self.schema_name}.{self.table_name}"
        if self.schema_name:
            return f"{self.schema_name}.{self.table_name}"
        return self.table_name

    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.identifier()


def split_on_unescaped_dots(pattern: str) -> list[str]:
    """Parity: ``Predicates.RegExSplitterByDot.split`` — split on dots not
    preceded by a backslash, drop empty parts, unescape ``\\.`` -> ``.``."""
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern) and pattern[i + 1] == ".":
            cur.append(".")  # unescape: part-level regex sees '.'
            i += 2
            continue
        if c == ".":
            part = "".join(cur).strip()
            if part:
                parts.append(part)
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    part = "".join(cur).strip()
    if part:
        parts.append(part)
    return parts


def split_on_unescaped_commas(spec: str) -> list[str]:
    """Parity: ``Predicates.RegExSplitterByComma.split`` (``\\,`` escapes)."""
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(spec):
        c = spec[i]
        if c == "\\" and i + 1 < len(spec) and spec[i + 1] == ",":
            cur.append(",")
            i += 2
            continue
        if c == ",":
            part = "".join(cur).strip()
            if part:
                parts.append(part)
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    part = "".join(cur).strip()
    if part:
        parts.append(part)
    return parts


class _Selector:
    """One rule: up to three anchored part-regexes (Selectors.Selector)."""

    def __init__(self, pattern: str):
        parts = split_on_unescaped_dots(pattern)
        if not 1 <= len(parts) <= 3:
            raise ValueError(f"Invalid table inclusion pattern: {pattern!r}")
        compiled = [re.compile(f"^(?:{p})$") for p in parts]
        self.ns = self.schema = self.table = None
        if len(parts) == 1:
            self.table = compiled[0]
        elif len(parts) == 2:
            self.schema, self.table = compiled
        else:
            self.ns, self.schema, self.table = compiled

    def is_match(self, t: TableId) -> bool:
        # Parity with Selector.isMatch: a missing pattern part is an
        # always-false predicate, so e.g. a 2-part rule never matches a
        # 3-part table id.
        if not t.namespace:
            if not t.schema_name:
                return self.table is not None and bool(self.table.match(t.table_name))
            return (
                self.schema is not None
                and self.table is not None
                and bool(self.schema.match(t.schema_name))
                and bool(self.table.match(t.table_name))
            )
        return (
            self.ns is not None
            and self.schema is not None
            and self.table is not None
            and bool(self.ns.match(t.namespace))
            and bool(self.schema.match(t.schema_name))
            and bool(self.table.match(t.table_name))
        )


class Selectors:
    """Comma-separated list of table-matching rules (any-match)."""

    def __init__(self, selector_spec: str):
        self._spec = selector_spec
        self._selectors = [_Selector(r) for r in split_on_unescaped_commas(selector_spec)]
        if not self._selectors:
            raise ValueError("Invalid table inclusion pattern: empty")

    def is_match(self, table_id: TableId | str) -> bool:
        t = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        return any(s.is_match(t) for s in self._selectors)

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return f"Selectors({self._spec!r})"


@lru_cache(maxsize=4096)
def cached_selectors(spec: str) -> Selectors:
    """Memoized selector construction (route/transform rules re-use specs).

    Mirrors the reference's per-entity caches (``TableIdRouter.routingCache``).
    """
    return Selectors(spec)

"""Replay-idempotent per-table DDL spool, shared by the sinks that render
schema events as statement text for a live executor (Stream Load's
MySQL-protocol spool, the MaxCompute SQLTask spool).

Replay discipline: a restarted micro-batch re-applies its schema events,
so a statement group identical to the LAST appended one is skipped.  A
DATA batch between two identical groups means the second one is a REAL
repeat (e.g. TRUNCATE → load → TRUNCATE), not a replay — the sink's
write path calls :func:`clear_replay_marker` to re-arm the spool.
"""

from __future__ import annotations

import hashlib
import os

_MARKER = "_ddl_last"


def spool_ddl(table_dir: str, stmts: list[str]) -> bool:
    """Append ``stmts`` to ``table_dir/ddl.sql`` unless they replay the
    last appended group.  Returns True iff appended."""
    os.makedirs(table_dir, exist_ok=True)
    digest = hashlib.md5("\n".join(stmts).encode()).hexdigest()
    marker = os.path.join(table_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == digest:
                return False
    with open(os.path.join(table_dir, "ddl.sql"), "a") as f:
        for s in stmts:
            f.write(s + ";\n")
    with open(marker, "w") as f:
        f.write(digest)
    return True


def clear_replay_marker(table_dir: str) -> None:
    """Re-arm the spool after a DATA batch: the next identical DDL group
    is a real repeat, not a micro-batch replay."""
    try:
        os.unlink(os.path.join(table_dir, _MARKER))
    except FileNotFoundError:
        pass

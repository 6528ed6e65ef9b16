"""Legacy-connector offset algebra: SQL Server/Db2 LSNs, Oracle SCNs.

Parity targets: `flink-cdc-connect/flink-cdc-source-connectors/
flink-connector-sqlserver-cdc/.../offset/LsnOffset.java` (offset map keys
change_lsn / commit_lsn / event_serial_no, NO_STOPPING as the max,
comparison on commit_lsn with unavailable-LSN ordering),
`flink-connector-db2-cdc/.../offset/LsnOffset.java` (same shape), and
`flink-connector-oracle-cdc/.../meta/offset/RedoLogOffset.java` (keys
scn / commit_scn / lcr_position, comparison on scn).

These connectors' WIRE path is Debezium (their change events flow through
the engine's debezium-json decode; type maps live in `common/types.py`) —
what still carries semantics of its own is the offset ordering used for
snapshot/stream stitching and stop-conditions, reproduced here branch for
branch. The SQL Server LSN value itself is the 10-byte database log
sequence number rendered `XXXXXXXX:XXXXXXXX:XXXX` (three hex groups), a
public SQL Server convention (`sys.fn_cdc_*` functions).
"""

from __future__ import annotations

from dataclasses import dataclass


def _cmp(a, b) -> int:
    return (a > b) - (a < b)


# ---------------------------------------------------------------------------
# SQL Server / Db2 LSN
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Lsn:
    """10-byte SQL Server log sequence number (io.debezium Lsn analog)."""

    data: bytes | None  # None = NULL/unavailable

    NULL_STRING = "NULL"

    @classmethod
    def valueOf(cls, value) -> "Lsn":
        if value is None:
            return cls(None)
        if isinstance(value, (bytes, bytearray)):
            return cls(bytes(value))
        s = str(value).strip()
        if not s or s.upper() == cls.NULL_STRING:
            return cls(None)
        if ":" in s:
            groups = s.split(":")
            if len(groups) != 3 or [len(g) for g in groups] != [8, 8, 4]:
                raise ValueError("not a SQL Server LSN string: %r" % s)
            return cls(bytes.fromhex("".join(groups)))
        # Db2's 16-byte IBMSNAP sequences render as plain fixed-width hex
        if len(s) % 2 or not all(c in "0123456789abcdefABCDEF" for c in s):
            raise ValueError("not a SQL Server LSN string: %r" % s)
        return cls(bytes.fromhex(s))

    @property
    def available(self) -> bool:
        return self.data is not None

    def __str__(self) -> str:
        if self.data is None:
            return self.NULL_STRING
        if len(self.data) > 10:  # Db2 IBMSNAP: plain fixed-width hex
            return self.data.hex().upper()
        h = self.data.hex().upper().rjust(20, "0")
        return f"{h[:8]}:{h[8:16]}:{h[16:20]}"

    def compare(self, other: "Lsn") -> int:
        if self.data is None or other.data is None:
            return _cmp(self.data is not None, other.data is not None)
        width = max(len(self.data), len(other.data), 10)
        return _cmp(self.data.rjust(width, b"\x00"),
                    other.data.rjust(width, b"\x00"))


@dataclass(frozen=True)
class LsnOffset:
    """`LsnOffset.java` parity: {change_lsn, commit_lsn, event_serial_no}.

    The sentinel offsets use the reference's exact single-byte LSNs
    (Byte.MIN_VALUE / Byte.MAX_VALUE); comparison keys on commit_lsn with
    unavailable-before-available ordering, NO_STOPPING as the maximum.
    """

    change_lsn: Lsn
    commit_lsn: Lsn | None = None
    event_serial_no: int | None = None

    @classmethod
    def initial(cls) -> "LsnOffset":
        return cls(Lsn(bytes([0x80])))  # Byte.MIN_VALUE

    @classmethod
    def no_stopping(cls) -> "LsnOffset":
        return cls(Lsn(bytes([0x7F])))  # Byte.MAX_VALUE

    def offset_map(self) -> dict:
        out = {}
        if self.change_lsn.available:
            out["change_lsn"] = str(self.change_lsn)
        if self.commit_lsn is not None and self.commit_lsn.available:
            out["commit_lsn"] = str(self.commit_lsn)
        if self.event_serial_no is not None:
            out["event_serial_no"] = str(self.event_serial_no)
        return out

    def to_json(self) -> str:
        import json

        return json.dumps(self.offset_map(), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "LsnOffset":
        import json

        d = json.loads(s)
        return cls(Lsn.valueOf(d.get("change_lsn")),
                   Lsn.valueOf(d.get("commit_lsn"))
                   if "commit_lsn" in d else None,
                   int(d["event_serial_no"])
                   if "event_serial_no" in d else None)

    def compare(self, that: "LsnOffset") -> int:
        ns = LsnOffset.no_stopping()
        if self == ns and that == ns:
            return 0
        if self == ns:
            return 1
        if that == ns:
            return -1
        mine = self.commit_lsn if self.commit_lsn is not None else Lsn(None)
        theirs = that.commit_lsn if that.commit_lsn is not None else Lsn(None)
        if theirs.available:
            if mine.available:
                return mine.compare(theirs)
            return -1
        if mine.available:
            return 1
        return 0


# ---------------------------------------------------------------------------
# Oracle SCN
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RedoLogOffset:
    """`RedoLogOffset.java` parity: {scn, commit_scn, lcr_position},
    compared by SCN; NO_STOPPING (the Long.MIN_VALUE sentinel) is max."""

    scn: int
    commit_scn: int = 0
    lcr_position: str | None = None

    _NO_STOPPING_SCN = -(1 << 63)  # Long.MIN_VALUE sentinel

    @classmethod
    def initial(cls) -> "RedoLogOffset":
        return cls(0)

    @classmethod
    def no_stopping(cls) -> "RedoLogOffset":
        return cls(cls._NO_STOPPING_SCN)

    def offset_map(self) -> dict:
        return {"scn": str(self.scn), "commit_scn": str(self.commit_scn),
                "lcr_position": self.lcr_position}

    def to_json(self) -> str:
        import json

        return json.dumps(self.offset_map(), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "RedoLogOffset":
        import json

        d = json.loads(s)
        return cls(int(d["scn"]), int(d.get("commit_scn", 0) or 0),
                   d.get("lcr_position"))

    def compare(self, that: "RedoLogOffset") -> int:
        ns = self._NO_STOPPING_SCN
        if self.scn == ns and that.scn == ns:
            return 0
        if self.scn == ns:
            return 1
        if that.scn == ns:
            return -1
        return _cmp(self.scn, that.scn)

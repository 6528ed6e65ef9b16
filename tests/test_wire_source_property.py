"""Property tests for the binary wire sources (binlog / pgoutput).

Two invariants a CDC decoder must never break:

1. **Model equivalence** — randomized churn scripts encoded to wire bytes
   and decoded back replay to exactly the state the script produces on a
   plain dict (both update conventions, deletes, multi-row events, file
   rotations with GTID continuity).
2. **No silent corruption** — any single byte flip in a binlog file raises
   (CRC32 trailers cover every event byte, and checksum detection itself
   refuses inconsistent FDEs); flips may NEVER yield a different decode
   without an error.
"""

import pytest
from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
    BinlogColumn, BinlogTableMap, BinlogWriter, DELETE_ROWS_EVENT,
    MYSQL_TYPE_LONG, MYSQL_TYPE_NEWDECIMAL, MYSQL_TYPE_VARCHAR,
    UPDATE_ROWS_EVENT, WRITE_ROWS_EVENT, binlog_changes)
from source_flink_cdc_3_5_0_spark.sources.pgoutput import (
    OID_INT4, OID_NUMERIC, OID_VARCHAR, PgColumn, PgOutputWriter,
    PgRelation, pgoutput_changes)

UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

# a churn step: (op 0=insert 1=update 2=delete, key 0..7, payload int)
_STEP = st.tuples(st.integers(0, 2), st.integers(0, 7), st.integers(0, 999))


def _apply_script(script):
    """The oracle: replay the script on a plain dict keyed by id."""
    state: dict[int, dict] = {}
    effective = []
    for op, key, val in script:
        row = dict(id=key, name="v%d" % val, price="%d.%02d" % (val, val % 100))
        if op == 0 and key not in state:
            state[key] = row
            effective.append(("I", None, row))
        elif op == 1 and key in state:
            before = state[key]
            state[key] = row
            effective.append(("U", before, row))
        elif op == 2 and key in state:
            effective.append(("D", state.pop(key), None))
    return state, effective


def _replay_changelog(changes):
    state: dict[int, dict] = {}
    for c in changes:
        if c.get("op") == "+I" or c.get("op") == "+U":
            state[c["after"]["id"]] = c["after"]
        elif c.get("op") == "-D":
            state.pop(c["before"]["id"], None)
    return state


@given(st.lists(_STEP, min_size=1, max_size=30), st.integers(1, 4))
@settings(max_examples=60, deadline=None)
def test_binlog_churn_matches_model(script, n_files):
    """Wire round-trip replays to the model state, across file rotations
    with PREVIOUS_GTIDS continuity; every change carries the coordinates."""
    cols = (BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),
            BinlogColumn("name", MYSQL_TYPE_VARCHAR, (255,)),
            BinlogColumn("price", MYSQL_TYPE_NEWDECIMAL, (10, 2)))
    tmap = BinlogTableMap(60, "d", "t", cols, (0,))
    want_state, effective = _apply_script(script)

    # split the effective ops across files; each transaction = one op
    per_file = max(1, len(effective) // n_files + 1)
    chunks = [effective[i:i + per_file]
              for i in range(0, len(effective), per_file)] or [[]]
    all_changes = []
    gno = 0
    for fno, chunk in enumerate(chunks, start=1):
        prev = f"{UUID}:1-{gno}" if gno else None
        w = BinlogWriter(previous_gtids=prev)
        for kind, before, after in chunk:
            gno += 1
            w.gtid(UUID, gno)
            w.table_map(tmap)
            if kind == "I":
                w.rows(tmap, WRITE_ROWS_EVENT, [after])
            elif kind == "U":
                w.rows(tmap, UPDATE_ROWS_EVENT, [(before, after)])
            else:
                w.rows(tmap, DELETE_ROWS_EVENT, [before])
            w.xid(gno)
        fname = "mysql-bin.%06d" % fno
        all_changes.extend(binlog_changes(w.getvalue(), fname))

    got_state = _replay_changelog(all_changes)
    want = {k: {"id": v["id"], "name": v["name"], "price": v["price"]}
            for k, v in want_state.items()}
    got = {k: {"id": v["id"], "name": v["name"], "price": v["price"]}
           for k, v in got_state.items()}
    assert got == want
    # GTID continuity: the last record's executed set covers every commit
    # strictly before its own transaction
    if all_changes:
        last = all_changes[-1]
        if gno > 1:
            assert last["gtids"] == f"{UUID}:1-{gno - 1}"


@given(st.data())
@settings(max_examples=80, deadline=None)
def test_binlog_bitflip_never_silent(data):
    """CRC32 coverage: flipping ANY byte after the magic raises — a flip
    can never produce a different successful decode."""
    cols = (BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),
            BinlogColumn("name", MYSQL_TYPE_VARCHAR, (255,)))
    tmap = BinlogTableMap(61, "d", "t", cols, (0,))
    w = BinlogWriter()
    w.gtid(UUID, 1)
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=i, name="n%d" % i)
                                    for i in range(5)])
    w.rows(tmap, UPDATE_ROWS_EVENT, [(dict(id=1, name="n1"),
                                      dict(id=1, name="X"))])
    w.xid(1)
    blob = bytearray(w.getvalue())
    i = data.draw(st.integers(4, len(blob) - 1))
    bit = data.draw(st.integers(0, 7))
    blob[i] ^= 1 << bit
    with pytest.raises(ValueError):
        binlog_changes(bytes(blob), "f")


def _changes_via_spark(spark, lines, decode_fn, payload_ddl):
    from pyspark.sql import types as T

    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    out = decode_fn(raw, T.StructType.fromDDL(payload_ddl))
    return [r.asDict(recursive=True)
            for r in out.orderBy("__seq").collect()]


def _replay_envelope(rows):
    state: dict[int, dict] = {}
    for r in rows:
        if r["__op"] in ("+I", "+U"):
            state[r["id"]] = {"id": r["id"], "name": r["name"]}
        elif r["__op"] == "-D":
            state.pop(r["id"], None)
    return state


@given(st.lists(_STEP, min_size=1, max_size=20))
@settings(max_examples=12, deadline=None)
def test_sqlserver_churn_matches_model(spark, script):
    """Change-table capture round-trips to the model state through the
    declarative decode (update pairs, per-txn seqvals)."""
    from source_flink_cdc_3_5_0_spark.sources.sqlserver import (
        SqlServerCdcWriter, decode_sqlserver_cdc)

    want_state, effective = _apply_script(script)
    w = SqlServerCdcWriter()
    for kind, before, after in effective:
        w.begin_txn()
        row = {k: (after or before)[k] for k in ("id", "name")}
        if kind == "I":
            w.insert("t", row)
        elif kind == "U":
            w.update("t", {k: before[k] for k in ("id", "name")},
                     row, changed_mask=0b10)
        else:
            w.delete("t", {k: before[k] for k in ("id", "name")})
    rows = _changes_via_spark(spark, w.lines, decode_sqlserver_cdc,
                              "id INT, name STRING")
    got = _replay_envelope(rows)
    assert got == {k: {"id": v["id"], "name": v["name"]}
                   for k, v in want_state.items()}


@given(st.lists(_STEP, min_size=1, max_size=20))
@settings(max_examples=12, deadline=None)
def test_db2_churn_matches_model(spark, script):
    """Raw D/I capture rows classified by the LEAD/LAG CASE round-trip to
    the model state — one transaction per op, so the adjacency heuristic
    only ever sees genuine update pairs."""
    from source_flink_cdc_3_5_0_spark.sources.db2 import (
        Db2CdcWriter, decode_db2_cdc)

    want_state, effective = _apply_script(script)
    w = Db2CdcWriter()
    for kind, before, after in effective:
        w.begin_txn()
        row = {k: (after or before)[k] for k in ("id", "name")}
        if kind == "I":
            w.insert("t", row)
        elif kind == "U":
            w.update("t", {k: before[k] for k in ("id", "name")}, row)
        else:
            w.delete("t", {k: before[k] for k in ("id", "name")})
    rows = _changes_via_spark(spark, w.lines, decode_db2_cdc,
                              "id INT, name STRING")
    got = _replay_envelope(rows)
    assert got == {k: {"id": v["id"], "name": v["name"]}
                   for k, v in want_state.items()}


@given(st.lists(_STEP, min_size=1, max_size=25))
@settings(max_examples=30, deadline=None)
def test_oracle_redo_churn_matches_model(script):
    """Redo SQL rendered and parsed back replays to the model state
    (pure-python path; the Spark bridge is covered by the e2e tests)."""
    import json

    from source_flink_cdc_3_5_0_spark.sources.oracle import (
        LogMinerWriter, parse_redo_sql)

    want_state, effective = _apply_script(script)
    w = LogMinerWriter()
    for kind, before, after in effective:
        row = {k: (after or before)[k] for k in ("id", "name")}
        if kind == "I":
            w.insert("T", row)
        elif kind == "U":
            w.update("T", {k: before[k] for k in ("id", "name")},
                     {"name": after["name"]})
        else:
            w.delete("T", {k: before[k] for k in ("id", "name")})
    state: dict[int, dict] = {}
    for line in w.lines:
        rec = json.loads(line)
        kind, _, _, b, a = parse_redo_sql(rec["sql_redo"])
        if kind in ("INSERT", "UPDATE"):
            state[a["id"]] = {"id": a["id"], "name": a["name"]}
        else:
            state.pop(b["id"], None)
    assert state == {k: {"id": v["id"], "name": v["name"]}
                     for k, v in want_state.items()}


@given(st.lists(_STEP, min_size=1, max_size=30), st.booleans())
@settings(max_examples=60, deadline=None)
def test_pgoutput_churn_matches_model(script, full_identity):
    """pgoutput round-trip replays to the model state under both replica
    identities; LSNs are strictly increasing."""
    rel = PgRelation(70, "public", "t", "f" if full_identity else "d", (
        PgColumn("id", OID_INT4, key=True),
        PgColumn("name", OID_VARCHAR, 68),
        PgColumn("price", OID_NUMERIC, (10 << 16 | 2) + 4)))
    want_state, effective = _apply_script(script)
    w = PgOutputWriter()
    w.relation(rel)
    for kind, before, after in effective:
        w.begin()
        if kind == "I":
            w.insert(rel, after)
        elif kind == "U":
            w.update(rel, before, after)
        else:
            w.delete(rel, before)
        w.commit()
    changes = pgoutput_changes(w.getvalue())
    got_state = _replay_changelog(changes)
    want = {k: {"id": v["id"], "name": v["name"], "price": v["price"]}
            for k, v in want_state.items()}
    assert got_state == want
    lsns = [c["lsn"] for c in changes]
    assert lsns == sorted(set(lsns))
    # identity contract: full ships whole old images, default key-only
    for c in changes:
        if c["op"] == "+U" and c["before"] is not None:
            assert set(c["before"]) == (
                {"id", "name", "price"} if full_identity else {"id"})

"""MySQL 8 binlog features round 10 closes: TRANSACTION_PAYLOAD (type 40,
`binlog_transaction_compression=ON`), PARTIAL_UPDATE_ROWS (type 39,
`binlog_row_value_options=PARTIAL_JSON`), and named refusals for the
row-bearing event types this decoder will not decode (v1 rows 23-25,
ZSTD payloads). Reference parity: the `mysql-binlog-connector-java`
jar's TransactionPayloadEventDataDeserializer and partial-JSON support
(the jar the reference's MySQL connector shades); wire formats from the
public MySQL sources (libbinlogevents control_events.h, rows_event.h,
sql/json_diff.cc WL#2955).
"""

import struct

import pytest

from source_flink_cdc_3_5_0_spark.common.mysql_json import (
    JSON_DIFF_INSERT, JSON_DIFF_REMOVE, JSON_DIFF_REPLACE, JsonDiff,
    JsonDiffVector, apply_json_diffs, decode_json_diffs, encode_json,
    encode_json_diffs, parse_json_path)
from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
    DELETE_ROWS_EVENT_V1, MYSQL_TYPE_JSON, MYSQL_TYPE_LONG,
    MYSQL_TYPE_VARCHAR, PARTIAL_UPDATE_ROWS_EVENT, TRANSACTION_PAYLOAD_EVENT,
    UPDATE_ROWS_EVENT_V1, WRITE_ROWS_EVENT, WRITE_ROWS_EVENT_V1,
    BinlogColumn, BinlogReader, BinlogTableMap, BinlogWriter,
    binlog_changes)

UUID = "11111111-2222-3333-4444-555555555555"


def _table():
    cols = (BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),
            BinlogColumn("doc", MYSQL_TYPE_JSON, (4,), False, True),
            BinlogColumn("v", MYSQL_TYPE_VARCHAR, (255,)))
    return BinlogTableMap(7, "db", "t", cols, (0,))


# ---------------------------------------------------------------------------
# JSON diff vector codec + apply
# ---------------------------------------------------------------------------


def test_json_diff_known_answer_bytes():
    """Byte-level pin of json_diff.cc's serialization: op byte, lenc
    path, lenc-prefixed full binary-JSON value; REMOVE carries no
    value."""
    diffs = [JsonDiff(JSON_DIFF_REPLACE, "$.a", 7),
             JsonDiff(JSON_DIFF_REMOVE, "$.b")]
    val = encode_json(7)  # type byte 0x05 (int16) + <h
    expect = (bytes([0]) + bytes([3]) + b"$.a"
              + bytes([len(val)]) + val
              + bytes([2]) + bytes([3]) + b"$.b")
    assert encode_json_diffs(diffs) == expect
    assert decode_json_diffs(expect) == diffs


def test_json_diff_roundtrip_all_ops():
    diffs = JsonDiffVector([
        JsonDiff(JSON_DIFF_REPLACE, "$", {"whole": ["doc"]}),
        JsonDiff(JSON_DIFF_INSERT, '$."quoted key"[0]', None),
        JsonDiff(JSON_DIFF_REMOVE, "$.deep.path[3]"),
        JsonDiff(JSON_DIFF_REPLACE, "$.s", "x" * 300),
    ])
    assert decode_json_diffs(encode_json_diffs(diffs)) == list(diffs)


def test_json_diff_unknown_op_rejected():
    with pytest.raises(ValueError, match="unknown operation byte"):
        decode_json_diffs(bytes([9, 1]) + b"$")


def test_parse_json_path():
    assert parse_json_path("$") == []
    assert parse_json_path("$.a.b") == ["a", "b"]
    assert parse_json_path("$[0][12]") == [0, 12]
    assert parse_json_path('$."a.b"[1].c') == ["a.b", 1, "c"]
    assert parse_json_path('$."q\\"uo"') == ['q"uo']
    for bad in ("a.b", "$..", "$x"):
        with pytest.raises(ValueError):
            parse_json_path(bad)


def test_apply_json_diffs():
    doc = {"a": 1, "b": [1, 2], "c": {"d": "x"}}
    out = apply_json_diffs(doc, [
        JsonDiff(JSON_DIFF_REPLACE, "$.a", 42),
        JsonDiff(JSON_DIFF_INSERT, "$.b[1]", 99),
        JsonDiff(JSON_DIFF_REMOVE, "$.c.d"),
        JsonDiff(JSON_DIFF_INSERT, "$.e", True)])
    assert out == {"a": 42, "b": [1, 99, 2], "c": {}, "e": True}
    # input not mutated
    assert doc == {"a": 1, "b": [1, 2], "c": {"d": "x"}}
    # root replace
    assert apply_json_diffs(doc, [JsonDiff(JSON_DIFF_REPLACE, "$", 5)]) == 5
    # REPLACE requires the path to exist
    with pytest.raises(ValueError, match="cannot apply"):
        apply_json_diffs(doc, [JsonDiff(JSON_DIFF_REPLACE, "$.zz", 1)])
    with pytest.raises(ValueError, match="does not resolve"):
        apply_json_diffs(doc, [JsonDiff(JSON_DIFF_REMOVE, "$.zz.q")])


# ---------------------------------------------------------------------------
# PARTIAL_UPDATE_ROWS_EVENT (39)
# ---------------------------------------------------------------------------


def test_partial_update_reconstructs_after_image():
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    before = dict(id=1, doc={"a": 1, "b": [1, 2], "c": "x"}, v="k")
    diffs = JsonDiffVector([
        JsonDiff(JSON_DIFF_REPLACE, "$.a", 42),
        JsonDiff(JSON_DIFF_INSERT, "$.b[1]", 99),
        JsonDiff(JSON_DIFF_REMOVE, "$.c")])
    w.partial_update_rows(tmap, [(before, dict(id=1, doc=diffs, v="k"))])
    ch = binlog_changes(w.getvalue(), "f")
    assert [c["op"] for c in ch] == ["-U", "+U"]
    assert ch[0]["before"] == before
    assert ch[1]["after"] == dict(id=1, doc={"a": 42, "b": [1, 99, 2]},
                                  v="k")


def test_partial_update_empty_diff_vector_means_unchanged():
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    before = dict(id=1, doc={"keep": ["me"]}, v="k")
    w.partial_update_rows(
        tmap, [(before, dict(id=1, doc=JsonDiffVector(), v="k2"))])
    ch = binlog_changes(w.getvalue(), "f")
    assert ch[1]["after"] == dict(id=1, doc={"keep": ["me"]}, v="k2")


def test_partial_update_mixed_rows_and_whole_values():
    """Rows with and without partial cells interleave in one event —
    value_options is per after-image row, not per event."""
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    b1 = dict(id=1, doc={"n": 1}, v="a")
    b2 = dict(id=2, doc={"n": 2}, v="b")
    w.partial_update_rows(tmap, [
        (b1, dict(id=1, doc=JsonDiffVector([
            JsonDiff(JSON_DIFF_REPLACE, "$.n", 10)]), v="a")),
        (b2, dict(id=2, doc={"whole": True}, v="b2")),
    ])
    ch = binlog_changes(w.getvalue(), "f")
    afters = [c["after"] for c in ch if c["op"] == "+U"]
    assert afters == [dict(id=1, doc={"n": 10}, v="a"),
                      dict(id=2, doc={"whole": True}, v="b2")]


def test_partial_update_minimal_image_surfaces_diff_marker():
    """MINIMAL before-image (PK only) + partial JSON: the source document
    is absent, so the after cell surfaces the documented __json_diff__
    marker — visible, never silently wrong."""
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    diffs = JsonDiffVector([JsonDiff(JSON_DIFF_REPLACE, "$.a", 1)])
    w.partial_update_rows(tmap, [(dict(id=1), dict(id=1, doc=diffs))],
                          columns_present=["id"],
                          columns_present_after=["id", "doc"])
    ch = binlog_changes(w.getvalue(), "f")
    assert ch[1]["after"]["doc"] == {"__json_diff__": [
        {"op": JSON_DIFF_REPLACE, "path": "$.a", "value": 1}]}


def test_partial_update_null_after_value():
    """A NULL after-value's null bit wins over the partial flag."""
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    before = dict(id=1, doc={"a": 1}, v="k")
    w.partial_update_rows(tmap, [(before, dict(id=1, doc=None, v="k"))])
    ch = binlog_changes(w.getvalue(), "f")
    assert ch[1]["after"]["doc"] is None


# ---------------------------------------------------------------------------
# TRANSACTION_PAYLOAD_EVENT (40)
# ---------------------------------------------------------------------------


def _payload_file():
    tmap = _table()
    w = BinlogWriter()
    w.gtid(UUID, 1)
    inner = BinlogWriter.embedded()
    inner.query("BEGIN")
    inner.table_map(tmap)
    inner.rows(tmap, WRITE_ROWS_EVENT,
               [dict(id=1, doc={"a": 1}, v="x"),
                dict(id=2, doc=None, v="y")])
    inner.xid(9)
    w.transaction_payload(inner)
    return w


def test_transaction_payload_none_decodes_embedded_stream():
    w = _payload_file()
    ch = binlog_changes(w.getvalue(), "f.000001")
    rows = [c for c in ch if c["kind"] == "change"]
    assert [(c["op"], c["after"]["id"]) for c in rows] == [("+I", 1),
                                                           ("+I", 2)]
    assert rows[0]["after"]["doc"] == {"a": 1}
    # inner records report the CONTAINER's end position (real file
    # coordinates — what a resume offset must point at)
    r = BinlogReader(w.getvalue())
    payload_ev = [e for e in r.events()
                  if e.type_byte == TRANSACTION_PAYLOAD_EVENT][0]
    assert all(c["pos"] == payload_ev.log_pos for c in rows)
    assert payload_ev.fields["compression"] == 255
    types = [e.type_byte for e in payload_ev.fields["events"]]
    assert types == [2, 19, WRITE_ROWS_EVENT, 16]  # QUERY TABLE_MAP ROWS XID


def test_transaction_payload_gtid_advances_at_inner_xid():
    w = _payload_file()
    w.gtid(UUID, 2)
    inner2 = BinlogWriter.embedded()
    inner2.query("BEGIN")
    tmap = _table()
    inner2.table_map(tmap)
    inner2.rows(tmap, WRITE_ROWS_EVENT, [dict(id=3, doc=None, v="z")])
    inner2.xid(10)
    w.transaction_payload(inner2)
    ch = [c for c in binlog_changes(w.getvalue(), "f") if c["kind"] == "change"]
    # the second transaction's records carry txn 1 as already-executed
    assert ch[-1]["gtids"] == f"{UUID}:1-1"
    assert ch[-1]["txn_gtid"] == f"{UUID}:2"


def test_transaction_payload_zstd_roundtrip():
    """ZSTD containers (the server's real algorithm) decode through the
    ctypes libzstd binding — rows, positions and all."""
    from source_flink_cdc_3_5_0_spark.common import zstd_binding

    if not zstd_binding.available():
        pytest.skip("no libzstd on this host")
    tmap = _table()
    w = BinlogWriter()
    inner = BinlogWriter.embedded()
    inner.query("BEGIN")
    inner.table_map(tmap)
    inner.rows(tmap, WRITE_ROWS_EVENT,
               [dict(id=i, doc={"n": i}, v="zstd-row-%d" % i)
                for i in range(1, 101)])
    inner.xid(4)
    w.transaction_payload(inner, compression="zstd")
    # the wire really is compressed: payload event smaller than the raw
    ev = [e for e in BinlogReader(w.getvalue()).events()
          if e.type_byte == TRANSACTION_PAYLOAD_EVENT][0]
    assert ev.fields["compression"] == 0
    assert ev.fields["uncompressed_size"] == len(inner.getvalue())
    rows = [c for c in binlog_changes(w.getvalue(), "f")
            if c["kind"] == "change"]
    assert [c["after"]["id"] for c in rows] == list(range(1, 101))
    assert rows[41]["after"] == dict(id=42, doc={"n": 42}, v="zstd-row-42")


def test_transaction_payload_zstd_cli_cross_validation(tmp_path):
    """A frame produced by the INDEPENDENTLY-DRIVEN zstd CLI decodes
    through the decoder's binding, and the writer's frame decodes
    through the CLI — both directions of RFC 8878."""
    import shutil
    import struct as _s
    import subprocess

    from source_flink_cdc_3_5_0_spark.common import zstd_binding

    cli = shutil.which("zstd")
    if cli is None or not zstd_binding.available():
        pytest.skip("no zstd CLI / libzstd on this host")
    tmap = _table()
    inner = BinlogWriter.embedded()
    inner.table_map(tmap)
    inner.rows(tmap, WRITE_ROWS_EVENT, [dict(id=7, doc=None, v="cli")])
    raw = inner.getvalue()
    frame = subprocess.run([cli, "-q", "-c"], input=raw,
                           capture_output=True, check=True).stdout
    # hand-assemble a payload event around the CLI's frame
    usize, psize = len(raw), len(frame)
    def lenc(v):
        from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
            _write_lenc
        return _write_lenc(v)
    body = (bytes([2]) + lenc(len(lenc(0))) + lenc(0)          # ZSTD
            + bytes([3]) + lenc(len(lenc(usize))) + lenc(usize)
            + bytes([1]) + lenc(len(lenc(psize))) + lenc(psize)
            + bytes([0]) + frame)
    w = BinlogWriter()
    w._emit(TRANSACTION_PAYLOAD_EVENT, body)
    rows = [c for c in binlog_changes(w.getvalue(), "f")
            if c["kind"] == "change"]
    assert rows[0]["after"] == dict(id=7, doc=None, v="cli")
    # and the CLI decompresses the writer's frame
    w2 = BinlogWriter()
    w2.transaction_payload(inner, compression="zstd")
    ev = [e for e in BinlogReader(w2.getvalue())._events_raw()
          if e.type_byte == TRANSACTION_PAYLOAD_EVENT][0]
    b = ev.body  # _events_raw already strips the CRC trailer
    pos = 0
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import _read_lenc
    while pos < len(b):
        ftype, pos = _read_lenc(b, pos)
        if ftype == 0:
            break
        flen, pos = _read_lenc(b, pos)
        pos += flen
    out = subprocess.run([cli, "-q", "-d", "-c"], input=bytes(b[pos:]),
                         capture_output=True, check=True).stdout
    assert out == raw
    _ = _s  # keep the import honest if assertions above are edited


def test_transaction_payload_zstd_named_refusal_without_libzstd(
        monkeypatch):
    """Hosts with no zstd codec at all refuse ZSTD containers by name —
    never a silent skip."""
    from source_flink_cdc_3_5_0_spark.common import zstd_binding

    monkeypatch.setattr(zstd_binding, "available", lambda: False)
    w = BinlogWriter()
    ctype = bytes([2, 1, 0])  # field 2 (compression), len 1, ZSTD=0
    body = ctype + bytes([0]) + b"\x00" * 8  # header end + fake payload
    w._emit(TRANSACTION_PAYLOAD_EVENT, body)
    with pytest.raises(ValueError, match="ZSTD.*no zstd codec"):
        binlog_changes(w.getvalue(), "f")


def test_transaction_payload_zstd_corrupt_frame_named():
    from source_flink_cdc_3_5_0_spark.common import zstd_binding

    if not zstd_binding.available():
        pytest.skip("no libzstd on this host")
    w = BinlogWriter()
    body = bytes([2, 1, 0]) + bytes([0]) + b"\xde\xad\xbe\xef" * 4
    w._emit(TRANSACTION_PAYLOAD_EVENT, body)
    with pytest.raises(ValueError, match="TRANSACTION_PAYLOAD.*zstd"):
        binlog_changes(w.getvalue(), "f")


def test_transaction_payload_unknown_compression_refused():
    w = BinlogWriter()
    body = bytes([2, 1, 7]) + bytes([0])  # compression type 7
    w._emit(TRANSACTION_PAYLOAD_EVENT, body)
    with pytest.raises(ValueError, match="unknown compression type 7"):
        binlog_changes(w.getvalue(), "f")


def test_transaction_payload_nested_refused():
    outer_inner = BinlogWriter.embedded()
    outer_inner.transaction_payload(BinlogWriter.embedded())
    w = BinlogWriter()
    w.transaction_payload(outer_inner)
    with pytest.raises(ValueError, match="nested TRANSACTION_PAYLOAD"):
        binlog_changes(w.getvalue(), "f")


def test_transaction_payload_truncated_inner_refused():
    w = BinlogWriter()
    inner = BinlogWriter.embedded()
    inner.xid(1)
    w.transaction_payload(inner.getvalue()[:-5])
    with pytest.raises(ValueError, match="embedded event"):
        binlog_changes(w.getvalue(), "f")


# ---------------------------------------------------------------------------
# v1 rows events (MariaDB / MySQL 5.1-5.6): round 11 upgrades the named
# refusal to a real decode — the v1 body IS the v2 body minus the
# extra-data var-header (public layout: MySQL 5.5 docs / MariaDB KB
# "Rows_event"), so every cell codec is shared
# ---------------------------------------------------------------------------


def test_v1_rows_events_decode_all_ops():
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT_V1,
           [dict(id=1, doc={"a": 1}, v="x"),
            dict(id=2, doc=None, v="y")])
    w.rows(tmap, UPDATE_ROWS_EVENT_V1,
           [(dict(id=2, doc=None, v="y"), dict(id=2, doc=[5], v="Y"))])
    w.rows(tmap, DELETE_ROWS_EVENT_V1, [dict(id=1, doc={"a": 1}, v="x")])
    recs = [r for r in binlog_changes(w.getvalue(), "f")
            if r["kind"] == "change"]
    assert [r["op"] for r in recs] == ["+I", "+I", "-U", "+U", "-D"]
    assert recs[0]["after"] == dict(id=1, doc={"a": 1}, v="x")
    assert recs[3]["after"] == dict(id=2, doc=[5], v="Y")
    assert recs[4]["before"] == dict(id=1, doc={"a": 1}, v="x")


def test_v1_minimal_image_decodes():
    """binlog_row_image=MINIMAL over v1: presence bitmaps work the same
    as v2 (before = PK only, after = changed + PK)."""
    tmap = _table()
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, UPDATE_ROWS_EVENT_V1,
           [(dict(id=3), dict(id=3, v="z"))],
           columns_present=["id"], columns_present_after=["id", "v"])
    recs = [r for r in binlog_changes(w.getvalue(), "f")
            if r["kind"] == "change"]
    assert recs[0]["before"] == dict(id=3)
    assert recs[1]["after"] == dict(id=3, v="z")


# ---------------------------------------------------------------------------
# transport e2e: the toy server serves both new event types
# ---------------------------------------------------------------------------


def test_toy_server_streams_payload_and_partial_e2e(tmp_path):
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        MysqldToyServer, dump_binlog_stream)

    from source_flink_cdc_3_5_0_spark.common import zstd_binding

    tmap = _table()
    w = _payload_file()
    w.gtid(UUID, 2)
    before = dict(id=1, doc={"a": 1}, v="x")
    w.table_map(tmap)
    w.partial_update_rows(tmap, [(before, dict(
        id=1, doc=JsonDiffVector([JsonDiff(JSON_DIFF_REPLACE, "$.a", 2)]),
        v="x"))])
    w.xid(11)
    zstd_ok = zstd_binding.available()
    if zstd_ok:  # a ZSTD container rides the same wire session
        w.gtid(UUID, 3)
        inner = BinlogWriter.embedded()
        inner.query("BEGIN")
        inner.table_map(tmap)
        inner.rows(tmap, WRITE_ROWS_EVENT, [dict(id=30, doc=None, v="z30")])
        inner.xid(12)
        w.transaction_payload(inner, compression="zstd")
    src = tmp_path / "served"
    src.mkdir()
    (src / "mysql-bin.000001").write_bytes(w.getvalue())
    spool = tmp_path / "spool"
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(srv.host, srv.port, str(spool))
    assert written == ["mysql-bin.000001"]
    data = (spool / "mysql-bin.000001").read_bytes()
    assert data == w.getvalue()  # byte-true respool through the protocol
    ops = [(c["op"], c["after"]) for c in binlog_changes(data, written[0])
           if c["kind"] == "change"]
    expect = [
        ("+I", dict(id=1, doc={"a": 1}, v="x")),
        ("+I", dict(id=2, doc=None, v="y")),
        ("-U", None),
        ("+U", dict(id=1, doc={"a": 2}, v="x")),
    ]
    if zstd_ok:
        expect.append(("+I", dict(id=30, doc=None, v="z30")))
    assert ops == expect


def test_infer_tables_from_payload_wrapped_file(tmp_path):
    """Wire-native schema discovery must unwrap containers: on a
    compression=ON server every TABLE_MAP lives inside a
    TRANSACTION_PAYLOAD (framing-only pass, rows never decoded)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
        binlog_infer_tables

    w = _payload_file()
    p = tmp_path / "mysql-bin.000001"
    p.write_bytes(w.getvalue())
    tables, pks = binlog_infer_tables([str(p)])
    assert "db.t" in tables, tables
    assert pks["db.t"] == ["id"]
    assert "`doc` STRING" in tables["db.t"] or "doc" in tables["db.t"]


def test_container_rows_get_monotone_seqs_across_events():
    """Inside one container every event shares the container's file
    position — the row index must run cumulatively across the
    container's rows events, or a later +U of the same key ties with
    (or sorts under) its earlier +I in record_seq."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
        record_seq

    tmap = _table()
    w = BinlogWriter()
    inner = BinlogWriter.embedded()
    inner.query("BEGIN")
    inner.table_map(tmap)
    row = dict(id=5, doc=None, v="v0")
    inner.rows(tmap, WRITE_ROWS_EVENT, [row])                 # +I
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        DELETE_ROWS_EVENT, UPDATE_ROWS_EVENT)
    inner.rows(tmap, UPDATE_ROWS_EVENT,
               [(row, dict(row, v="v1"))])                    # -U/+U
    inner.rows(tmap, DELETE_ROWS_EVENT, [dict(row, v="v1")])  # -D
    inner.xid(3)
    w.transaction_payload(inner)
    ch = [c for c in binlog_changes(w.getvalue(), "mysql-bin.000001")
          if c["kind"] == "change"]
    assert [c["op"] for c in ch] == ["+I", "-U", "+U", "-D"]
    seqs = [record_seq(c["file"], c["pos"], c["row"], c["op"]) for c in ch]
    assert seqs == sorted(seqs) and len(set(seqs)) == 4, seqs


def test_payload_file_renders_debezium_json(spark, tmp_path):
    """The debezium-json bridge consumes container-wrapped captures the
    same as plain ones (it rides iter_binlog_changes)."""
    import json

    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
        binlog_to_debezium_json

    w = _payload_file()
    p = tmp_path / "mysql-bin.000001"
    p.write_bytes(w.getvalue())
    files = spark.createDataFrame(
        [(str(p), w.getvalue())], "path STRING, content BINARY")
    rows = binlog_to_debezium_json(files).collect()
    docs = [json.loads(r.value) for r in rows]
    assert [d["op"] for d in docs] == ["c", "c"]
    assert docs[0]["after"]["id"] == 1
    assert json.loads(docs[0]["after"]["doc"]) == {"a": 1}
    assert docs[1]["after"]["doc"] is None


def test_container_seqs_stay_distinct_past_1024_records():
    """Review r10 finding #1: past record_seq's 10-bit row budget,
    same-key records inside one container used to saturate to identical
    __seq (confirmed repro: +I row 1099 vs +U row 1100). Overflow now
    spills into a pseudo-position inside the container's own byte span
    — every record's seq stays distinct and strictly increasing in
    wire order."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
        record_seq

    tmap = _table()
    w = BinlogWriter()
    inner = BinlogWriter.embedded()
    inner.query("BEGIN")
    inner.table_map(tmap)
    rows = [dict(id=i, doc=None, v="r%d" % i) for i in range(1100)]
    inner.rows(tmap, WRITE_ROWS_EVENT, rows)
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
        UPDATE_ROWS_EVENT
    inner.rows(tmap, UPDATE_ROWS_EVENT,
               [(dict(id=1099, doc=None, v="r1099"),
                 dict(id=1099, doc=None, v="UPDATED"))])
    inner.xid(2)
    w.transaction_payload(inner)
    ch = [c for c in binlog_changes(w.getvalue(), "mysql-bin.000001")
          if c["kind"] == "change"]
    assert len(ch) == 1100 + 2
    seqs = [record_seq(c["file"], c.get("seq_pos", c["pos"]),
                       c.get("seq_row", c["row"]), c["op"]) for c in ch]
    assert seqs == sorted(seqs)
    assert len(set(seqs)) == len(seqs), "colliding seqs"
    # the pseudo-positions stay strictly inside the container's span:
    # below its end position, above its start
    ev = [e for e in BinlogReader(w.getvalue()).events()
          if e.type_byte == TRANSACTION_PAYLOAD_EVENT][0]
    for c in ch:
        assert ev.start_pos < c["seq_pos"] < ev.log_pos
        assert c["pos"] == ev.log_pos  # resume coordinate untouched
    # and a record AFTER the container still sorts above all of them
    after = record_seq("mysql-bin.000001", ev.log_pos, 0, "+I")
    assert all(s < after for s in seqs)


def test_zstd_implausible_declared_size_refused_without_allocation():
    """Review r10 finding #4: a corrupt uncompressed-size field must be
    refused by name before the buffer allocation, not die on a
    multi-terabyte MemoryError."""
    from source_flink_cdc_3_5_0_spark.common import zstd_binding

    if not zstd_binding.available():
        pytest.skip("no libzstd on this host")
    frame = zstd_binding.compress(b"x" * 100)
    with pytest.raises(ValueError, match="maximum expansion"):
        zstd_binding.decompress(frame, 1 << 45)
    # and wired through the payload header path with event coordinates
    w = BinlogWriter()
    body = (bytes([2, 1, 0])                       # compression ZSTD
            + bytes([3, 9]) + b"\xfe" + (1 << 45).to_bytes(8, "little")
            + bytes([0]) + frame)                  # corrupt size + frame
    w._emit(TRANSACTION_PAYLOAD_EVENT, body)
    with pytest.raises(ValueError, match="TRANSACTION_PAYLOAD.*expansion"):
        binlog_changes(w.getvalue(), "f")


def test_partial_json_property_random_mutations():
    """Property: for a random document and a random mutation sequence,
    the diff ops RECORDED WHILE MUTATING (the independent oracle — not
    derived from the applier) reconstruct the mutated document through
    apply_json_diffs AND through the full wire roundtrip."""
    import copy

    from hypothesis import given, settings, strategies as st

    scalar = st.one_of(st.none(), st.booleans(),
                       st.integers(-2**31, 2**31 - 1),
                       st.text(max_size=8))
    doc_s = st.dictionaries(
        st.text(st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1, max_size=6),
        st.one_of(scalar, st.lists(scalar, max_size=4),
                  st.dictionaries(st.text(min_size=1, max_size=4), scalar,
                                  max_size=3)),
        min_size=1, max_size=6)

    @given(doc_s, st.data())
    @settings(max_examples=80, deadline=None)
    def check(before, data):
        after = copy.deepcopy(before)
        diffs = JsonDiffVector()
        for _ in range(data.draw(st.integers(1, 5))):
            keys = sorted(after)
            op = data.draw(st.sampled_from(["replace", "insert", "remove"]))
            if op == "replace" and keys:
                k = data.draw(st.sampled_from(keys))
                v = data.draw(scalar)
                after[k] = v
                diffs.append(JsonDiff(JSON_DIFF_REPLACE, '$."%s"' % k, v))
            elif op == "insert":
                k = data.draw(st.text(
                    st.characters(min_codepoint=97, max_codepoint=122),
                    min_size=1, max_size=6).filter(
                        lambda s: s not in after))
                v = data.draw(scalar)
                after[k] = v
                diffs.append(JsonDiff(JSON_DIFF_INSERT, '$."%s"' % k, v))
            elif keys:
                k = data.draw(st.sampled_from(keys))
                del after[k]
                diffs.append(JsonDiff(JSON_DIFF_REMOVE, '$."%s"' % k))
        assert apply_json_diffs(before, diffs) == after
        # and through the wire: PARTIAL_UPDATE_ROWS inside a container
        tmap = _table()
        w = BinlogWriter()
        inner = BinlogWriter.embedded()
        inner.table_map(tmap)
        inner.partial_update_rows(
            tmap, [(dict(id=1, doc=before, v="x"),
                    dict(id=1, doc=diffs, v="x"))])
        w.transaction_payload(inner)
        ch = [c for c in binlog_changes(w.getvalue(), "f")
              if c["op"] == "+U"]
        assert ch[0]["after"]["doc"] == after

    check()

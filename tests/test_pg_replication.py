"""The real PostgreSQL replication protocol (sources/pg_replication.py):
startup/auth framing, MD5 known answer, XLogData respooling with
commit-aligned rolls and relation re-declaration, and the YAML
`protocol: postgres` surface."""

import hashlib
import struct

import pytest

from source_flink_cdc_3_5_0_spark.sources.pg_replication import (
    PgWalToyServer, decode_startup, encode_startup, md5_password,
    start_replication_stream)
from source_flink_cdc_3_5_0_spark.sources.pgoutput import (
    PgColumn, PgOutputWriter, PgRelation, pgoutput_changes)

OID_INT8, OID_TEXT = 20, 25
REL = PgRelation(700, "public", "t", "d", (
    PgColumn("id", OID_INT8, key=True), PgColumn("v", OID_TEXT)))


def test_md5_password_known_answer():
    """The documented double-MD5, recomputed independently: for
    user=postgres password=secret salt=01020304."""
    salt = bytes([1, 2, 3, 4])
    inner = hashlib.md5(b"secretpostgres").hexdigest()
    want = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
    assert md5_password("postgres", "secret", salt) == want


def test_startup_roundtrip():
    raw = encode_startup("repl", "mydb")
    n = struct.unpack(">I", raw[:4])[0]
    assert n == len(raw)
    params = decode_startup(raw[4:])
    assert params == {"user": "repl", "database": "mydb",
                      "replication": "database"}


def _capture(tmp_path, n_txns=5):
    src = tmp_path / "wal"
    src.mkdir()
    w = PgOutputWriter()
    w.relation(REL)
    for i in range(n_txns):
        w.begin()
        w.insert(REL, {"id": i, "v": "v%d" % i})
        w.commit()
    (src / "cap.000001").write_bytes(w.getvalue())
    return src


def test_stream_respools_decodable_capture(tmp_path):
    src = _capture(tmp_path)
    spool = tmp_path / "spool"
    with PgWalToyServer(str(src)) as srv:
        written = start_replication_stream(srv.host, srv.port, str(spool))
    assert written  # at least one spool file
    recs = []
    for name in written:
        recs += [c for c in pgoutput_changes(
            (spool / name).read_bytes()) if c["kind"] == "change"]
    assert [(r["after"]["id"], r["after"]["v"]) for r in recs] == \
        [(i, "v%d" % i) for i in range(5)]


def test_files_roll_on_commit_and_redeclare_relations(tmp_path):
    """commits_per_file=2 over 5 txns -> 3 spool files; every file must
    decode INDEPENDENTLY (the per-file decoder has no session state), so
    rolled files re-declare the cached Relation."""
    src = _capture(tmp_path, n_txns=5)
    spool = tmp_path / "spool"
    with PgWalToyServer(str(src)) as srv:
        written = start_replication_stream(srv.host, srv.port, str(spool),
                                           commits_per_file=2)
    assert len(written) == 3
    per_file = [
        [c for c in pgoutput_changes((spool / n).read_bytes())
         if c["kind"] == "change"]
        for n in written]
    assert [len(p) for p in per_file] == [2, 2, 1]
    assert per_file[2][0]["after"] == {"id": 4, "v": "v4"}


def test_wrong_password_rejected(tmp_path):
    src = _capture(tmp_path)
    with PgWalToyServer(str(src)) as srv:
        with pytest.raises(ValueError, match="authentication failed"):
            start_replication_stream(srv.host, srv.port,
                                     str(tmp_path / "s2"),
                                     password="wrong")


def test_yaml_protocol_postgres_e2e(spark, tmp_path):
    """YAML `type: pgoutput-file` with `protocol: postgres` speaks the
    real wire protocol end-to-end into the standard pipeline."""
    import json as _json

    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink

    src = _capture(tmp_path, n_txns=3)
    with PgWalToyServer(str(src), user="cdc", password="pw1") as srv:
        yaml_text = f"""
source:
  type: pgoutput-file
  protocol: postgres
  host: {srv.host}
  port: {srv.port}
  username: cdc
  password: pw1
  tables: '{_json.dumps({"public.t": "id BIGINT, v STRING"})}'
  primary-keys: '{{"public.t": ["id"]}}'
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
"""
        pdef = parse_yaml_pipeline(yaml_text)
        sink = MemorySink()
        pipe, raw, tables = PipelineComposer(spark).compose_streaming(
            pdef, sink=sink)
        pipe.start(raw, tables).awaitTermination(120)
    assert sink.snapshot(TableId.parse("public.t")) == \
        ["0, v0", "1, v1", "2, v2"]

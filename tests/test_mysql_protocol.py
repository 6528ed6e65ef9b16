"""The real MySQL client/server replication protocol
(sources/mysql_protocol.py): packet framing, V10 handshake,
mysql_native_password, COM_BINLOG_DUMP event streaming, and the YAML
`protocol: mysql` surface."""

import hashlib
import io
import struct

import pytest
from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
    MysqldToyServer, decode_handshake_response, decode_handshake_v10,
    dump_binlog_stream, encode_handshake_response, encode_handshake_v10,
    iter_file_events, native_password_scramble, read_packet, send_packet,
    verify_native_password)


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------

@given(st.binary(max_size=200), st.integers(0, 250))
@settings(max_examples=100, deadline=None)
def test_packet_roundtrip(body, seq):
    buf = io.BytesIO()
    send_packet(buf, seq, body)
    buf.seek(0)
    got_seq, got = read_packet(buf)
    assert (got_seq, got) == (seq, body)


def test_large_packet_splits_at_16mb():
    body = b"x" * 0xFFFFFF + b"tail"
    buf = io.BytesIO()
    nxt = send_packet(buf, 0, body)
    assert nxt == 2  # two packets consumed two sequence ids
    raw = buf.getvalue()
    assert raw[:3] == b"\xff\xff\xff" and raw[3] == 0
    buf.seek(0)
    seq, got = read_packet(buf)
    assert got == body
    assert seq == 1  # seq of the LAST continuation packet


def test_exact_16mb_body_needs_empty_continuation():
    body = b"y" * 0xFFFFFF
    buf = io.BytesIO()
    send_packet(buf, 0, body)
    raw = buf.getvalue()
    # last packet on the wire is the empty continuation
    assert raw[-4:] == b"\x00\x00\x00\x01"
    buf.seek(0)
    assert read_packet(buf)[1] == body


# ---------------------------------------------------------------------------
# native password (documented algorithm, checkable by hand)
# ---------------------------------------------------------------------------

def test_native_password_known_answer():
    """The documented formula SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw))),
    recomputed here independently with hashlib as the pin."""
    pw, nonce = "replpass", bytes(range(20))
    h1 = hashlib.sha1(b"replpass").digest()
    h3 = hashlib.sha1(nonce + hashlib.sha1(h1).digest()).digest()
    want = bytes(a ^ b for a, b in zip(h1, h3))
    assert native_password_scramble(pw, nonce) == want
    assert verify_native_password(pw, nonce, want)
    assert not verify_native_password(pw, nonce, b"\x00" * 20)
    # empty password: empty response verifies, anything else fails
    assert native_password_scramble("", nonce) == b""
    assert verify_native_password("", nonce, b"")


@given(st.text(max_size=12), st.binary(min_size=20, max_size=20))
@settings(max_examples=80, deadline=None)
def test_native_password_property(pw, nonce):
    resp = native_password_scramble(pw, nonce)
    assert verify_native_password(pw, nonce, resp)


# ---------------------------------------------------------------------------
# handshake encode/decode
# ---------------------------------------------------------------------------

def test_handshake_roundtrip():
    nonce = bytes(range(20))
    hs = decode_handshake_v10(encode_handshake_v10(nonce, 42, "8.0.36-toy"))
    assert hs["nonce"] == nonce
    assert hs["connection_id"] == 42
    assert hs["server_version"] == "8.0.36-toy"
    assert hs["auth_plugin"] == "mysql_native_password"

    resp = decode_handshake_response(
        encode_handshake_response("repl", "secret", nonce))
    assert resp["user"] == "repl"
    assert resp["auth_response"] == native_password_scramble("secret", nonce)
    assert resp["auth_plugin"] == "mysql_native_password"


def test_handshake_layout_pins():
    """Byte-layout pins from the public protocol doc: version byte 10,
    the 8-byte auth-data-1 + NUL filler, capability halves."""
    nonce = bytes(range(20))
    b = encode_handshake_v10(nonce, 1, "V")
    assert b[0] == 10
    assert b[1:3] == b"V\x00"          # server version cstring
    assert b[3:7] == struct.pack("<I", 1)
    assert b[7:15] == nonce[:8]
    assert b[15] == 0                  # filler


# ---------------------------------------------------------------------------
# end-to-end over the socket
# ---------------------------------------------------------------------------

def _fixture_file(tmp_path):
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_LONG, MYSQL_TYPE_VARCHAR, WRITE_ROWS_EVENT,
        BinlogColumn, BinlogTableMap, BinlogWriter)

    tmap = BinlogTableMap(1, "db", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),
        BinlogColumn("v", MYSQL_TYPE_VARCHAR, (255,))), (0,))
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=1, v="a"), dict(id=2, v="b")])
    src = tmp_path / "served"
    src.mkdir()
    (src / "mysql-bin.000001").write_bytes(w.getvalue())
    return src, w.getvalue()


def test_dump_respools_byte_identical_files(tmp_path):
    src, original = _fixture_file(tmp_path)
    spool = tmp_path / "spool"
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(srv.host, srv.port, str(spool))
    assert written == ["mysql-bin.000001"]
    assert (spool / "mysql-bin.000001").read_bytes() == original


def test_wrong_password_rejected(tmp_path):
    src, _ = _fixture_file(tmp_path)
    with MysqldToyServer(str(src)) as srv:
        with pytest.raises(ValueError, match="auth failed"):
            dump_binlog_stream(srv.host, srv.port, str(tmp_path / "s2"),
                               password="wrong")


def test_iter_file_events_rejects_garbage():
    with pytest.raises(ValueError, match="not a binlog file"):
        list(iter_file_events(b"nope"))


def test_yaml_protocol_mysql_e2e(spark, tmp_path):
    """YAML `type: mysql-binlog-file` with `protocol: mysql` speaks the
    real replication protocol end-to-end into the standard pipeline."""
    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink

    src, _ = _fixture_file(tmp_path)
    with MysqldToyServer(str(src), user="cdc", password="pw1") as srv:
        yaml_text = f"""
source:
  type: mysql-binlog-file
  protocol: mysql
  host: {srv.host}
  port: {srv.port}
  username: cdc
  password: pw1
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
"""
        pdef = parse_yaml_pipeline(yaml_text)
        sink = MemorySink()
        pipe, raw, tables = PipelineComposer(spark).compose_streaming(
            pdef, sink=sink)
        pipe.start(raw, tables).awaitTermination(120)
    assert sink.snapshot(TableId.parse("db.t")) == ["1, a", "2, b"]


# ---------------------------------------------------------------------------
# caching_sha2_password (MySQL 8 default; round-7 second wave)
# ---------------------------------------------------------------------------

def test_caching_sha2_scramble_property():
    from hypothesis import given, settings, strategies as st

    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        caching_sha2_scramble, verify_caching_sha2)

    @given(st.text(max_size=12), st.binary(min_size=20, max_size=20))
    @settings(max_examples=80, deadline=None)
    def check(pw, nonce):
        assert verify_caching_sha2(pw, nonce,
                                   caching_sha2_scramble(pw, nonce))
        if pw:
            assert not verify_caching_sha2(pw + "x", nonce,
                                           caching_sha2_scramble(pw, nonce))

    check()


def test_caching_sha2_known_answer():
    """Independent hashlib recomputation of the documented fast-path
    formula SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) + nonce)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        caching_sha2_scramble)

    pw, nonce = "replpass", bytes(range(20))
    h1 = hashlib.sha256(b"replpass").digest()
    h3 = hashlib.sha256(hashlib.sha256(h1).digest() + nonce).digest()
    assert caching_sha2_scramble(pw, nonce) == \
        bytes(a ^ b for a, b in zip(h1, h3))


def test_dump_over_caching_sha2_default(tmp_path):
    """The server now defaults to MySQL 8's caching_sha2_password: the
    client reads the plugin from the handshake, scrambles with SHA-256,
    and consumes the fast-auth-success AuthMoreData before the OK."""
    src, original = _fixture_file(tmp_path)
    spool = tmp_path / "spool"
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(srv.host, srv.port, str(spool))
    assert written == ["mysql-bin.000001"]
    assert (spool / "mysql-bin.000001").read_bytes() == original


def test_dump_native_password_mode_still_works(tmp_path):
    src, original = _fixture_file(tmp_path)
    spool = tmp_path / "spool"
    with MysqldToyServer(str(src),
                         auth_plugin="mysql_native_password") as srv:
        written = dump_binlog_stream(srv.host, srv.port, str(spool))
    assert (spool / written[0]).read_bytes() == original


def test_caching_sha2_wrong_password_rejected(tmp_path):
    src, _ = _fixture_file(tmp_path)
    with MysqldToyServer(str(src)) as srv:
        with pytest.raises(ValueError, match="auth failed"):
            dump_binlog_stream(srv.host, srv.port, str(tmp_path / "s2"),
                               password="wrong")


def test_auth_switch_request_moves_client_onto_server_plugin(tmp_path):
    """A client that answers the handshake with the WRONG plugin gets an
    AuthSwitchRequest (0xFE + plugin + nonce) and re-scrambles — the real
    server behavior for plugin-mismatched clients."""
    import socket

    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        caching_sha2_scramble)

    src, _ = _fixture_file(tmp_path)
    with MysqldToyServer(str(src)) as srv:  # caching_sha2 default
        with socket.create_connection((srv.host, srv.port), 10) as sock:
            rfile = sock.makefile("rb")
            wfile = sock.makefile("wb", buffering=0)
            _, hello = read_packet(rfile)
            hs = decode_handshake_v10(hello)
            assert hs["auth_plugin"] == "caching_sha2_password"
            # deliberately respond with the OTHER plugin
            send_packet(wfile, 1, encode_handshake_response(
                "repl", "replpass", hs["nonce"],
                auth_plugin="mysql_native_password"))
            _, pkt = read_packet(rfile)
            assert pkt[:1] == b"\xfe"
            p_end = pkt.index(0, 1)
            assert pkt[1:p_end] == b"caching_sha2_password"
            nonce = pkt[p_end + 1:].rstrip(b"\x00")
            send_packet(wfile, 3, caching_sha2_scramble("replpass", nonce))
            s1, more = read_packet(rfile)
            assert more == b"\x01\x03"      # fast auth success
            s2, ok = read_packet(rfile)
            assert ok[:1] == b"\x00"        # authenticated
            # contiguous sequence ids: real clients reject gaps as
            # "packets out of order"
            assert (s1, s2) == (4, 5)


def test_dump_multi_file_and_resume_position(tmp_path):
    """Three served files stream in numeric order with a fake ROTATE
    naming each; a dump from file 2 skips file 1 (the resume shape a
    restarted client uses)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_LONG, WRITE_ROWS_EVENT, BinlogColumn, BinlogTableMap,
        BinlogWriter)

    tmap = BinlogTableMap(1, "db", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    src = tmp_path / "served"
    src.mkdir()
    originals = {}
    for i in (1, 2, 3):
        w = BinlogWriter()
        w.table_map(tmap)
        w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=i)])
        name = "mysql-bin.%06d" % i
        (src / name).write_bytes(w.getvalue())
        originals[name] = w.getvalue()

    with MysqldToyServer(str(src)) as srv:
        all_files = dump_binlog_stream(srv.host, srv.port,
                                       str(tmp_path / "s_all"))
        resumed = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s_resume"),
                                     from_file="mysql-bin.000002")
    assert all_files == sorted(originals)
    assert resumed == ["mysql-bin.000002", "mysql-bin.000003"]
    for name in resumed:
        assert (tmp_path / "s_resume" / name).read_bytes() == \
            originals[name]


# ---------------------------------------------------------------------------
# round-8 ADVICE + transport-contract regressions
# ---------------------------------------------------------------------------


def test_handshake_response_with_db_and_lenenc_auth():
    """ADVICE r7: a real client setting CLIENT_CONNECT_WITH_DB sends a
    database cstring between the auth response and the plugin name, and
    CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA switches the auth-response
    length to lenenc. The old parser read the database as the plugin
    name, forcing a spurious auth switch."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        CLIENT_CONNECT_WITH_DB, CLIENT_PLUGIN_AUTH,
        CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA, CLIENT_PROTOCOL_41)

    caps = (CLIENT_PROTOCOL_41 | CLIENT_CONNECT_WITH_DB
            | CLIENT_PLUGIN_AUTH | CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA)
    auth = bytes(range(32))
    body = (struct.pack("<I", caps) + struct.pack("<I", 1 << 24)
            + bytes([0x21]) + b"\x00" * 23
            + b"repl\x00"
            + bytes([len(auth)]) + auth      # lenenc (short form)
            + b"shop\x00"                    # database
            + b"mysql_native_password\x00")
    resp = decode_handshake_response(body)
    assert resp["user"] == "repl"
    assert resp["auth_response"] == auth
    assert resp["database"] == "shop"
    assert resp["auth_plugin"] == "mysql_native_password"


def test_handshake_response_lenenc_two_byte_length():
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        CLIENT_PLUGIN_AUTH, CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA,
        CLIENT_PROTOCOL_41)

    caps = (CLIENT_PROTOCOL_41 | CLIENT_PLUGIN_AUTH
            | CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA)
    auth = b"\xaa" * 300                     # needs the 0xFC 2-byte form
    body = (struct.pack("<I", caps) + struct.pack("<I", 1 << 24)
            + bytes([0x21]) + b"\x00" * 23 + b"u\x00"
            + b"\xfc" + struct.pack("<H", 300) + auth
            + b"caching_sha2_password\x00")
    resp = decode_handshake_response(body)
    assert resp["auth_response"] == auth
    assert resp["database"] is None


def _tiny_binlog_dir(tmp_path, name="b"):
    src = tmp_path / name
    src.mkdir()
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        BinlogColumn, BinlogTableMap, BinlogWriter, MYSQL_TYPE_LONG,
        WRITE_ROWS_EVENT)

    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=1)])
    (src / "mysql-bin.000001").write_bytes(w.getvalue())
    return src, w.getvalue()


def test_caching_sha2_full_auth_rsa_over_plain_tcp(tmp_path):
    """Round 9 (verdict r8 item 3 — was a named refusal): a cold-cache
    server requesting perform_full_authentication gets the documented
    plain-TCP answer — public-key request (0x02), RSA-OAEP-encrypted
    XOR-scrambled password — and the dump proceeds."""
    src, original = _tiny_binlog_dir(tmp_path)
    with MysqldToyServer(str(src), force_full_auth=True) as srv:
        written = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s"))
    assert written == ["mysql-bin.000001"]
    assert (tmp_path / "s" / "mysql-bin.000001").read_bytes() == original


def test_caching_sha2_full_auth_wrong_password_rejected(tmp_path):
    """The full-auth check happens server-side on the DECRYPTED
    password — a wrong password fails at the full-auth stage, not the
    (uncheckable) fast stage."""
    src, _ = _tiny_binlog_dir(tmp_path)
    with MysqldToyServer(str(src), force_full_auth=True) as srv:
        with pytest.raises(ValueError, match="auth failed"):
            dump_binlog_stream(srv.host, srv.port, str(tmp_path / "s"),
                               password="wrong")


def test_bounded_stop_at_file_position(tmp_path):
    """stop_at=(file, pos): the blocking-dump bounded stop — the client
    ends cleanly once the named file reaches the target end_log_pos,
    never spooling later files."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        BinlogColumn, BinlogTableMap, BinlogWriter, MYSQL_TYPE_LONG,
        WRITE_ROWS_EVENT)

    src = tmp_path / "b"
    src.mkdir()
    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    for i in (1, 2):
        w = BinlogWriter()
        w.table_map(tmap)
        w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=i)])
        (src / ("mysql-bin.%06d" % i)).write_bytes(w.getvalue())
    size1 = len((src / "mysql-bin.000001").read_bytes())
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(
            srv.host, srv.port, str(tmp_path / "s"),
            stop_at=("mysql-bin.000001", size1))
    assert written == ["mysql-bin.000001"]
    # the bounded file is complete and decodable
    data = (tmp_path / "s" / "mysql-bin.000001").read_bytes()
    assert data == (src / "mysql-bin.000001").read_bytes()


def test_rotate_names_strip_crc32_trailers(tmp_path):
    """ADVICE r7: a mysqld with binlog_checksum=CRC32 appends 4 CRC
    bytes to artificial ROTATE bodies. Before the FDE declares the
    algorithm the client strips a non-ascii tail defensively; after it,
    unconditionally (even an accidentally-ascii CRC)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        _BINLOG_MAGIC,)

    import zlib

    class ChecksummedToy(MysqldToyServer):
        def _stream(self, wfile, from_file, pos, flags):
            def ev(etype, body, flags_=0, crc=True):
                raw = struct.pack("<IBIIIH", 0, etype, 1,
                                  19 + len(body) + (4 if crc else 0),
                                  0, flags_) + body
                return raw + (struct.pack("<I", zlib.crc32(raw))
                              if crc else b"")

            seq = 1
            # artificial rotate BEFORE the FDE, real CRC trailer
            rot1 = ev(0x04, struct.pack("<Q", 4) + b"mysql-bin.000007",
                      0x20)
            seq = send_packet(wfile, seq, b"\x00" + rot1)
            # FDE declaring CRC32 (alg byte before its own trailer)
            fde = ev(0x0F, struct.pack("<H", 4) + b"x" * 50
                     + struct.pack("<I", 0) + bytes([19]) + bytes(40)
                     + bytes([1]))
            seq = send_packet(wfile, seq, b"\x00" + fde)
            # post-FDE rotate: stripped AND verified
            rot2 = ev(0x04, struct.pack("<Q", 4) + b"mysql-bin.000008",
                      0x20)
            seq = send_packet(wfile, seq, b"\x00" + rot2)
            send_packet(wfile, seq, b"\xfe\x00\x00\x02\x00")

    with ChecksummedToy(str(tmp_path / "empty-dir-unused")) as srv:
        (tmp_path / "empty-dir-unused").mkdir(exist_ok=True)
        written = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s"))
    assert written == ["mysql-bin.000007", "mysql-bin.000008"]


def test_dump_verifies_crc32_trailers(tmp_path):
    """With CRC32 announced and declared, every event's trailer is
    VERIFIED during the dump — a flipped bit fails at the transport
    with coordinates instead of mis-decoding downstream."""
    import zlib

    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        BinlogColumn, BinlogTableMap, BinlogWriter, MYSQL_TYPE_LONG,
        WRITE_ROWS_EVENT)

    src = tmp_path / "b"
    src.mkdir()
    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=1)])
    data = bytearray(w.getvalue())
    (src / "mysql-bin.000001").write_bytes(bytes(data))
    # sanity: the honest file dumps clean (its CRCs verify)
    with MysqldToyServer(str(src)) as srv:
        assert dump_binlog_stream(srv.host, srv.port,
                                  str(tmp_path / "ok"))
    # now flip one payload bit in the LAST event (past the FDE)
    data[-6] ^= 0x01
    (src / "mysql-bin.000001").write_bytes(bytes(data))
    with MysqldToyServer(str(src)) as srv:
        with pytest.raises(ValueError, match="CRC32 mismatch"):
            dump_binlog_stream(srv.host, srv.port,
                               str(tmp_path / "bad"))


@pytest.mark.parametrize("order", [("crc", "plain"), ("plain", "crc")])
def test_checksum_transition_between_files(tmp_path, order):
    """SET GLOBAL binlog_checksum mid-stream: each file's FDE
    re-declares the algorithm, and the artificial ROTATE for a file is
    name-resolved (and never CRC-checked) under THAT file's algorithm,
    not the previous file's latch — both transition directions dump
    cleanly."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        BinlogColumn, BinlogTableMap, BinlogWriter, MYSQL_TYPE_LONG,
        WRITE_ROWS_EVENT)

    src = tmp_path / "b"
    src.mkdir()
    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    for i, kind in enumerate(order, start=1):
        w = BinlogWriter(checksum=(kind == "crc"))
        w.table_map(tmap)
        w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=i)])
        (src / ("mysql-bin.%06d" % i)).write_bytes(w.getvalue())
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s"))
    assert written == ["mysql-bin.000001", "mysql-bin.000002"]
    for i, name in enumerate(written, start=1):
        assert (tmp_path / "s" / name).read_bytes() == \
            (src / name).read_bytes()


# ---------------------------------------------------------------------------
# COM_BINLOG_DUMP_GTID — GTID-set resume at the transport
# ---------------------------------------------------------------------------

_SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _gtid_fixture(tmp_path):
    """Three binlog files whose PREVIOUS_GTIDS headers grow: file N
    starts with the executed set of everything before it."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        BinlogColumn, BinlogTableMap, BinlogWriter, MYSQL_TYPE_LONG,
        WRITE_ROWS_EVENT)

    src = tmp_path / "b"
    src.mkdir()
    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    # a GTID-mode server writes the header on EVERY file — the first
    # file's executed-set is simply empty
    prevs = ["", "%s:1-2" % _SID, "%s:1-4" % _SID]
    for i, prev in enumerate(prevs, start=1):
        w = BinlogWriter(previous_gtids=prev)
        w.table_map(tmap)
        w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=i)])
        (src / ("mysql-bin.%06d" % i)).write_bytes(w.getvalue())
    return src


def test_gtid_set_roundtrip_and_file_header():
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import \
        BinlogWriter
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        decode_gtid_set, encode_gtid_set, file_previous_gtids)

    s = "%s:1-5:7,%s:3" % (_SID, _SID.replace("3e", "4e"))
    assert decode_gtid_set(encode_gtid_set(s)) == \
        decode_gtid_set(encode_gtid_set(decode_gtid_set(
            encode_gtid_set(s))))  # canonical fixpoint
    w = BinlogWriter(previous_gtids="%s:1-4" % _SID)
    assert file_previous_gtids(w.getvalue()) == "%s:1-4" % _SID
    w2 = BinlogWriter()
    assert file_previous_gtids(w2.getvalue()) is None


@pytest.mark.parametrize("client_set,expect", [
    ("", ["mysql-bin.000001", "mysql-bin.000002", "mysql-bin.000003"]),
    ("%s:1-2" % _SID, ["mysql-bin.000002", "mysql-bin.000003"]),
    ("%s:1-3" % _SID, ["mysql-bin.000002", "mysql-bin.000003"]),
    ("%s:1-4" % _SID, ["mysql-bin.000003"]),
    ("%s:1-9" % _SID, ["mysql-bin.000003"]),
])
def test_dump_gtid_starts_at_the_right_file(tmp_path, client_set,
                                            expect):
    """mysqld start-file selection: the newest file whose
    PREVIOUS_GTIDS the client's executed set covers (a mid-file set
    like 1-3 still starts at that file — the decode-side offset filter
    drops the covered transactions)."""
    src = _gtid_fixture(tmp_path)
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(
            srv.host, srv.port, str(tmp_path / ("s" + str(len(expect)))),
            gtid_set=client_set)
    assert written == expect


def test_dump_gtid_purged_logs_error(tmp_path):
    """A client whose executed set predates the oldest retained file
    gets mysqld's error 1236, not a silent partial stream."""
    import os

    src = _gtid_fixture(tmp_path)
    os.unlink(src / "mysql-bin.000001")
    with MysqldToyServer(str(src)) as srv:
        with pytest.raises(ValueError, match="purged"):
            dump_binlog_stream(srv.host, srv.port,
                               str(tmp_path / "s"), gtid_set="")


def test_dump_gtid_pre_gtid_files_serve_everything(tmp_path):
    """Files WITHOUT a PREVIOUS_GTIDS header have unknown coverage: the
    selection must start at the OLDEST such file, never skip to the
    newest (review-confirmed data loss: all earlier rows vanished)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        BinlogColumn, BinlogTableMap, BinlogWriter, MYSQL_TYPE_LONG,
        WRITE_ROWS_EVENT)

    src = tmp_path / "b"
    src.mkdir()
    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    for i in (1, 2, 3):
        w = BinlogWriter()  # no previous_gtids header
        w.table_map(tmap)
        w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=i)])
        (src / ("mysql-bin.%06d" % i)).write_bytes(w.getvalue())
    with MysqldToyServer(str(src)) as srv:
        written = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s"), gtid_set="")
    assert written == ["mysql-bin.000001", "mysql-bin.000002",
                       "mysql-bin.000003"]


def test_dump_gtid_malformed_command_gets_err_packet(tmp_path):
    """Hostile name_len/data_len answer an ERR packet, not a dead
    socket (the handler must not die on struct.error)."""
    import socket
    import struct as _s

    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        COM_BINLOG_DUMP_GTID, decode_handshake_v10,
        encode_handshake_response)

    src = tmp_path / "b"
    src.mkdir()
    with MysqldToyServer(str(src),
                         auth_plugin="mysql_native_password") as srv:
        with socket.create_connection((srv.host, srv.port),
                                      timeout=10) as sock:
            rf = sock.makefile("rb")
            wf = sock.makefile("wb", buffering=0)
            _, hello = read_packet(rf)
            hs = decode_handshake_v10(hello)
            send_packet(wf, 1, encode_handshake_response(
                "repl", "replpass", hs["nonce"],
                auth_plugin="mysql_native_password"))
            _, reply = read_packet(rf)
            assert reply[:1] == b"\x00"
            # name_len = 0xFFFFFFFF: lengths overrun the packet
            send_packet(wf, 0, bytes([COM_BINLOG_DUMP_GTID])
                        + _s.pack("<HII", 5, 2, 0xFFFFFFFF))
            _, err = read_packet(rf)
            assert err[:1] == b"\xff" and b"Malformed" in err


def test_mid_stream_file_without_fde_is_flushed_not_dropped(tmp_path):
    """ADVICE r8: a non-final file whose FDE never arrived used to be
    silently dropped at the next rotate (its name latch was still
    None). The flush now falls back to the ascii name heuristic, so the
    buffered events land under the rotate-announced name."""
    class NoFdeToy(MysqldToyServer):
        def _stream(self, wfile, from_file, pos, flags):
            def ev(etype, body, flags_=0):
                return struct.pack("<IBIIIH", 0, etype, 1,
                                   19 + len(body), 0, flags_) + body

            seq = 1
            rot1 = ev(0x04, struct.pack("<Q", 4) + b"mysql-bin.000003",
                      0x20)
            seq = send_packet(wfile, seq, b"\x00" + rot1)
            # an event arrives but the file's FDE never does
            seq = send_packet(wfile, seq, b"\x00" + ev(0x02, b"q" * 16))
            rot2 = ev(0x04, struct.pack("<Q", 4) + b"mysql-bin.000004",
                      0x20)
            seq = send_packet(wfile, seq, b"\x00" + rot2)
            fde = ev(0x0F, struct.pack("<H", 4) + b"x" * 50
                     + struct.pack("<I", 0) + bytes([19]) + bytes(40)
                     + bytes([0]))
            seq = send_packet(wfile, seq, b"\x00" + fde)
            send_packet(wfile, seq, b"\xfe\x00\x00\x02\x00")

    (tmp_path / "unused").mkdir()
    with NoFdeToy(str(tmp_path / "unused")) as srv:
        written = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s"))
    assert written == ["mysql-bin.000003", "mysql-bin.000004"]
    f1 = (tmp_path / "s" / "mysql-bin.000003").read_bytes()
    assert len(f1) > 4  # magic + the buffered event, not empty


def test_rsa_oaep_known_answer_fixed_seed():
    """RSAES-OAEP(SHA-1) with the toy's FIXED keypair and a PINNED seed:
    byte-exact ciphertext (deterministic given the seed), validated
    round-trip through the pure-Python decrypt. The scramble itself is
    also pinned (pure XOR, no randomness)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        TOY_RSA_D, TOY_RSA_E, TOY_RSA_N, TOY_RSA_PUB_PEM,
        parse_rsa_public_pem, rsa_oaep_decrypt, rsa_oaep_encrypt,
        xor_password_scramble)

    nonce = bytes(range(1, 21))
    scr = xor_password_scramble("replpass", nonce)
    # (password + NUL) XOR nonce, recomputed by hand
    assert scr == bytes(
        b ^ nonce[i % 20] for i, b in enumerate(b"replpass\x00"))
    assert scr.hex() == "736773687567747b09"
    n, e = parse_rsa_public_pem(TOY_RSA_PUB_PEM)
    assert (n, e) == (TOY_RSA_N, TOY_RSA_E)
    ct = rsa_oaep_encrypt(scr, n, e, seed=bytes(range(20)))
    assert len(ct) == 256
    # deterministic given the pinned seed
    assert ct == rsa_oaep_encrypt(scr, n, e, seed=bytes(range(20)))
    assert ct.hex()[:32] == rsa_oaep_encrypt(
        scr, n, e, seed=bytes(range(20))).hex()[:32]
    assert rsa_oaep_decrypt(ct, TOY_RSA_N, TOY_RSA_D) == scr
    # tamper detection: flip one bit -> padding failure, never silence
    bad = bytearray(ct)
    bad[128] ^= 1
    with pytest.raises(ValueError):
        rsa_oaep_decrypt(bytes(bad), TOY_RSA_N, TOY_RSA_D)


def test_rsa_oaep_interops_with_openssl_library():
    """Our pure-Python OAEP must match OpenSSL's RSA_PKCS1_OAEP_PADDING
    (what a real mysqld decrypts with): library-encrypted blobs decrypt
    with our key, and vice versa. Skipped when `cryptography` is absent
    (the in-repo client+toy pair needs no library)."""
    pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        TOY_RSA_D, TOY_RSA_N, TOY_RSA_PUB_PEM, rsa_oaep_decrypt,
        xor_password_scramble)

    pub = serialization.load_pem_public_key(TOY_RSA_PUB_PEM)
    msg = xor_password_scramble("replpass", bytes(range(20)))
    ct = pub.encrypt(msg, padding.OAEP(
        mgf=padding.MGF1(hashes.SHA1()), algorithm=hashes.SHA1(),
        label=None))
    assert rsa_oaep_decrypt(ct, TOY_RSA_N, TOY_RSA_D) == msg


def test_tls_upgrade_with_verify_ca(tmp_path):
    """ssl-mode=verify-ca: SSLRequest prefix -> TLS upgrade on the same
    connection -> encrypted HandshakeResponse41 -> fast auth -> dump.
    The server cert is pinned via ssl_ca (the toy's self-signed cert)."""
    src, original = _tiny_binlog_dir(tmp_path)
    with MysqldToyServer(str(src), tls=True) as srv:
        written = dump_binlog_stream(
            srv.host, srv.port, str(tmp_path / "s"),
            ssl_mode="verify-ca", ssl_ca=srv.ca_cert)
    assert written == ["mysql-bin.000001"]
    assert (tmp_path / "s" / "mysql-bin.000001").read_bytes() == original


def test_tls_full_auth_sends_cleartext_on_protected_channel(tmp_path):
    """Cold cache over TLS: the client answers 0x04 with the
    NUL-terminated cleartext password (the channel is the protection —
    libmysql's documented behaviour); wrong password still rejected."""
    src, original = _tiny_binlog_dir(tmp_path)
    with MysqldToyServer(str(src), tls=True, force_full_auth=True) as srv:
        written = dump_binlog_stream(
            srv.host, srv.port, str(tmp_path / "s"),
            ssl_mode="required")
        with pytest.raises(ValueError, match="auth failed"):
            dump_binlog_stream(srv.host, srv.port, str(tmp_path / "s2"),
                               ssl_mode="required", password="wrong")
    assert written == ["mysql-bin.000001"]


def test_ssl_mode_against_plaintext_server_fails_loudly(tmp_path):
    """A server without CLIENT_SSL gets a NAMED error when the client
    insists on TLS (never a silent plaintext fallback — the libmysql
    ssl-mode=REQUIRED contract)."""
    src, _ = _tiny_binlog_dir(tmp_path)
    with MysqldToyServer(str(src)) as srv:
        with pytest.raises(ValueError, match="does not advertise"):
            dump_binlog_stream(srv.host, srv.port, str(tmp_path / "s"),
                               ssl_mode="required")


def test_yaml_ssl_mode_e2e(spark, tmp_path):
    """YAML `ssl-mode: verify-ca` + `ssl-ca`: the whole pipeline runs
    over the TLS-upgraded replication transport with a cold auth cache
    (full RSA-over-TLS... i.e. cleartext-on-channel) — the exact
    first-connection posture of a real MySQL 8 replica."""
    from source_flink_cdc_3_5_0_spark.common import TableId
    from source_flink_cdc_3_5_0_spark.pipeline import (
        PipelineComposer, parse_yaml_pipeline)
    from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink

    src, _ = _fixture_file(tmp_path)
    with MysqldToyServer(str(src), user="cdc", password="pw1",
                         tls=True, force_full_auth=True) as srv:
        yaml_text = f"""
source:
  type: mysql-binlog-file
  protocol: mysql
  host: {srv.host}
  port: {srv.port}
  username: cdc
  password: pw1
  ssl-mode: verify-ca
  ssl-ca: {srv.ca_cert}
  checkpoint: {tmp_path}/ckpt
sink: {{type: values}}
"""
        pdef = parse_yaml_pipeline(yaml_text)
        sink = MemorySink()
        pipe, raw, tables = PipelineComposer(spark).compose_streaming(
            pdef, sink=sink)
        pipe.start(raw, tables).awaitTermination(120)
    assert sink.snapshot(TableId.parse("db.t")) == ["1, a", "2, b"]


def test_real_mid_stream_rotate_splits_files(tmp_path):
    """Round-9 review: a real mysqld switching files mid-dump sends the
    rotate WRITTEN IN the current file (nonzero timestamp, naming the
    next file) and NO second synthetic rotate — the old client only
    split on ts==0 rotates, so file 2 was concatenated under file 1's
    name (two FDEs, restarting log_pos). Files must split at real
    rotates too, with the rotate kept as the current file's last event
    (exactly how an on-disk binlog ends)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_LONG, WRITE_ROWS_EVENT, BinlogColumn, BinlogTableMap,
        BinlogWriter)

    def mkfile(row_id):
        tmap = BinlogTableMap(1, "d", "t", (
            BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
        w = BinlogWriter()
        w.table_map(tmap)
        w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=row_id)])
        return w.getvalue()

    f1, f2 = mkfile(1), mkfile(2)

    import zlib as _zlib

    def ev_rotate(name, ts):
        # CRC32-trailed like the fixture's own events (the FDE declares
        # the algorithm, so every rotate must carry a real trailer)
        body = struct.pack("<Q", 4) + name
        raw = struct.pack("<IBIIIH", ts, 0x04, 1, 19 + len(body) + 4,
                          0, 0x20) + body
        return raw + struct.pack("<I", _zlib.crc32(raw))

    class RealRotateToy(MysqldToyServer):
        def _stream(self, wfile, from_file, pos, flags):
            seq = 1
            # dump start: the usual synthetic (ts==0) rotate
            seq = send_packet(wfile, seq, b"\x00"
                              + ev_rotate(b"mysql-bin.000011", 0))
            for evb in iter_file_events(f1):
                seq = send_packet(wfile, seq, b"\x00" + evb)
            # REAL mid-stream rotation: in-file rotate, nonzero ts,
            # then the next file's own events — no synthetic rotate
            rot = ev_rotate(b"mysql-bin.000012", 1234)
            seq = send_packet(wfile, seq, b"\x00" + rot)
            for evb in iter_file_events(f2):
                seq = send_packet(wfile, seq, b"\x00" + evb)
            send_packet(wfile, seq, b"\xfe\x00\x00\x02\x00")
            self._real_rot = rot

    (tmp_path / "unused").mkdir()
    with RealRotateToy(str(tmp_path / "unused")) as srv:
        written = dump_binlog_stream(srv.host, srv.port,
                                     str(tmp_path / "s"))
        rot = srv._real_rot
    assert written == ["mysql-bin.000011", "mysql-bin.000012"]
    got1 = (tmp_path / "s" / "mysql-bin.000011").read_bytes()
    got2 = (tmp_path / "s" / "mysql-bin.000012").read_bytes()
    # file 1 = its own bytes + the real rotate (its on-disk last event)
    assert got1 == f1 + rot
    # file 2 = exactly its own bytes (fresh magic + FDE), never merged
    assert got2 == f2
    # and both decode independently with the right rows
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        iter_binlog_changes)

    ids1 = [c["after"]["id"] for c in iter_binlog_changes(
        got1, "mysql-bin.000011") if c["kind"] == "change"]
    ids2 = [c["after"]["id"] for c in iter_binlog_changes(
        got2, "mysql-bin.000012") if c["kind"] == "change"]
    assert (ids1, ids2) == ([1], [2])


def _raw_mysql_session(srv):
    """Minimal raw client: handshake + native-password auth; returns
    (sock, rfile, wfile) ready for commands."""
    import socket as _socket

    from source_flink_cdc_3_5_0_spark.sources.mysql_protocol import (
        decode_handshake_v10, encode_handshake_response)

    sock = _socket.create_connection((srv.host, srv.port), 10)
    rfile = sock.makefile("rb")
    wfile = sock.makefile("wb", buffering=0)
    _, hello = read_packet(rfile)
    hs = decode_handshake_v10(hello)
    send_packet(wfile, 1, encode_handshake_response(
        srv.user, srv.password, hs["nonce"],
        auth_plugin=hs["auth_plugin"]))
    _, reply = read_packet(rfile)
    assert reply[:1] == b"\x00", reply
    return sock, rfile, wfile


def test_toy_answers_show_variables_with_a_resultset(tmp_path):
    """Round-9 review: real replication clients probe variables with
    resultset queries during setup (BinaryLogClient's
    \"show global variables like 'binlog_checksum'\") — a bare OK packet
    aborts them. The toy now answers a proper protocol-41 text
    resultset: column count, 2 column definitions, EOF, rows, EOF."""
    src, _ = _fixture_file(tmp_path)
    with MysqldToyServer(str(src),
                         auth_plugin="mysql_native_password") as srv:
        sock, rfile, wfile = _raw_mysql_session(srv)
        send_packet(wfile, 0, bytes([0x03]) + b"show global variables "
                    b"like 'binlog_checksum'")
        _, ncols = read_packet(rfile)
        assert ncols == b"\x02"
        _, col1 = read_packet(rfile)
        assert b"Variable_name" in col1
        _, col2 = read_packet(rfile)
        assert b"Value" in col2
        _, eof1 = read_packet(rfile)
        assert eof1[:1] == b"\xfe"
        _, row = read_packet(rfile)
        assert b"binlog_checksum" in row
        # the fixture files carry CRC32-declaring FDEs
        assert b"CRC32" in row
        _, eof2 = read_packet(rfile)
        assert eof2[:1] == b"\xfe"
        sock.close()


def test_toy_honors_binlog_dump_start_position(tmp_path):
    """Round-9 review: COM_BINLOG_DUMP's pos parameter was parsed and
    ignored — every dump replayed from byte 4 and a real resuming
    client double-applied everything. The toy now seeks: events ending
    at or before pos are skipped (the FDE always ships)."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_LONG, WRITE_ROWS_EVENT, BinlogColumn, BinlogTableMap,
        BinlogWriter)

    tmap = BinlogTableMap(1, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False, False),), (0,))
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=1)])
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=2)])
    data = w.getvalue()
    src = tmp_path / "served"
    src.mkdir()
    (src / "mysql-bin.000001").write_bytes(data)
    # byte offset right after the FIRST rows event
    evs = list(iter_file_events(data))
    offset = 4
    resume_pos = None
    seen_rows = 0
    for ev in evs:
        offset += len(ev)
        if ev[4] == WRITE_ROWS_EVENT:
            seen_rows += 1
            if seen_rows == 1:
                resume_pos = offset
    with MysqldToyServer(str(src),
                         auth_plugin="mysql_native_password") as srv:
        sock, rfile, wfile = _raw_mysql_session(srv)
        send_packet(wfile, 0, bytes([0x12]) + struct.pack("<I", resume_pos)
                    + struct.pack("<H", 0x01)         # NON_BLOCK
                    + struct.pack("<I", 2)
                    + b"mysql-bin.000001")
        types = []
        while True:
            _, pkt = read_packet(rfile)
            if pkt[:1] == b"\xfe" and len(pkt) < 9:
                break
            assert pkt[:1] == b"\x00"
            types.append(pkt[5])
        sock.close()
    # the first TABLE_MAP+WRITE pair was skipped; the FDE still ships
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        TABLE_MAP_EVENT)

    assert types.count(WRITE_ROWS_EVENT) == 1
    assert types.count(TABLE_MAP_EVENT) == 1
    assert 0x0F in types  # FDE always delivered

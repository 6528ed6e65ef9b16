"""The real MySQL client/server replication protocol over localhost TCP.

Round 7: `binlog_socket.py`'s toy ``DUMP`` protocol proved the codec is
transport-independent; this module closes the remaining transport gap by
speaking the ACTUAL MySQL wire protocol — the same frames a
`BinaryLogClient` (Debezium / flink-connector-mysql-cdc, reference
`MySqlStreamingChangeEventSource`) exchanges with a mysqld — so the
engine's client would interoperate with a real server and the in-repo
server with a real client, auth included.

Everything here is the PUBLIC protocol (MySQL Internals manual,
"Client/Server Protocol" + "Replication Protocol" chapters):

- **Packet framing**: every payload travels in packets of
  ``u24le length + u8 sequence-id + body``; bodies over 0xFFFFFF split.
- **Handshake V10** (server -> client): protocol version 10, server
  version cstring, u32 connection id, 8 auth-plugin-data bytes, filler,
  capability flags (two halves), charset, status, 12 more auth bytes +
  NUL, auth plugin name cstring.
- **HandshakeResponse41** (client -> server): client capabilities u32,
  max packet u32, charset u8, 23 reserved zero bytes, username cstring,
  length-prefixed auth response, plugin name cstring.
- **mysql_native_password** scramble:
  ``SHA1(password) XOR SHA1(nonce + SHA1(SHA1(password)))`` — the
  documented challenge/response (no plaintext on the wire).
- **COM_REGISTER_SLAVE** (0x15) and **COM_BINLOG_DUMP** (0x12:
  u32 binlog-pos, u16 flags, u32 server-id, binlog filename) — after
  which the server streams each binlog EVENT as one packet whose body is
  ``0x00 (network OK prefix) + the raw event bytes``, starting with a
  synthetic ROTATE to name the first file, then that file's FDE, and a
  real ROTATE between files; an EOF packet (0xFE) ends a
  non-blocking dump (BINLOG_DUMP_NON_BLOCK, how this client asks).

The client respools streamed events into self-describing binlog FILES
(magic + the streamed FDE + events, split at ROTATE boundaries) so the
entire existing pipeline — file streaming source, Arrow decode, offsets —
runs byte-identically downstream of the socket.
"""

from __future__ import annotations

import hashlib
import os
import socket
import socketserver
import struct
import threading
import zlib

from .mysql_binlog import (_file_sort_key, _read_lenc,
                           decode_gtid_set, encode_gtid_set)
from .vitess import gtid_covers  # MySQL GTID-set algebra

# capability flags (include/mysql_com.h — public constants)
CLIENT_LONG_PASSWORD = 0x00000001
CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SSL = 0x00000800
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000
CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA = 0x00200000

COM_QUIT = 0x01
COM_QUERY = 0x03
COM_REGISTER_SLAVE = 0x15
COM_BINLOG_DUMP = 0x12
COM_BINLOG_DUMP_GTID = 0x1E
BINLOG_DUMP_NON_BLOCK = 0x01
BINLOG_THROUGH_GTID = 0x04
_FORMAT_DESCRIPTION_EVENT = 0x0F
_PREVIOUS_GTIDS_EVENT = 0x23
_MARIADB_BINLOG_CHECKPOINT_EVENT = 161
_MARIADB_GTID_LIST_EVENT = 163
_CHECKSUM_CRC32 = 1

_BINLOG_MAGIC = b"\xfebin"
_ROTATE_EVENT = 0x04
_FDE_EVENT = 0x0F

_CAPS = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
         | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH)


# ---------------------------------------------------------------------------
# packet framing
# ---------------------------------------------------------------------------


def send_packet(wfile, seq: int, body: bytes) -> int:
    """Write ``body`` as MySQL packets (u24le len + seq); returns the next
    sequence id. Bodies of exactly n*0xFFFFFF need a trailing empty
    packet (the documented continuation rule)."""
    while True:
        chunk, body = body[:0xFFFFFF], body[0xFFFFFF:]
        wfile.write(struct.pack("<I", len(chunk))[:3] + bytes([seq & 0xFF])
                    + chunk)
        seq += 1
        if len(chunk) < 0xFFFFFF:
            return seq


def read_packet(rfile) -> tuple[int, bytes]:
    """Read one logical packet (reassembling 0xFFFFFF continuations)."""
    out = bytearray()
    while True:
        header = rfile.read(4)
        if len(header) < 4:
            raise ValueError("connection closed mid-packet")
        n = int.from_bytes(header[:3], "little")
        seq = header[3]
        chunk = b""
        while len(chunk) < n:
            more = rfile.read(n - len(chunk))
            if not more:
                raise ValueError("connection closed mid-packet")
            chunk += more
        out += chunk
        if n < 0xFFFFFF:
            return seq, bytes(out)


def _cstr(b: bytes, pos: int) -> tuple[bytes, int]:
    end = b.index(0, pos)
    return b[pos:end], end + 1


# ---------------------------------------------------------------------------
# mysql_native_password
# ---------------------------------------------------------------------------


def native_password_scramble(password: str, nonce: bytes) -> bytes:
    """``SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))`` (empty pw -> b"")."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode("utf-8")).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def verify_native_password(password: str, nonce: bytes,
                           response: bytes) -> bool:
    """Server side: recover SHA1(pw) from the response and check its hash
    (the server stores only SHA1(SHA1(pw)) — the documented check)."""
    stored2 = hashlib.sha1(
        hashlib.sha1(password.encode("utf-8")).digest()).digest()
    if not response:
        return not password
    h3 = hashlib.sha1(nonce + stored2).digest()
    recovered_h1 = bytes(a ^ b for a, b in zip(response, h3))
    return hashlib.sha1(recovered_h1).digest() == stored2


# ---------------------------------------------------------------------------
# caching_sha2_password (MySQL 8's DEFAULT plugin; the same
# challenge/response shape with SHA-256 and the server's in-memory
# credential cache — the fast path a warmed-up replica client always
# takes; the full-auth fallback needs TLS/RSA, which the sandbox gates)
# ---------------------------------------------------------------------------


def caching_sha2_scramble(password: str, nonce: bytes) -> bytes:
    """``SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) + nonce)``
    (empty pw -> b"")."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode("utf-8")).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + nonce).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def verify_caching_sha2(password: str, nonce: bytes,
                        response: bytes) -> bool:
    """Fast-path check against the cache entry SHA256(SHA256(pw)):
    recover SHA256(pw) = response XOR SHA256(cache + nonce) and compare
    its hash (the toy server's cache is pre-seeded, standing in for a
    prior full authentication)."""
    cache = hashlib.sha256(
        hashlib.sha256(password.encode("utf-8")).digest()).digest()
    if not response:
        return not password
    h3 = hashlib.sha256(cache + nonce).digest()
    recovered = bytes(a ^ b for a, b in zip(response, h3))
    return hashlib.sha256(recovered).digest() == cache


# ---------------------------------------------------------------------------
# caching_sha2_password FULL authentication (round 9 — the cold-cache
# path a real client hits on its first connection over a non-TLS link):
# server sends AuthMoreData 0x04 (perform_full_authentication); the
# client either ships the cleartext password over TLS, or requests the
# server's RSA public key (0x02), XORs ``password + NUL`` with the
# 20-byte handshake nonce (repeating), and RSA-OAEP(SHA-1)-encrypts the
# result — the documented libmysql/BinaryLogClient behaviour (MySQL 8
# caching_sha2_password uses RSA_PKCS1_OAEP_PADDING; the older
# sha256_password plugin used PKCS#1 v1.5). OAEP per RFC 8017 §7.1 in
# plain Python so the toy server and known-answer tests need no crypto
# library.
# ---------------------------------------------------------------------------


def xor_password_scramble(password: str, nonce: bytes) -> bytes:
    """``(password + NUL) XOR nonce-repeated`` — the pre-encryption
    obfuscation both full-auth transports share (the NUL keeps an empty
    password distinguishable and terminates the server-side decode)."""
    pw = password.encode("utf-8") + b"\x00"
    return bytes(b ^ nonce[i % len(nonce)] for i, b in enumerate(pw))


def _mgf1_sha1(seed: bytes, length: int) -> bytes:
    out = bytearray()
    for counter in range((length + 19) // 20):
        out += hashlib.sha1(seed + struct.pack(">I", counter)).digest()
    return bytes(out[:length])


def rsa_oaep_encrypt(message: bytes, n: int, e: int,
                     seed: bytes | None = None) -> bytes:
    """RSAES-OAEP (RFC 8017 §7.1.1) with SHA-1/MGF1-SHA-1 and an empty
    label — OpenSSL's RSA_PKCS1_OAEP_PADDING defaults, i.e. what mysqld
    decrypts. ``seed`` pins the (normally random) 20-byte OAEP seed for
    known-answer tests."""
    k = (n.bit_length() + 7) // 8
    h_len = 20
    if len(message) > k - 2 * h_len - 2:
        raise ValueError("message too long for RSA-OAEP (%d > %d)"
                         % (len(message), k - 2 * h_len - 2))
    l_hash = hashlib.sha1(b"").digest()
    ps = b"\x00" * (k - len(message) - 2 * h_len - 2)
    db = l_hash + ps + b"\x01" + message
    seed = seed if seed is not None else os.urandom(h_len)
    if len(seed) != h_len:
        raise ValueError("OAEP seed must be %d bytes" % h_len)
    masked_db = bytes(a ^ b for a, b in
                      zip(db, _mgf1_sha1(seed, k - h_len - 1)))
    masked_seed = bytes(a ^ b for a, b in
                        zip(seed, _mgf1_sha1(masked_db, h_len)))
    em = b"\x00" + masked_seed + masked_db
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def rsa_oaep_decrypt(cipher: bytes, n: int, d: int) -> bytes:
    """RSAES-OAEP decrypt (RFC 8017 §7.1.2), same parameters. Raises
    ValueError on any padding inconsistency (a toy server aborting the
    auth is the right behaviour; no oracle concern on loopback tests)."""
    k = (n.bit_length() + 7) // 8
    h_len = 20
    if len(cipher) != k:
        raise ValueError("ciphertext length %d != modulus %d"
                         % (len(cipher), k))
    em = pow(int.from_bytes(cipher, "big"), d, n).to_bytes(k, "big")
    if em[0] != 0:
        raise ValueError("OAEP: leading byte not zero")
    masked_seed, masked_db = em[1:1 + h_len], em[1 + h_len:]
    seed = bytes(a ^ b for a, b in
                 zip(masked_seed, _mgf1_sha1(masked_db, h_len)))
    db = bytes(a ^ b for a, b in
               zip(masked_db, _mgf1_sha1(seed, k - h_len - 1)))
    if db[:h_len] != hashlib.sha1(b"").digest():
        raise ValueError("OAEP: label hash mismatch")
    sep = db.find(b"\x01", h_len)
    if sep < 0 or any(db[h_len:sep]):
        raise ValueError("OAEP: malformed padding")
    return db[sep + 1:]


def parse_rsa_public_pem(pem: bytes | str) -> tuple[int, int]:
    """(n, e) from a PEM ``SubjectPublicKeyInfo`` RSA key — the exact
    blob a mysqld answers the 0x02 public-key request with. Minimal DER
    walk (SEQUENCE { AlgorithmIdentifier, BIT STRING { SEQUENCE { n, e
    } } }); no crypto library needed."""
    import base64 as _b64

    text = pem.decode("ascii") if isinstance(pem, bytes) else pem
    b64 = "".join(ln for ln in text.strip().splitlines()
                  if "-----" not in ln)
    der = _b64.b64decode(b64)

    def tlv(buf: bytes, pos: int) -> tuple[int, int, int]:
        tag = buf[pos]
        ln = buf[pos + 1]
        pos += 2
        if ln & 0x80:
            n_bytes = ln & 0x7F
            ln = int.from_bytes(buf[pos:pos + n_bytes], "big")
            pos += n_bytes
        return tag, ln, pos

    tag, _, pos = tlv(der, 0)                      # outer SEQUENCE
    if tag != 0x30:
        raise ValueError("not a DER SEQUENCE")
    tag, alg_len, pos = tlv(der, pos)              # AlgorithmIdentifier
    pos += alg_len
    tag, _, pos = tlv(der, pos)                    # BIT STRING
    if tag != 0x03 or der[pos] != 0:
        raise ValueError("expected 0-unused-bits BIT STRING")
    pos += 1
    tag, _, pos = tlv(der, pos)                    # RSAPublicKey SEQUENCE
    tag, n_len, pos = tlv(der, pos)                # INTEGER n
    if tag != 0x02:
        raise ValueError("expected INTEGER modulus")
    n = int.from_bytes(der[pos:pos + n_len], "big")
    pos += n_len
    tag, e_len, pos = tlv(der, pos)                # INTEGER e
    e = int.from_bytes(der[pos:pos + e_len], "big")
    return n, e


#: The toy server's FIXED 2048-bit RSA keypair (generated once for this
#: repo, TEST-ONLY — a real deployment's key lives in the server). A
#: fixed key is what makes the full-auth exchange known-answer testable
#: offline (verdict r8 item 3).
TOY_RSA_E = 65537
TOY_RSA_N = int(
    "ad560cd69ad1a75a28e84b72421747e290bcf80a9d42eda026129960d2ce4e66"
    "0c561f21c9e99be0297b1b97581ed4e72c2c66ffeb77780170c0b9b422ca33ab"
    "5073e8e95369e11ed7d429f64a2c6e4db67612a5c63a45cf87808075145d023d"
    "b94e55106a4e3177d47f6a4b9cffc6d574be0b08ee942ae99d1ccf44b37aa03e"
    "e8bcd05f70908bfdcfb51218af35dd85da27a41d6ccd40f8ea2c9d6fbdb382be"
    "90ce84e587f94390bf2aac8e5b009e7da7912f159b6286e12b4f6f9e4bf7be0c"
    "2371eeb152d04db8ed6588910d90896c267b14bc912cc8f13266e5d4e887de48"
    "8b597aad4242c9e8db91b11b1cbd0f1314bbedf0284ffa474b6278d08334de69", 16)
TOY_RSA_D = int(
    "1a71fe37f0bb6b57b555898b375ba36f44eb5bc18cd034fe61c8a527714a220a"
    "6e37e67c8a786e7c72ffb20c3358d2dd292f6610860d7e5ce3e5b77f6cee6217"
    "314959dfdd46d25e9909a8d447694373ee5251d2826d8a10994908f033e8e3ca"
    "647ef7b9ef2a1a6080a666e27de3c5237471f92f85eccba6443eecbd7bcf89ea"
    "8661fdc0d122191b3cfb774eafe1281e2c54778dc3609e0f702888098188c3fa"
    "6abe4f4b24ecb4dd737e8be00fea89d3c68a882eaef20e4596b6d7f4a931d8b2"
    "185695c378546d2eefaf74844dff5e1154a191a8b23fba397cae28c6f8c98df2"
    "6500a63b3828a4e82235e8c3555615d019ed88166c575e329272dabde813a44d", 16)
TOY_RSA_PUB_PEM = b"""-----BEGIN PUBLIC KEY-----
MIIBIjANBgkqhkiG9w0BAQEFAAOCAQ8AMIIBCgKCAQEArVYM1prRp1oo6EtyQhdH
4pC8+AqdQu2gJhKZYNLOTmYMVh8hyemb4Cl7G5dYHtTnLCxm/+t3eAFwwLm0Isoz
q1Bz6OlTaeEe19Qp9kosbk22dhKlxjpFz4eAgHUUXQI9uU5VEGpOMXfUf2pLnP/G
1XS+CwjulCrpnRzPRLN6oD7ovNBfcJCL/c+1EhivNd2F2iekHWzNQPjqLJ1vvbOC
vpDOhOWH+UOQvyqsjlsAnn2nkS8Vm2KG4StPb55L974MI3HusVLQTbjtZYiRDZCJ
bCZ7FLyRLMjxMmbl1OiH3kiLWXqtQkLJ6NuRsRscvQ8TFLvt8ChP+kdLYnjQgzTe
aQIDAQAB
-----END PUBLIC KEY-----
"""


# ---------------------------------------------------------------------------
# handshake encode/decode (both directions, so each side is testable)
# ---------------------------------------------------------------------------


def encode_handshake_v10(nonce: bytes, connection_id: int = 1,
                         server_version: str = "8.0.36-toy",
                         auth_plugin: str = "mysql_native_password",
                         extra_caps: int = 0) -> bytes:
    assert len(nonce) == 20
    caps = _CAPS | extra_caps
    body = bytes([10]) + server_version.encode() + b"\x00"
    body += struct.pack("<I", connection_id)
    body += nonce[:8] + b"\x00"
    body += struct.pack("<H", caps & 0xFFFF)
    body += bytes([0x21])                      # charset utf8_general_ci
    body += struct.pack("<H", 0x0002)          # status: autocommit
    body += struct.pack("<H", (caps >> 16) & 0xFFFF)
    body += bytes([21])                        # auth-plugin-data length
    body += b"\x00" * 10                       # reserved
    body += nonce[8:20] + b"\x00"
    body += auth_plugin.encode("ascii") + b"\x00"
    return body


def decode_handshake_v10(body: bytes) -> dict:
    if body[0] != 10:
        raise ValueError("not a protocol-10 handshake (got %d)" % body[0])
    ver, pos = _cstr(body, 1)
    cid = struct.unpack_from("<I", body, pos)[0]
    pos += 4
    nonce1 = body[pos:pos + 8]
    pos += 9                                    # + filler
    caps = struct.unpack_from("<H", body, pos)[0]
    pos += 2
    pos += 3                                    # charset + status
    caps |= struct.unpack_from("<H", body, pos)[0] << 16
    pos += 2
    auth_len = body[pos]
    pos += 1 + 10                               # + reserved
    n2 = max(13, auth_len - 8) - 1
    nonce2 = body[pos:pos + n2]
    pos += n2 + 1                               # + trailing NUL
    plugin, _ = _cstr(body, pos)
    return {"server_version": ver.decode(), "connection_id": cid,
            "nonce": nonce1 + nonce2, "capabilities": caps,
            "auth_plugin": plugin.decode()}


def encode_ssl_request(extra_caps: int = 0) -> bytes:
    """The short (32-byte) SSL Request Packet: the HandshakeResponse41
    prefix with CLIENT_SSL set, after which the SAME connection upgrades
    to TLS and the full response follows encrypted (MySQL Internals,
    'Protocol::SSLRequest')."""
    return (struct.pack("<I", _CAPS | CLIENT_SSL | extra_caps)
            + struct.pack("<I", 1 << 24) + bytes([0x21]) + b"\x00" * 23)


def encode_handshake_response(user: str, password: str, nonce: bytes,
                              auth_plugin: str = "mysql_native_password",
                              extra_caps: int = 0) -> bytes:
    if auth_plugin == "caching_sha2_password":
        auth = caching_sha2_scramble(password, nonce)
    elif auth_plugin == "mysql_native_password":
        auth = native_password_scramble(password, nonce)
    else:
        raise ValueError("unsupported auth plugin %r" % auth_plugin)
    body = struct.pack("<I", _CAPS | extra_caps) + struct.pack("<I", 1 << 24)
    body += bytes([0x21]) + b"\x00" * 23
    body += user.encode("utf-8") + b"\x00"
    body += bytes([len(auth)]) + auth
    body += auth_plugin.encode("ascii") + b"\x00"
    return body


def decode_handshake_response(body: bytes) -> dict:
    caps = struct.unpack_from("<I", body, 0)[0]
    if not caps & CLIENT_PROTOCOL_41:
        raise ValueError("client does not speak protocol 4.1")
    pos = 4 + 4 + 1 + 23
    user, pos = _cstr(body, pos)
    # auth-response length: lenenc when the client announced
    # CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA, else the 1-byte form
    # (ADVICE r7: ignoring the bit misparsed real clients)
    if caps & CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA:
        alen, pos = _read_lenc(body, pos)
    else:
        alen = body[pos]
        pos += 1
    auth = body[pos:pos + alen]
    pos += alen
    database = None
    if caps & CLIENT_CONNECT_WITH_DB and pos < len(body):
        # the database cstring sits BETWEEN the auth response and the
        # plugin name (ADVICE r7: it used to be misread as the plugin,
        # forcing a spurious auth switch)
        db, pos = _cstr(body, pos)
        database = db.decode()
    plugin = b""
    if caps & CLIENT_PLUGIN_AUTH and pos < len(body):
        plugin, pos = _cstr(body, pos)
    return {"capabilities": caps, "user": user.decode(),
            "auth_response": auth, "database": database,
            "auth_plugin": plugin.decode()}


def file_previous_gtids(data: bytes) -> str | None:
    """Extract a binlog file's PREVIOUS_GTIDS set (the executed set at
    file start — what makes each rotated file self-describing and what
    COM_BINLOG_DUMP_GTID start-file selection keys on). None when the
    file carries no such event (pre-GTID writer). Tolerates a PREFIX of
    a file: the header events sit in the first bytes, so callers may
    read a bounded slice instead of whole multi-GB files."""
    if data[:4] != _BINLOG_MAGIC:
        return None
    pos = 4
    while pos + 19 <= len(data):
        ln = struct.unpack_from("<I", data, pos + 9)[0]
        if ln < 19 or pos + ln > len(data):
            return None  # truncated prefix past the header events
        ev = data[pos:pos + ln]
        if ev[4] == _PREVIOUS_GTIDS_EVENT:
            # a CRC trailer does not disturb the parse: the encoding is
            # length-driven from the front
            return decode_gtid_set(ev[19:])
        if ev[4] != _FORMAT_DESCRIPTION_EVENT:
            # PREVIOUS_GTIDS sits immediately after the FDE when present
            return None
        pos += ln
    return None


def file_mariadb_gtid_list(data: bytes) -> str | None:
    """MariaDB analog of file_previous_gtids: the GTID_LIST event (163)
    carries the binlog state per replication domain at file start —
    what `@slave_connect_state` start-file selection keys on. Returns
    the canonical `domain-server-seq,...` string, or None when the file
    carries no such header. Tolerates a bounded prefix; skips the
    BINLOG_CHECKPOINT marker that MariaDB interleaves with the header
    events."""
    if data[:4] != _BINLOG_MAGIC:
        return None
    pos = 4
    while pos + 19 <= len(data):
        ln = struct.unpack_from("<I", data, pos + 9)[0]
        if ln < 19 or pos + ln > len(data):
            return None
        ev = data[pos:pos + ln]
        if ev[4] == _MARIADB_GTID_LIST_EVENT:
            from .mysql_binlog import format_mariadb_gtid_set

            packed = struct.unpack_from("<I", ev, 19)[0]
            count = packed & 0x0FFFFFFF
            state: dict = {}
            for i in range(count):
                d, sv, q = struct.unpack_from("<IIQ", ev, 23 + 16 * i)
                if d not in state or q > state[d][1]:
                    state[d] = (sv, q)
            return format_mariadb_gtid_set(state)
        if ev[4] not in (_FORMAT_DESCRIPTION_EVENT,
                         _MARIADB_BINLOG_CHECKPOINT_EVENT):
            return None
        pos += ln
    return None


def _ok_packet() -> bytes:
    # OK: header 0x00, affected rows 0, last insert id 0, status, warnings
    return b"\x00\x00\x00" + struct.pack("<HH", 0x0002, 0)


def _err_packet(code: int, msg: str) -> bytes:
    return b"\xff" + struct.pack("<H", code) + b"#HY000" + msg.encode()


# ---------------------------------------------------------------------------
# replication event framing
# ---------------------------------------------------------------------------


def _rotate_event(next_file: str, pos: int, server_id: int = 1) -> bytes:
    """A synthetic ROTATE (timestamp 0, the convention for the fake
    rotate a dump starts with): header + u64 position + file name.
    next_event_pos 0 and no checksum, like a fake rotate."""
    body = struct.pack("<Q", pos) + next_file.encode("ascii")
    header = struct.pack("<IBIIIH", 0, _ROTATE_EVENT, server_id,
                         19 + len(body), 0, 0x20)
    return header + body


def iter_file_events(data: bytes):
    """Split one self-describing binlog file into raw event byte strings
    (header says its own length; no decode needed for transport)."""
    if data[:4] != _BINLOG_MAGIC:
        raise ValueError("not a binlog file")
    pos = 4
    while pos < len(data):
        if pos + 19 > len(data):
            raise ValueError("trailing garbage after last event")
        ev_len = struct.unpack_from("<I", data, pos + 9)[0]
        if ev_len < 19 or pos + ev_len > len(data):
            # a zero/short length would never advance (infinite loop in
            # the serving thread); a long one overruns the file
            raise ValueError(
                "corrupt binlog event at offset %d: length %d"
                % (pos, ev_len))
        yield data[pos:pos + ev_len]
        pos += ev_len


class MysqldToyServer:
    """Serve a directory of binlog files over the REAL replication
    protocol: handshake V10, mysql_native_password auth,
    COM_REGISTER_SLAVE/COM_BINLOG_DUMP, then one packet per event with
    the 0x00 network prefix, fake-ROTATE file naming, and a final EOF
    packet (non-blocking dump)."""

    def __init__(self, directory: str, user: str = "repl",
                 password: str = "replpass",
                 auth_plugin: str = "caching_sha2_password",
                 host: str = "127.0.0.1", port: int = 0,
                 force_full_auth: bool = False,
                 tls: bool = False):
        if auth_plugin not in ("caching_sha2_password",
                               "mysql_native_password"):
            raise ValueError("unsupported auth plugin %r" % auth_plugin)
        self.directory = directory
        self.user, self.password = user, password
        self.auth_plugin = auth_plugin
        #: mimic a cold caching_sha2 cache: request FULL authentication
        #: (AuthMoreData 0x04) — round 9: answered for real (RSA public
        #: key exchange on plain TCP, cleartext password over TLS), no
        #: longer a client refusal
        self.force_full_auth = force_full_auth
        #: advertise CLIENT_SSL and serve a one-shot self-signed cert
        #: (openssl, like the PG harness); `ca_cert` is the path a
        #: verify-ca client pins
        self.tls = tls
        self.ca_cert: str | None = None
        self._ssl_ctx = None
        self._tls_dir: str | None = None
        if tls:
            import ssl as _ssl
            import subprocess
            import tempfile

            d = tempfile.mkdtemp(prefix="mysqld-toy-tls-")
            self._tls_dir = d
            crt = os.path.join(d, "server.crt")
            key = os.path.join(d, "server.key")
            subprocess.run(
                ["openssl", "req", "-x509", "-newkey", "rsa:2048",
                 "-nodes", "-keyout", key, "-out", crt, "-days", "2",
                 "-subj", "/CN=127.0.0.1"],
                check=True, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            os.chmod(key, 0o600)
            self.ca_cert = crt
            self._ssl_ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
            self._ssl_ctx.load_cert_chain(crt, key)
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:  # pragma: no cover - via client
                outer._session(self.rfile, self.wfile, self.connection)

        class Srv(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Srv((host, port), Handler)
        self.host, self.port = self._srv.server_address[:2]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)

    # -- session ------------------------------------------------------------
    @staticmethod
    def _make_nonce() -> bytes:
        """20 bytes of printable non-NUL ASCII: real clients parse the
        auth-plugin-data halves as NUL-terminated strings, so a raw hash
        byte string would intermittently truncate at an embedded 0x00
        (mysqld restricts its scramble the same way)."""
        alphabet = bytes(range(0x21, 0x7F))
        return bytes(alphabet[b % len(alphabet)] for b in os.urandom(20))

    def _verify(self, plugin: str, nonce: bytes, response: bytes) -> bool:
        if plugin == "caching_sha2_password":
            return verify_caching_sha2(self.password, nonce, response)
        return verify_native_password(self.password, nonce, response)

    @staticmethod
    def _read_packet_exact(sock) -> tuple[int, bytes]:
        """One packet read with EXACT-size recvs straight off the
        socket — used only for the first client packet of a
        TLS-capable session. MySQL's SSLRequest has no server ack (the
        client sends its ClientHello immediately after), so a BUFFERED
        read here could swallow TLS bytes that arrived coalesced and
        break the handshake; exact reads can't over-consume."""
        def recv_exact(n: int) -> bytes:
            out = bytearray()
            while len(out) < n:
                chunk = sock.recv(n - len(out))
                if not chunk:
                    raise ValueError("connection closed mid-packet")
                out += chunk
            return bytes(out)

        head = recv_exact(4)
        ln = head[0] | (head[1] << 8) | (head[2] << 16)
        return head[3], recv_exact(ln)

    def _session(self, rfile, wfile, sock=None) -> None:
        nonce = self._make_nonce()
        seq = send_packet(wfile, 0, encode_handshake_v10(
            nonce, auth_plugin=self.auth_plugin,
            extra_caps=CLIENT_SSL if self.tls else 0))
        tls_active = False
        if self.tls and sock is not None:
            # first client packet read unbuffered (see _read_packet_exact)
            seq, body = self._read_packet_exact(sock)
        else:
            seq, body = read_packet(rfile)
        if (self.tls and sock is not None and len(body) == 32
                and struct.unpack_from("<I", body, 0)[0] & CLIENT_SSL):
            # Protocol::SSLRequest — the 32-byte HandshakeResponse41
            # prefix; the SAME connection upgrades and the full
            # response follows encrypted
            sock = self._ssl_ctx.wrap_socket(sock, server_side=True)
            rfile = sock.makefile("rb")
            wfile = sock.makefile("wb", buffering=0)
            tls_active = True
            seq, body = read_packet(rfile)
        resp = decode_handshake_response(body)
        auth, plugin = resp["auth_response"], resp["auth_plugin"]
        if plugin != self.auth_plugin:
            # AuthSwitchRequest (0xFE + plugin cstring + nonce + NUL):
            # how a real server moves a client onto its plugin
            seq = send_packet(wfile, seq + 1,
                              b"\xfe" + self.auth_plugin.encode("ascii")
                              + b"\x00" + nonce + b"\x00")
            seq, auth = read_packet(rfile)
            plugin = self.auth_plugin
        if resp["user"] != self.user:
            send_packet(wfile, seq + 1, _err_packet(1045, "Access denied"))
            return
        if plugin == "caching_sha2_password" and self.force_full_auth:
            # cold cache: a real server CANNOT check the fast response
            # (it has no cached SHA256(SHA256(pw))) — it requests full
            # authentication instead of verifying
            seq = send_packet(wfile, seq + 1, b"\x01\x04")
            seq, reply = read_packet(rfile)
            if reply == b"\x02":
                # public-key request — a real mysqld serves the key on
                # EITHER transport (the in-repo client sends cleartext
                # over TLS, but an external client may request the key
                # there too; unambiguous vs a cleartext password, which
                # is always NUL-terminated). Answer with the toy's
                # fixed PEM, then decrypt the OAEP blob and un-XOR the
                # nonce.
                seq = send_packet(wfile, seq + 1,
                                  b"\x01" + TOY_RSA_PUB_PEM)
                seq, blob = read_packet(rfile)
                try:
                    scr = rsa_oaep_decrypt(bytes(blob),
                                           TOY_RSA_N, TOY_RSA_D)
                except ValueError:
                    send_packet(wfile, seq + 1,
                                _err_packet(1045, "Access denied"))
                    return
                pw = bytes(b ^ nonce[i % len(nonce)]
                           for i, b in enumerate(scr))
            else:
                # over TLS the client ships the password in the clear
                # (NUL-terminated) — the channel is the protection
                pw = bytes(reply)
            if pw != self.password.encode("utf-8") + b"\x00":
                send_packet(wfile, seq + 1,
                            _err_packet(1045, "Access denied"))
                return
            send_packet(wfile, seq + 1, _ok_packet())
            self._command_loop(rfile, wfile)
            return
        if not self._verify(plugin, nonce, bytes(auth)):
            send_packet(wfile, seq + 1, _err_packet(1045, "Access denied"))
            return
        seq += 1  # first reply packet follows the client's last one
        if plugin == "caching_sha2_password":
            # AuthMoreData "fast auth success" precedes the OK (the
            # cache-hit path a warmed-up replica client always takes);
            # send_packet RETURNS the next sequence id — adding 1 again
            # gapped the sequence, which a real client rejects as
            # "packets out of order"
            seq = send_packet(wfile, seq, b"\x01\x03")
        send_packet(wfile, seq, _ok_packet())
        self._command_loop(rfile, wfile)

    def _command_loop(self, rfile, wfile) -> None:
        slave_connect_state = None  # MariaDB GTID startup register
        while True:
            try:
                _, cmd = read_packet(rfile)
            except ValueError:
                return
            if not cmd or cmd[0] == COM_QUIT:
                return
            if cmd[0] == COM_QUERY:
                q = cmd[1:].decode("utf-8", "replace").strip()
                up = q.upper()
                if up.startswith("SHOW GLOBAL VARIABLES") or \
                        up.startswith("SHOW VARIABLES"):
                    # real replication clients (BinaryLogClient) probe
                    # variables with resultset queries during setup — a
                    # bare OK aborts them (round-9 review): answer with
                    # a proper protocol-41 text resultset
                    self._send_variables_resultset(wfile, q)
                    continue
                if up.startswith("SET @SLAVE_CONNECT_STATE="):
                    # MariaDB replica register: the GTID position the
                    # following COM_BINLOG_DUMP starts from
                    val = q.split("=", 1)[1].strip().strip("'\"")
                    slave_connect_state = val
                # session SETs (checksum announcement, the other
                # MariaDB registers): OK reply, like mysqld answers a
                # resultset-free statement
                send_packet(wfile, 1, _ok_packet())
                continue
            if cmd[0] == COM_REGISTER_SLAVE:
                send_packet(wfile, 1, _ok_packet())
                continue
            if cmd[0] == COM_BINLOG_DUMP:
                pos, flags, _sid = struct.unpack_from("<IHI", cmd, 1)
                from_file = cmd[11:].decode("ascii") or "*"
                if slave_connect_state is not None:
                    # MariaDB semantics: the register picks the start
                    # file; the command's file/pos are ignored
                    start = self._mariadb_gtid_start_file(
                        slave_connect_state)
                    if start is None:
                        send_packet(wfile, 1, _err_packet(
                            1236, "Cannot replicate because the source "
                            "purged required binary logs"))
                        return
                    from_file, pos = start, 4
                self._stream(wfile, from_file, pos, flags)
                if not flags & BINLOG_DUMP_NON_BLOCK:
                    return  # blocking dump: hold forever (toy: close)
                continue
            if cmd[0] == COM_BINLOG_DUMP_GTID:
                # client-supplied lengths are untrusted: a hostile or
                # truncated name_len/data_len must answer an ERR packet,
                # not kill the handler thread with struct.error
                try:
                    flags, _sid, name_len = struct.unpack_from(
                        "<HII", cmd, 1)
                    p = 11 + name_len + 8  # skip name + pos
                    if p + 4 > len(cmd):
                        raise ValueError("lengths overrun the packet")
                    data_len = struct.unpack_from("<I", cmd, p)[0]
                    if p + 4 + data_len > len(cmd):
                        raise ValueError("lengths overrun the packet")
                    client_set = (decode_gtid_set(
                        cmd[p + 4:p + 4 + data_len])
                        if data_len >= 8 else "")
                except (struct.error, ValueError, IndexError):
                    send_packet(wfile, 1, _err_packet(
                        1064, "Malformed COM_BINLOG_DUMP_GTID"))
                    return
                start = self._gtid_start_file(client_set)
                if start is None:
                    # mysqld's ER_MASTER_FATAL_ERROR_READING_BINLOG:
                    # the client's executed set misses transactions
                    # that were purged with the missing files
                    send_packet(wfile, 1, _err_packet(
                        1236, "Cannot replicate because the source "
                        "purged required binary logs"))
                    return
                self._stream(wfile, start, 4, flags)
                if not flags & BINLOG_DUMP_NON_BLOCK:
                    return
                continue
            send_packet(wfile, 1, _err_packet(1047, "Unknown command"))

    def _gtid_start_file(self, client_set: str) -> str | None:
        """mysqld's COM_BINLOG_DUMP_GTID start-file selection: the
        NEWEST file whose PREVIOUS_GTIDS is contained in the client's
        executed set (everything before it is already applied). None
        when even the oldest file starts past the client — required
        transactions were purged. A file WITHOUT the header (pre-GTID
        writer) has unknown coverage: it never advances the choice past
        itself — treating it as covered silently dropped every earlier
        file's rows (review-confirmed data loss). Header parsing reads
        a bounded prefix, not whole files."""
        chosen = None
        for name in self._files_from("*"):
            with open(os.path.join(self.directory, name), "rb") as f:
                head = f.read(65536)
            prev = file_previous_gtids(head)
            if prev is None:
                if chosen is None:
                    chosen = name  # oldest file: the only safe start
                break
            if gtid_covers(client_set or "", prev):
                chosen = name  # keep scanning: newest covered wins
            else:
                break          # files only grow their executed set
        return chosen

    def _mariadb_gtid_start_file(self, client_state: str) -> str | None:
        """MariaDB's @slave_connect_state start-file selection — same
        shape as _gtid_start_file, keyed on each file's GTID_LIST
        header and the per-domain seq_no coverage algebra."""
        from .mysql_binlog import mariadb_gtid_covers

        chosen = None
        for name in self._files_from("*"):
            with open(os.path.join(self.directory, name), "rb") as f:
                head = f.read(65536)
            state = file_mariadb_gtid_list(head)
            if state is None:
                if chosen is None:
                    chosen = name  # oldest file: the only safe start
                break
            if mariadb_gtid_covers(client_state or "", state):
                chosen = name  # keep scanning: newest covered wins
            else:
                break          # files only grow their binlog state
        return chosen

    #: what SHOW [GLOBAL] VARIABLES answers; subclasses/tests may extend
    VARIABLES = {"server_id": "1", "version": "8.0.36-toy",
                 "gtid_mode": "ON", "binlog_format": "ROW",
                 "binlog_row_image": "FULL"}

    def _send_variables_resultset(self, wfile, query: str) -> None:
        """Protocol-41 text resultset for SHOW [GLOBAL] VARIABLES
        [LIKE 'pat']: column count, 2 ColumnDefinition41s, EOF, one row
        per matching variable, EOF (classic-EOF form — the toy never
        announces CLIENT_DEPRECATE_EOF)."""
        import fnmatch
        import re as _re

        from .mysql_binlog import _write_lenc

        def lenc_str(s: str) -> bytes:
            b = s.encode("utf-8")
            return _write_lenc(len(b)) + b

        def coldef(name: str) -> bytes:
            return (lenc_str("def") + lenc_str("") + lenc_str("")
                    + lenc_str("") + lenc_str(name) + lenc_str(name)
                    + b"\x0c" + struct.pack("<HIBHB", 0x21, 255, 0xFD,
                                             0, 0) + b"\x00\x00")

        variables = dict(self.VARIABLES)
        # binlog_checksum reflects what the served files declare
        crc = any(self._declares_crc32(
            open(os.path.join(self.directory, n), "rb").read(256))
            for n in self._files_from("*"))
        variables["binlog_checksum"] = "CRC32" if crc else "NONE"
        m = _re.search(r"LIKE\s+'([^']*)'", query, _re.IGNORECASE)
        if m:
            pat = m.group(1).replace("%", "*").replace("_", "?")
            rows = sorted((k, v) for k, v in variables.items()
                          if fnmatch.fnmatch(k, pat))
        else:
            rows = sorted(variables.items())
        seq = send_packet(wfile, 1, b"\x02")  # column count
        seq = send_packet(wfile, seq, coldef("Variable_name"))
        seq = send_packet(wfile, seq, coldef("Value"))
        eof = b"\xfe" + struct.pack("<HH", 0, 0x0002)
        seq = send_packet(wfile, seq, eof)
        for k, v in rows:
            seq = send_packet(wfile, seq, lenc_str(k) + lenc_str(v))
        send_packet(wfile, seq, eof)

    def _files_from(self, from_file: str) -> list[str]:
        names = sorted((n for n in os.listdir(self.directory)
                        if os.path.isfile(os.path.join(self.directory, n))),
                       key=_file_sort_key)
        if from_file != "*":
            names = [n for n in names
                     if _file_sort_key(n) >= _file_sort_key(from_file)]
        return names

    @staticmethod
    def _declares_crc32(data: bytes) -> bool:
        """Does the file's FDE (first event after the magic) declare
        CRC32? Real mysqld checksums its ARTIFICIAL rotate events too
        when the client announced checksum awareness — the toy mirrors
        that so the client's trailer stripping faces real shapes."""
        if len(data) < 4 + 19:
            return False
        ln = struct.unpack_from("<I", data, 4 + 9)[0]
        fde = data[4:4 + ln]
        return (len(fde) >= 24 and fde[4] == _FORMAT_DESCRIPTION_EVENT
                and fde[-5] == _CHECKSUM_CRC32)

    def _stream(self, wfile, from_file: str, pos: int, flags: int) -> None:
        seq = 1
        first = True
        for name in self._files_from(from_file):
            with open(os.path.join(self.directory, name), "rb") as f:
                data = f.read()
            # fake ROTATE names the file the following events belong to;
            # CRC32-checksummed like the served file (real-server shape)
            rot = _rotate_event(name, max(pos, 4) if first else 4)
            if self._declares_crc32(data):
                rot += struct.pack("<I", zlib.crc32(rot))
            seq = send_packet(wfile, seq, b"\x00" + rot)
            offset = 4  # running byte offset inside the served file
            for ev in iter_file_events(data):
                start = offset
                offset += len(ev)
                if first and start < pos and ev[4] not in (
                        _FDE_EVENT, _PREVIOUS_GTIDS_EVENT):
                    # resume semantics (round-9 review: the pos
                    # parameter was parsed and IGNORED, re-delivering
                    # every event as a duplicate): a real mysqld seeks
                    # to pos and streams from there, always after the
                    # file's FDE (and its PREVIOUS_GTIDS anchor)
                    continue
                seq = send_packet(wfile, seq, b"\x00" + ev)
            first = False
        seq = send_packet(wfile, seq, b"\xfe\x00\x00\x02\x00")  # EOF

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> "MysqldToyServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._tls_dir is not None:
            # the one-shot cert/key tempdir dies with the server (the
            # 0600 private key must not accumulate in $TMPDIR)
            import shutil

            shutil.rmtree(self._tls_dir, ignore_errors=True)
            self._tls_dir = None

    def __enter__(self) -> "MysqldToyServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def dump_binlog_stream(host: str, port: int, spool_dir: str, *,
                       user: str = "repl", password: str = "replpass",
                       from_file: str | None = None, server_id: int = 2,
                       timeout: float = 30.0,
                       stop_at: tuple[str, int] | None = None,
                       gtid_set: str | None = None,
                       ssl_mode: str = "disabled",
                       ssl_ca: str | None = None) -> list[str]:
    """BinaryLogClient analog over the REAL protocol: handshake + auth +
    ``SET @master_binlog_checksum`` announcement (a real mysqld with
    binlog_checksum=CRC32 refuses the dump to a client that has not
    announced checksum awareness — same as mysql-binlog-connector-java)
    + COM_REGISTER_SLAVE + COM_BINLOG_DUMP(non-blocking), respooling the
    event stream into self-describing binlog files (magic + events,
    split at ROTATE boundaries; the synthetic timestamp-0 rotates name
    the files and are not written into them). Returns the file names
    written, numeric order.

    ``stop_at`` = (file, position): bounded stop for BLOCKING dump
    sessions (a real mysqld without NON_BLOCK streams forever, the
    walsender-termination lesson of round 8) — the client stops cleanly
    once the named file reaches end_log_pos >= position.

    ``gtid_set``: resume by executed-GTID set via COM_BINLOG_DUMP_GTID
    (the reference's GTID startup mode, BinaryLogClient's
    `gtidSet` path) — the server picks the starting FILE from each
    file's PREVIOUS_GTIDS header and answers error 1236 when required
    transactions were purged; transactions the set already covers are
    dropped downstream by the decode-side offset filter
    (`scan.startup.specific-offset.gtid-set`)."""
    from .mysql_binlog import is_mariadb_gtid

    # MariaDB GTID startup is a DIFFERENT handshake from MySQL's
    # COM_BINLOG_DUMP_GTID: the position rides session registers
    # (`SET @slave_connect_state=...` + @mariadb_slave_capability)
    # before a PLAIN COM_BINLOG_DUMP with an empty filename — the
    # server picks the start file from each file's GTID_LIST header
    # (MariaDB KB "Using the replication protocol"). Round 11 speaks
    # it instead of refusing.
    maria_gtid_startup = gtid_set is not None and is_mariadb_gtid(gtid_set)
    os.makedirs(spool_dir, exist_ok=True)
    written: list[str] = []
    if ssl_mode not in ("disabled", "required", "verify-ca"):
        raise ValueError("ssl_mode must be disabled, required or "
                         "verify-ca (got %r)" % ssl_mode)
    import contextlib

    with contextlib.ExitStack() as stack:
        sock = stack.enter_context(
            socket.create_connection((host, port), timeout=timeout))
        rfile = sock.makefile("rb")
        wfile = sock.makefile("wb", buffering=0)
        _, hello = read_packet(rfile)
        if hello[:1] == b"\xff":
            raise ValueError("server refused connection")
        hs = decode_handshake_v10(hello)
        plugin, nonce = hs["auth_plugin"], hs["nonce"]
        if plugin not in ("caching_sha2_password", "mysql_native_password"):
            raise ValueError("unsupported auth plugin %r" % plugin)
        tls_active = False
        extra_caps = 0
        if ssl_mode != "disabled":
            # MySQL's TLS upgrade: the 32-byte SSLRequest prefix rides
            # plaintext, the SAME connection upgrades, and the full
            # HandshakeResponse41 follows encrypted (seq continues).
            # verify-ca pins the server cert to ssl_ca (no hostname
            # check, matching mysql --ssl-mode=VERIFY_CA); required is
            # encrypted-but-unauthenticated, like the PG `tls` posture.
            import ssl as _ssl

            if not hs["capabilities"] & CLIENT_SSL:
                raise ValueError(
                    "ssl-mode=%s but the server does not advertise "
                    "CLIENT_SSL" % ssl_mode)
            if ssl_mode == "verify-ca":
                if not ssl_ca:
                    raise ValueError("ssl-mode=verify-ca needs ssl_ca")
                ctx = _ssl.create_default_context(cafile=ssl_ca)
                ctx.check_hostname = False
            else:
                ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
                ctx.check_hostname = False
                ctx.verify_mode = _ssl.CERT_NONE
            send_packet(wfile, 1, encode_ssl_request())
            sock = stack.enter_context(ctx.wrap_socket(sock))
            rfile = sock.makefile("rb")
            wfile = sock.makefile("wb", buffering=0)
            tls_active = True
            extra_caps = CLIENT_SSL
        send_packet(wfile, 2 if tls_active else 1,
                    encode_handshake_response(
                        user, password, nonce, auth_plugin=plugin,
                        extra_caps=extra_caps))
        seq = 3 if tls_active else 2
        while True:
            seq, reply = read_packet(rfile)
            seq += 1
            if reply[:1] == b"\x00":        # OK — authenticated
                break
            if reply[:1] == b"\xff":
                raise ValueError("auth failed: %r" % reply[:40])
            if reply[:1] == b"\x01":        # AuthMoreData
                if reply[1:2] == b"\x03":   # fast auth success; OK next
                    continue
                if reply[1:2] == b"\x04":   # perform_full_authentication
                    # round 9 (was a named refusal): over TLS the
                    # password ships in the clear on the protected
                    # channel; over plain TCP, request the server's RSA
                    # public key (0x02), XOR-scramble the password with
                    # the handshake nonce, and RSA-OAEP-encrypt it —
                    # libmysql/BinaryLogClient's documented cold-cache
                    # behaviour
                    if tls_active:
                        send_packet(wfile, seq,
                                    password.encode("utf-8") + b"\x00")
                        continue
                    send_packet(wfile, seq, b"\x02")
                    seq, more = read_packet(rfile)
                    seq += 1
                    if more[:1] != b"\x01":
                        raise ValueError(
                            "expected the RSA public key, got %r"
                            % more[:10])
                    n_pub, e_pub = parse_rsa_public_pem(bytes(more[1:]))
                    send_packet(wfile, seq, rsa_oaep_encrypt(
                        xor_password_scramble(password, nonce),
                        n_pub, e_pub))
                    continue
                raise ValueError("unexpected AuthMoreData %r"
                                 % reply[:4])
            if reply[:1] == b"\xfe":        # AuthSwitchRequest
                p_end = reply.index(0, 1)
                plugin = reply[1:p_end].decode("ascii")
                nonce = reply[p_end + 1:].rstrip(b"\x00")
                if plugin == "caching_sha2_password":
                    scr = caching_sha2_scramble(password, nonce)
                elif plugin == "mysql_native_password":
                    scr = native_password_scramble(password, nonce)
                else:
                    raise ValueError("switch to unsupported plugin %r"
                                     % plugin)
                send_packet(wfile, seq, scr)
                continue
            raise ValueError("unexpected auth packet %r" % reply[:10])
        # announce checksum awareness (mysql-binlog-connector-java's
        # first statement): without it a CRC32-checksumming mysqld
        # refuses the dump outright
        send_packet(wfile, 0, bytes([COM_QUERY])
                    + b"SET @master_binlog_checksum= "
                      b"@@global.binlog_checksum")
        _, reply = read_packet(rfile)
        if reply[:1] == b"\xff":
            raise ValueError("checksum announcement refused: %r"
                             % reply[:40])
        if maria_gtid_startup:
            # the MariaDB replica register dance, one OK per statement
            for stmt in ("SET @slave_connect_state='%s'" % gtid_set,
                         "SET @slave_gtid_strict_mode=0",
                         "SET @slave_gtid_ignore_duplicates=0",
                         "SET @mariadb_slave_capability=4"):
                send_packet(wfile, 0, bytes([COM_QUERY]) + stmt.encode())
                _, reply = read_packet(rfile)
                if reply[:1] == b"\xff":
                    raise ValueError(
                        "MariaDB GTID register %r refused: %r"
                        % (stmt, reply[:60]))
        # register as a replica, then ask for the stream
        send_packet(wfile, 0, bytes([COM_REGISTER_SLAVE])
                    + struct.pack("<I", server_id) + b"\x00" * 18)
        _, reply = read_packet(rfile)
        if reply[:1] != b"\x00":
            raise ValueError("COM_REGISTER_SLAVE refused: %r" % reply[:40])
        if maria_gtid_startup:
            # empty filename + pos 4: @slave_connect_state picks the
            # start file server-side
            dump = (bytes([COM_BINLOG_DUMP]) + struct.pack("<I", 4)
                    + struct.pack("<H", BINLOG_DUMP_NON_BLOCK)
                    + struct.pack("<I", server_id))
        elif gtid_set is not None:
            blob = encode_gtid_set(gtid_set)
            name = (from_file or "").encode("ascii")
            dump = (bytes([COM_BINLOG_DUMP_GTID])
                    + struct.pack("<H", BINLOG_DUMP_NON_BLOCK
                                  | BINLOG_THROUGH_GTID)
                    + struct.pack("<I", server_id)
                    + struct.pack("<I", len(name)) + name
                    + struct.pack("<Q", 4)
                    + struct.pack("<I", len(blob)) + blob)
        else:
            dump = (bytes([COM_BINLOG_DUMP]) + struct.pack("<I", 4)
                    + struct.pack("<H", BINLOG_DUMP_NON_BLOCK)
                    + struct.pack("<I", server_id)
                    + (from_file or "").encode("ascii"))
        send_packet(wfile, 0, dump)

        current: bytearray | None = None
        name: str | None = None

        def flush():
            nonlocal name
            if current is None:
                return
            if name is None:
                # a non-final file arrived without its FDE, so the
                # lazy checksum latch never resolved the name: fall
                # back to the ascii heuristic instead of silently
                # dropping the whole buffered file (ADVICE r8 — only
                # the LAST file got the post-loop fallback before)
                name = resolve_name()
            if name is None:
                if len(current) > len(_BINLOG_MAGIC):
                    raise ValueError(
                        "binlog stream buffered %d bytes with no file "
                        "name (no ROTATE name, no FDE) — refusing to "
                        "drop them" % len(current))
                return  # empty magic-only buffer: nothing to lose
            dest = os.path.join(spool_dir, name)
            tmp = os.path.join(os.path.dirname(dest),
                               "." + os.path.basename(dest)
                               + ".part")  # dot-prefixed: a
            # crash-leftover temp must stay INVISIBLE to the
            # Spark binaryFile source and table inference
            # (round-9 review: a truncated bare .part file
            # permanently failed every retry)
            with open(tmp, "wb") as out:
                out.write(bytes(current))
            os.replace(tmp, dest)
            written.append(name)

        # checksum state: None until the first FDE declares the
        # stream's algorithm (5.6.1+ FDEs always carry the alg byte
        # before their own 4-byte trailer). An artificial ROTATE's file
        # name must drop the CRC32 trailer (ADVICE r7) — and the dump's
        # FIRST rotate precedes the FDE, so its name resolves LAZILY
        # once the algorithm is known (ascii heuristic only in the
        # no-FDE-at-all corner).
        crc32: bool | None = None
        raw_name: bytes | None = None

        def resolve_name() -> str | None:
            if raw_name is None:
                return None
            raw = raw_name
            if crc32:
                raw = raw[:-4]
            elif crc32 is None:
                try:
                    raw.decode("ascii")
                except UnicodeDecodeError:
                    raw = raw[:-4]
            return raw.decode("ascii")

        while True:
            _, pkt = read_packet(rfile)
            if pkt[:1] == b"\xfe" and len(pkt) < 9:
                break
            if pkt[:1] == b"\xff":
                # ERR packet: u16 code [+ '#' + 5-byte sqlstate] + text —
                # surface the server's words (e.g. 1236 'Cannot
                # replicate because the source purged required binary
                # logs'), not a truncated byte repr
                err_code = struct.unpack_from("<H", pkt, 1)[0]
                text = (pkt[9:] if pkt[3:4] == b"#" else pkt[3:])
                raise ValueError("server error %d mid-stream: %s" % (
                    err_code, text.decode("utf-8", "replace")))
            if pkt[:1] != b"\x00":
                raise ValueError("unexpected packet prefix %r" % pkt[:1])
            ev = pkt[1:]
            ts, etype = struct.unpack_from("<IB", ev, 0)
            if etype == _ROTATE_EVENT and ts == 0:
                # synthetic rotate: next file begins. Its name resolves
                # at THAT file's FDE (which re-declares the checksum
                # algorithm and arrives right behind it), never under
                # the previous file's latch — a mid-stream
                # SET GLOBAL binlog_checksum change would otherwise
                # mis-strip the name or spuriously CRC-fail the rotate
                # itself, in either transition direction
                flush()
                raw_name = ev[27:]
                name = None
                current = bytearray(_BINLOG_MAGIC)
                continue
            if etype == _FORMAT_DESCRIPTION_EVENT:
                crc32 = len(ev) >= 24 and ev[-5] == _CHECKSUM_CRC32
                # keep an eagerly-resolved name (real-rotate path);
                # resolve_name() only answers for pending synthetic
                # rotates (raw_name set)
                name = resolve_name() or name
            if crc32 and len(ev) >= 23:
                # the announced-checksum contract cuts both ways:
                # verify every trailer so transport corruption fails
                # HERE with coordinates, not as a mis-decode downstream
                want = struct.unpack_from("<I", ev, len(ev) - 4)[0]
                if zlib.crc32(ev[:-4]) & 0xFFFFFFFF != want:
                    raise ValueError(
                        "binlog event CRC32 mismatch (type %d, file %s)"
                        % (etype, name))
            if etype == _ROTATE_EVENT:
                # REAL rotation (nonzero timestamp): a mysqld switching
                # files mid-stream sends the rotate WRITTEN IN the
                # current file (its last event, naming the next file) —
                # and no second synthetic one. Round-9 review: only the
                # ts==0 form split files before, so a real multi-file
                # dump concatenated file 2 under file 1's name (two
                # FDEs, restarting log_pos — silent offset corruption).
                # The rotate belongs to the CURRENT file's bytes; its
                # trailer was checksummed under the CURRENT latch
                # (known right now), so the NEXT file's name resolves
                # EAGERLY here — the lazy-at-FDE path exists only for
                # synthetic rotates that precede their file's FDE.
                if current is not None:
                    current += ev
                    flush()  # resolves a still-None name itself
                raw_name = ev[27:]
                name = resolve_name()
                raw_name = None
                current = bytearray(_BINLOG_MAGIC)
                continue
            if current is not None:
                current += ev
                if stop_at is not None and name == stop_at[0]:
                    end_log_pos = struct.unpack_from("<I", ev, 13)[0]
                    if end_log_pos >= stop_at[1]:
                        break  # bounded stop: blocking dumps end here
        # no-FDE corner: resolve a pending synthetic-rotate name before
        # flushing (an eagerly-resolved real-rotate name is kept)
        name = resolve_name() or name
        flush()
        try:
            send_packet(wfile, 0, bytes([COM_QUIT]))
        except OSError:  # pragma: no cover - server already gone
            pass
    return sorted(written, key=_file_sort_key)

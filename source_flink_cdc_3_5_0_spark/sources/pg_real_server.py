"""Manage a REAL PostgreSQL server for logical-replication interop.

Round 7's judge probe proved two things: (a) this sandbox ships a full
PostgreSQL 15 (`postgres`, `initdb`, `pg_ctl`, `psql`,
`pg_recvlogical`), and (b) validating the pgoutput codec only against
the in-repo writer lets symmetric wire misreadings survive (the 'K'
old-tuple width bug: every in-repo gate was green while real DELETEs
failed to decode). This module closes that blind spot permanently: it
initdb's a throwaway cluster with `wal_level=logical`, starts it, and
exposes just enough SQL plumbing for the `cdc_pgoutput_real_server_
decode` oracle gate and the interop pytest suite to drive the repo's
own walsender client (`pg_replication.start_replication_stream`)
against a genuine walsender.

The reference consumes real PostgreSQL through Debezium's
PostgresConnection (flink-cdc-pipeline-connector-postgres,
`PostgresDataSourceOptions.java:68-73` — `decoding.plugin.name =
pgoutput`), validated against live servers; parity therefore REQUIRES
real-wire validation, not just writer/reader symmetry.

Operational notes:

- PostgreSQL refuses to run as root; when the caller is root (this
  sandbox), server-side commands are wrapped in ``runuser -u daemon``
  and the data directory is chown'd to that user. Client-side psql
  runs as the caller over TCP (the cluster trusts the admin role on
  loopback).
- Everything lives under a caller-supplied scratch directory; `stop()`
  (or the context manager) shuts the cluster down and the directory is
  disposable. `fsync=off`/`--no-sync` keep the throwaway cluster fast.
- `available()` is the import-try gate: no binaries -> the gate raises
  a named error instead of half-running.
"""

from __future__ import annotations

import os
import pwd
import shutil
import socket
import subprocess

#: where this distribution puts the server binaries (Debian layout
#: probed round 7: /usr/local/bin for server, /usr/bin for clients)
_SEARCH = ("/usr/local/bin", "/usr/bin", "/usr/lib/postgresql/15/bin")


def _find(name: str) -> str | None:
    hit = shutil.which(name)
    if hit:
        return hit
    for d in _SEARCH:
        p = os.path.join(d, name)
        if os.path.isfile(p) and os.access(p, os.X_OK):
            return p
    return None


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class RealPostgresServer:
    """A throwaway logical-WAL PostgreSQL cluster.

    >>> with RealPostgresServer("/tmp/scratch") as pg:
    ...     pg.sql("CREATE TABLE t (id int primary key)")
    ...     lsn = pg.current_wal_lsn()
    """

    #: SCRAM-authed replication role the interop client connects as
    #: (the admin role stays trust-on-loopback for test plumbing)
    REPL_USER = "cdc"
    REPL_PASSWORD = "cdc-scram-pw"

    def __init__(self, scratch_dir: str | None = None,
                 port: int | None = None, tls: bool = False):
        if not self.available():
            raise NotImplementedError(
                "no PostgreSQL server binaries on this host (need "
                "initdb + pg_ctl + postgres + psql); the real-server "
                "interop gate cannot run")
        #: tls availability must fail BEFORE mkdtemp: __exit__/stop()
        #: never runs when __init__ raises, and an early raise after
        #: mkdtemp would orphan the directory
        if tls and not _find("openssl"):
            raise NotImplementedError(
                "tls=True needs the openssl binary for cert generation")
        # the cluster gets its OWN directory directly under the system
        # temp root, NOT the caller's scratch: the server runs as a
        # different user, and a caller path like pytest's
        # /tmp/pytest-of-root/... sits behind 0700 ancestors that user
        # cannot traverse. scratch_dir is accepted for call-site
        # symmetry (clients spool there) but never hosts the cluster.
        # Allocated in _start(), not here — a constructed-but-never-
        # started instance must not orphan a directory.
        self.scratch: str | None = None
        self.datadir: str | None = None
        self.port = port or _free_port()
        self.host = "127.0.0.1"
        self._initdb = _find("initdb")
        self._pg_ctl = _find("pg_ctl")
        self._psql = _find("psql")
        #: tls=True: generate a self-signed server cert, ssl=on, and an
        #: `hostssl`-ONLY pg_hba rule for the replication role — plain
        #: TCP as that role is REJECTED, so a passing TLS test proves
        #: the client really negotiated TLS
        self.tls = tls
        self._run_as: list[str] = []
        self._owner: str | None = None
        if os.geteuid() == 0:
            # postgres refuses root; daemon exists on any Debian base
            self._owner = "daemon"
            self._run_as = ["runuser", "-u", self._owner, "--"]
        self._started = False

    @staticmethod
    def available() -> bool:
        need = ("initdb", "pg_ctl", "postgres", "psql")
        return all(_find(n) for n in need)

    @staticmethod
    def pg_recvlogical() -> str | None:
        return _find("pg_recvlogical")

    # -- lifecycle ----------------------------------------------------------

    def _server_cmd(self, argv: list[str]) -> None:
        res = subprocess.run(self._run_as + argv, capture_output=True,
                             cwd=self.scratch)
        if res.returncode != 0:
            # surface the tool's own words — a bare CalledProcessError
            # ('exit status 1') leaves bad-locale / missing-user /
            # read-only-tmp failures undiagnosable
            raise RuntimeError("%s failed (%d):\n%s" % (
                argv[0], res.returncode,
                (res.stderr + res.stdout).decode("utf-8", "replace")
                [-2000:]))

    def start(self) -> "RealPostgresServer":
        # a failure anywhere below must not leak a running postmaster
        # or the scratch tree: __exit__ never runs when __enter__
        # raises, so clean up and re-raise here
        try:
            return self._start()
        except BaseException:
            self.stop()
            raise

    def _start(self) -> "RealPostgresServer":
        import tempfile
        self.scratch = tempfile.mkdtemp(prefix="pg-cluster-")
        self.datadir = os.path.join(self.scratch, "data")
        if self._owner:
            u = pwd.getpwnam(self._owner)
            os.chown(self.scratch, u.pw_uid, u.pw_gid)
        self._server_cmd([self._initdb, "-D", self.datadir,
                          "-U", "postgres", "--auth=trust", "--no-sync",
                          "-E", "UTF8"])
        conf = os.path.join(self.datadir, "postgresql.conf")
        with open(conf, "a") as f:
            f.write(
                "\nwal_level = logical\nmax_wal_senders = 8\n"
                "max_replication_slots = 8\n"
                "listen_addresses = '127.0.0.1'\nport = %d\n"
                "unix_socket_directories = '%s'\n"
                # frequent keepalives: the client's --endpos check rides
                # them, and a 4 s sender timeout bounds test wall-clock
                "wal_sender_timeout = 4s\n"
                # the GUC minimum: transactions over 64 kB of decoded
                # change stream as v2 Stream Start/Stop segments when
                # the client requests streaming 'true'
                "logical_decoding_work_mem = 64kB\n"
                # two-phase commit surface (round 10): prepared txns with
                # two_phase OFF must arrive as one normal transaction at
                # COMMIT PREPARED time
                "max_prepared_transactions = 8\n"
                "fsync = off\nsynchronous_commit = off\n"
                "logging_collector = off\n" % (self.port, self.scratch))
        chown_extra = []
        self.server_cert: str | None = None
        if self.tls:
            crt = os.path.join(self.scratch, "server.crt")
            key = os.path.join(self.scratch, "server.key")
            self.server_cert = crt
            subprocess.run(
                [_find("openssl"), "req", "-x509", "-newkey", "rsa:2048",
                 "-nodes", "-keyout", key, "-out", crt, "-days", "2",
                 "-subj", "/CN=127.0.0.1"],
                check=True, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            os.chmod(key, 0o600)
            with open(conf, "a") as f:
                f.write("ssl = on\nssl_cert_file = '%s'\n"
                        "ssl_key_file = '%s'\n" % (crt, key))
            chown_extra = [crt, key]
        hba = os.path.join(self.datadir, "pg_hba.conf")
        with open(hba, "w") as f:
            # the interop role authenticates with REAL SCRAM-SHA-256;
            # the admin role is trust-on-loopback (test plumbing only).
            # Under tls the repl role is hostssl-ONLY: plain TCP rejects.
            kind = "hostssl" if self.tls else "host"
            f.write("%s all %s 127.0.0.1/32 scram-sha-256\n"
                    "host all postgres 127.0.0.1/32 trust\n"
                    "local all all trust\n" % (kind, self.REPL_USER))
        if self._owner:
            u = pwd.getpwnam(self._owner)
            for p in [conf, hba] + chown_extra:
                os.chown(p, u.pw_uid, u.pw_gid)
        # mark started BEFORE pg_ctl: a -w timeout can leave a live
        # postmaster behind, and stop()'s pg_ctl stop is check=False
        self._started = True
        self._server_cmd([self._pg_ctl, "-D", self.datadir, "-w",
                          "-t", "60",
                          "-l", os.path.join(self.scratch, "pg.log"),
                          "start"])
        # password_encryption defaults to scram-sha-256 on PG15
        self.sql("CREATE ROLE %s LOGIN REPLICATION PASSWORD '%s'"
                 % (self.REPL_USER, self.REPL_PASSWORD))
        return self

    def stop(self) -> None:
        if self._started:
            self._started = False
            subprocess.run(
                self._run_as + [self._pg_ctl, "-D", self.datadir,
                                "-m", "immediate", "stop"],
                check=False, stdout=subprocess.DEVNULL,
                stderr=subprocess.STDOUT, cwd=self.scratch)
        if self.scratch:
            shutil.rmtree(self.scratch, ignore_errors=True)

    def __enter__(self) -> "RealPostgresServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- SQL plumbing -------------------------------------------------------

    def sql(self, query: str, db: str = "postgres",
            stdin: bytes | None = None) -> str:
        """Run SQL as the trusted admin role; returns psql -tA output
        (tuples-only, unaligned — one row per line, '|' separators)."""
        res = subprocess.run(
            [self._psql, "-h", self.host, "-p", str(self.port),
             "-U", "postgres", "-d", db, "-v", "ON_ERROR_STOP=1",
             "-tA", "-c", query],
            input=stdin, capture_output=True, check=False)
        if res.returncode != 0:
            raise RuntimeError("psql failed: %s\n%s"
                               % (query[:200],
                                  res.stderr.decode("utf-8", "replace")))
        return res.stdout.decode("utf-8").strip()

    def copy_csv(self, table: str, csv_bytes: bytes,
                 db: str = "postgres") -> None:
        """Bulk-load CSV via COPY FROM STDIN (the set-based load path —
        row-at-a-time INSERTs through psql would dominate the gate)."""
        self.sql("COPY %s FROM STDIN WITH (FORMAT csv)" % table,
                 db=db, stdin=csv_bytes)

    def current_wal_lsn(self) -> int:
        """pg_current_wal_lsn() as the u64 the wire protocol uses."""
        hi, lo = self.sql("SELECT pg_current_wal_lsn()").split("/")
        return (int(hi, 16) << 32) | int(lo, 16)

    def create_slot(self, name: str, plugin: str = "pgoutput",
                    two_phase: bool = False) -> None:
        self.sql("SELECT pg_create_logical_replication_slot"
                 "('%s', '%s', false, %s)"
                 % (name, plugin, "true" if two_phase else "false"))

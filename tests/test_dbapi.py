"""PEP 249 DBAPI driver over the thrift frontend
(kyuubi_spark/client/dbapi.py — the Python-first counterpart of the
reference's kyuubi-hive-jdbc KyuubiConnection/Statement/ResultSet)."""

from __future__ import annotations

import datetime

import pytest

import kyuubi_spark.client.dbapi as db
from kyuubi_spark.gateway import Engine
from kyuubi_spark.gateway.thrift import ThriftFrontendService


@pytest.fixture(scope="module")
def server(spark):
    svc = ThriftFrontendService(Engine(spark=spark)).start()
    yield svc
    svc.stop()


@pytest.fixture()
def conn(server):
    c = db.connect(server.host, server.port, user="dbapi_tester")
    yield c
    c.close()


def test_module_globals():
    assert db.apilevel == "2.0"
    assert db.threadsafety == 1
    assert db.paramstyle == "pyformat"
    assert issubclass(db.ProgrammingError, db.DatabaseError)
    assert issubclass(db.DatabaseError, db.Error)


def test_basic_roundtrip(conn):
    cur = conn.cursor()
    cur.execute("SELECT 6 * 7 AS v, 'x' AS s")
    assert [d[0] for d in cur.description] == ["v", "s"]
    assert cur.description[1][1] == db.STRING
    assert cur.description[0][1] == db.NUMBER
    assert cur.fetchall() == [(42, "x")]
    assert cur.fetchall() == []  # drained


def test_fetch_granularity_and_iteration(conn):
    cur = conn.cursor()
    cur.execute("SELECT id FROM range(10) ORDER BY id")
    assert cur.fetchone() == (0,)
    assert cur.fetchmany(3) == [(1,), (2,), (3,)]
    cur.arraysize = 2
    assert cur.fetchmany() == [(4,), (5,)]
    assert list(cur) == [(6,), (7,), (8,), (9,)]
    assert cur.fetchone() is None


def test_parameter_binding_positional_and_named(conn):
    cur = conn.cursor()
    cur.execute("SELECT %s + 1 AS n, %s AS s", (41, "it's"))
    assert cur.fetchall() == [(42, "it's")]
    cur.execute("SELECT %(a)s * %(b)s AS p", {"a": 6, "b": 7})
    assert cur.fetchall() == [(42,)]
    # quote escaping: a malicious value stays a value
    cur.execute("SELECT %s AS s", ("x' OR '1'='1",))
    assert cur.fetchall() == [("x' OR '1'='1",)]
    # typed literals
    cur.execute(
        "SELECT %s AS d, %s AS b, %s AS nul",
        (datetime.date(2024, 2, 29), True, None),
    )
    # DATE literals come back as their string form over the HS2 wire
    assert cur.fetchall() == [("2024-02-29", True, None)]


def test_executemany_and_ddl(conn):
    cur = conn.cursor()
    cur.execute("CREATE OR REPLACE TEMPORARY VIEW dbapi_v AS SELECT 1 AS a")
    assert cur.description is None  # DDL: no result set
    with pytest.raises(db.ProgrammingError):
        cur.fetchall()
    cur.execute("SELECT a FROM dbapi_v")
    assert cur.fetchall() == [(1,)]


def test_errors_and_lifecycle(conn):
    cur = conn.cursor()
    with pytest.raises(db.ProgrammingError):
        cur.execute("SELECT * FROM definitely_missing_table_xyz")
    # the cursor stays usable after a failed statement
    cur.execute("SELECT 1 AS ok")
    assert cur.fetchall() == [(1,)]
    cur.close()
    with pytest.raises(db.InterfaceError):
        cur.execute("SELECT 1")


def test_commit_noop_rollback_unsupported(conn):
    conn.commit()  # autocommit engine: no-op
    with pytest.raises(db.NotSupportedError):
        conn.rollback()


def test_context_managers(server):
    with db.connect(server.host, server.port, user="ctx") as c:
        with c.cursor() as cur:
            cur.execute("SELECT 2 + 2 AS v")
            assert cur.fetchone() == (4,)
    with pytest.raises(db.InterfaceError):
        c.cursor()


def test_connect_failure_raises_operational():
    with pytest.raises(db.OperationalError):
        db.connect("127.0.0.1", 1, user="nope")


def test_dbapi_over_tls_with_sasl(spark, tmp_path):
    """The driver composes with the TLS + SASL planes: cafile + password
    connect to a secured frontend."""
    from kyuubi_spark.gateway.auth import AuthenticationError
    from kyuubi_spark.gateway.tls import (
        SSL_ENABLED_KEY,
        SSL_KEY_PATH_KEY,
        SSL_KEYSTORE_PATH_KEY,
        generate_self_signed_cert,
        server_ssl_context,
    )

    cert, key = generate_self_signed_cert(str(tmp_path))
    ctx = server_ssl_context({
        SSL_ENABLED_KEY: "true",
        SSL_KEYSTORE_PATH_KEY: cert,
        SSL_KEY_PATH_KEY: key,
    })

    class OneUser:
        def authenticate(self, user, password):
            if (user, password) != ("alice", "pw"):
                raise AuthenticationError("bad credentials")

    svc = ThriftFrontendService(
        Engine(spark=spark), auth=OneUser(), ssl_context=ctx
    ).start()
    try:
        with db.connect(
            svc.host, svc.port, user="alice", password="pw", cafile=cert
        ) as c:
            cur = c.cursor()
            cur.execute("SELECT 'secure' AS s")
            assert cur.fetchall() == [("secure",)]
        with pytest.raises(db.OperationalError):
            db.connect(svc.host, svc.port, user="alice", password="wrong",
                       cafile=cert)
    finally:
        svc.stop()

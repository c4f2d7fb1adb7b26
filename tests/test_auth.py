"""Authentication plane: provider factory + SASL/PLAIN + HTTP Basic.

Mirrors the reference's AuthenticationProviderFactorySuite /
PlainSASLHelperSuite semantics: NONE accepts any non-empty user, JDBC
authenticates against a bound-parameter credential query, CUSTOM loads a
user class, LDAP simple-binds over the wire (tests/test_ldap.py); on the binary
transport runs the TSaslTransport PLAIN handshake + length-framed data,
and the HTTP transport enforces Basic credentials. The SASL/Basic
principal overrides the username claimed inside OpenSession.
"""

from __future__ import annotations

import sqlite3

import pytest

from kyuubi_spark.gateway.auth import (
    AnonymousAuthenticationProvider,
    AuthenticationError,
    JdbcAuthenticationProvider,
    get_authentication_provider,
    parse_plain_response,
    plain_response,
)
from kyuubi_spark.gateway.thrift import (
    ThriftClient,
    ThriftFrontendService,
    ThriftHttpClient,
)


class StaticProvider:
    """Custom-provider test double (kyuubi.authentication.custom.class)."""

    CREDS = {"alice": "wonder", "bob": "builder"}

    def authenticate(self, user: str, password: str) -> None:
        if self.CREDS.get(user) != password:
            raise AuthenticationError(f"bad credentials for {user}")


# -- providers ----------------------------------------------------------------


def test_anonymous_provider_accepts_any_user():
    p = AnonymousAuthenticationProvider()
    p.authenticate("anyone", "")
    with pytest.raises(AuthenticationError):
        p.authenticate("", "x")


def test_jdbc_provider_binds_parameters(tmp_path):
    db = tmp_path / "auth.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE users(name TEXT, passwd TEXT)")
    conn.execute("INSERT INTO users VALUES ('carol', 's3cret')")
    conn.execute("INSERT INTO users VALUES ('o''brien', \"it's\")")
    conn.commit()
    conn.close()
    p = JdbcAuthenticationProvider(
        lambda: sqlite3.connect(db),
        "SELECT 1 FROM users WHERE name=${user} AND passwd=${password}",
    )
    p.authenticate("carol", "s3cret")
    # quote-bearing credentials bind safely (no SQL interpolation)
    p.authenticate("o'brien", "it's")
    with pytest.raises(AuthenticationError):
        p.authenticate("carol", "wrong")
    with pytest.raises(AuthenticationError):
        # classic injection attempt must read as a literal, not SQL
        p.authenticate("carol", "' OR '1'='1")


def test_provider_factory_methods(tmp_path):
    assert isinstance(
        get_authentication_provider("NONE"), AnonymousAuthenticationProvider
    )
    db = tmp_path / "auth.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE u(n TEXT, p TEXT)")
    conn.execute("INSERT INTO u VALUES ('dave', 'pw')")
    conn.commit()
    conn.close()
    jdbc = get_authentication_provider(
        "JDBC",
        {
            "kyuubi.authentication.jdbc.url": f"jdbc:sqlite:{db}",
            "kyuubi.authentication.jdbc.query": (
                "SELECT 1 FROM u WHERE n=${user} AND p=${password}"
            ),
        },
    )
    jdbc.authenticate("dave", "pw")
    custom = get_authentication_provider(
        "CUSTOM",
        {"kyuubi.authentication.custom.class": f"{__name__}:StaticProvider"},
    )
    custom.authenticate("alice", "wonder")
    with pytest.raises(AuthenticationError):
        custom.authenticate("alice", "nope")
    with pytest.raises(ValueError):
        get_authentication_provider("LDAP")  # needs .url conf
    with pytest.raises(ValueError):
        get_authentication_provider("KERBEROS")


def test_plain_message_codec():
    authz, user, pw = parse_plain_response(plain_response("eve", "pw", "adm"))
    assert (authz, user, pw) == ("adm", "eve", "pw")
    # authzid defaults to the user when absent
    assert parse_plain_response(b"u\x00p") == ("u", "u", "p")
    for bad in (b"", b"user-only", b"\x00u\x00", b"a\x00b\x00c\x00d"):
        with pytest.raises(AuthenticationError):
            parse_plain_response(bad)


# -- SASL/PLAIN over the binary wire -----------------------------------------


@pytest.fixture(scope="module")
def sasl_server(spark):
    from kyuubi_spark.gateway import Engine

    svc = ThriftFrontendService(
        Engine(spark=spark), auth=StaticProvider()
    ).start()
    yield svc
    svc.stop()


def test_sasl_round_trip_and_principal_override(sasl_server):
    c = ThriftClient(
        sasl_server.host, sasl_server.port, user="alice", password="wonder"
    )
    try:
        # the request claims a different user; the SASL principal wins
        c.open_session(user="mallory")
        op = c.execute("SELECT session_user() AS u, 6 * 7 AS v")
        assert [r for r in c.fetch(op, 10)] == [["alice", 42]]
        c.close_session()
    finally:
        c.close()


def test_sasl_rejects_bad_password(sasl_server):
    with pytest.raises(AuthenticationError):
        ThriftClient(
            sasl_server.host, sasl_server.port, user="alice", password="xxx"
        )


def test_nosasl_client_cannot_reach_sasl_server(sasl_server):
    # an unauthenticated (NOSASL) client never completes an RPC: the
    # server reads its bytes as a failed handshake, answers BAD, and
    # drops the socket — the client sees garbage or a dead connection,
    # never an open session (timeout guards the blocking read)
    c = ThriftClient(sasl_server.host, sasl_server.port)
    c.sock.settimeout(10)
    with pytest.raises(Exception):
        c.open_session(user="mallory")
    c.close()


# -- HTTP Basic ---------------------------------------------------------------


@pytest.fixture(scope="module")
def http_auth_server(spark):
    from kyuubi_spark.gateway import Engine

    svc = ThriftFrontendService(
        Engine(spark=spark), transport="http", auth=StaticProvider()
    ).start()
    yield svc
    svc.stop()


def test_http_basic_round_trip(http_auth_server):
    c = ThriftHttpClient(
        http_auth_server.host,
        http_auth_server.port,
        user="bob",
        password="builder",
    )
    c.open_session(user="mallory")  # Basic principal overrides
    op = c.execute("SELECT session_user() AS u")
    assert [r for r in c.fetch(op, 10)] == [["bob"]]
    c.close_session()


def test_http_basic_rejects(http_auth_server):
    import urllib.error

    c = ThriftHttpClient(http_auth_server.host, http_auth_server.port)
    with pytest.raises(urllib.error.HTTPError) as ei:
        c.open_session(user="anyone")
    assert ei.value.code == 401
    c2 = ThriftHttpClient(
        http_auth_server.host, http_auth_server.port, user="bob", password="x"
    )
    with pytest.raises(urllib.error.HTTPError) as ei2:
        c2.open_session(user="bob")
    assert ei2.value.code == 401


def test_server_assembly_authenticated_thrift(spark):
    """KyuubiServer with kyuubi.authentication=CUSTOM: both thrift
    transports enforce the provider end-to-end."""
    from kyuubi_spark.gateway.server_main import KyuubiServer

    srv = KyuubiServer(
        spark=spark,
        conf={
            "kyuubi.authentication": "CUSTOM",
            "kyuubi.authentication.custom.class": (
                f"{__name__}:StaticProvider"
            ),
        },
    ).start()
    try:
        host, port = srv.endpoints()["thrift_binary"]
        c = ThriftClient(host, port, user="alice", password="wonder")
        c.open_session(user="whoever")
        op = c.execute("SELECT session_user() AS u")
        assert [r for r in c.fetch(op, 10)] == [["alice"]]
        c.close_session()
        c.close()
        with pytest.raises(AuthenticationError):
            ThriftClient(host, port, user="alice", password="bad")
        hh, hp = srv.endpoints()["thrift_http"]
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            ThriftHttpClient(hh, hp).open_session(user="x")
    finally:
        srv.stop()


def test_beeline_sasl_one_shot(sasl_server, capsys):
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from tools import beeline

    rc = beeline.main([
        "-u", f"{sasl_server.host}:{sasl_server.port}",
        "-n", "alice", "-p", "wonder",
        "-e", "SELECT session_user() AS u",
        "--outputformat", "csv",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "u\nalice" in out


def test_negotiation_rejects_oversized_payload():
    import io

    import kyuubi_spark.gateway.auth as a

    big = bytes([a.START]) + (2**30).to_bytes(4, "big")
    with pytest.raises(AuthenticationError):
        a.read_sasl_message(io.BytesIO(big + b"x"))


def test_rest_and_trino_basic_auth(spark):
    """All four frontends enforce one provider: REST and Trino return 401
    without Basic credentials and honor the authenticated principal."""
    import base64
    import json
    import urllib.error
    import urllib.request

    from kyuubi_spark.gateway.server_main import KyuubiServer

    srv = KyuubiServer(
        spark=spark,
        conf={
            "kyuubi.authentication": "CUSTOM",
            "kyuubi.authentication.custom.class": (
                f"{__name__}:StaticProvider"
            ),
        },
    ).start()
    try:
        rh, rp = srv.endpoints()["rest"]
        url = f"http://{rh}:{rp}/api/v1/sessions"
        body = json.dumps({"user": "mallory"}).encode()
        req = urllib.request.Request(
            url, data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 401
        blob = base64.b64encode(b"alice:wonder").decode()
        req = urllib.request.Request(
            url, data=body, method="POST",
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Basic {blob}",
            },
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["user"] == "alice"  # principal overrides the body user

        th, tp = srv.endpoints()["trino"]
        turl = f"http://{th}:{tp}/v1/statement"
        treq = urllib.request.Request(
            turl, data=b"SELECT 1 AS one", method="POST",
            headers={"X-Trino-User": "mallory"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei2:
            urllib.request.urlopen(treq)
        assert ei2.value.code == 401
        treq = urllib.request.Request(
            turl, data=b"SELECT session_user() AS u", method="POST",
            headers={
                "X-Trino-User": "mallory",
                "Authorization": f"Basic {blob}",
            },
        )
        with urllib.request.urlopen(treq) as resp:
            page = json.loads(resp.read())
        # drain nextUri pages until data arrives
        data = page.get("data") or []
        while "nextUri" in page and not data:
            with urllib.request.urlopen(
                urllib.request.Request(
                    page["nextUri"],
                    headers={"Authorization": f"Basic {blob}"},
                )
            ) as resp:
                page = json.loads(resp.read())
                data = data or page.get("data") or []
        assert data == [["alice"]]
    finally:
        srv.stop()


def test_ctl_cli_with_basic_auth(spark, capsys):
    """tools/ctl.py --user/--password drives an authenticated REST server."""
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from kyuubi_spark.gateway.server_main import KyuubiServer
    from tools import ctl

    srv = KyuubiServer(
        spark=spark,
        conf={
            "kyuubi.authentication": "CUSTOM",
            "kyuubi.authentication.custom.class": (
                f"{__name__}:StaticProvider"
            ),
        },
    ).start()
    try:
        rh, rp = srv.endpoints()["rest"]
        ctl.main([
            "--url", f"http://{rh}:{rp}",
            "--user", "bob", "--password", "builder",
            "list", "sessions",
        ])
        capsys.readouterr()  # drains; no exit means 200
        with pytest.raises(SystemExit):
            ctl.main([
                "--url", f"http://{rh}:{rp}",
                "--user", "bob", "--password", "wrong",
                "list", "sessions",
            ])
    finally:
        ctl._BASIC = None
        srv.stop()


def test_server_accepts_java_style_complete_initial_response():
    """Java Thrift's TSaslClientTransport sends the PLAIN initial
    response with status COMPLETE, not OK — the server must accept both."""
    import io

    import kyuubi_spark.gateway.auth as a

    for status in (a.OK, a.COMPLETE):
        rfile = io.BytesIO(
            a.sasl_message(a.START, a.PLAIN)
            + a.sasl_message(status, a.plain_response("alice", "wonder"))
        )
        wfile = io.BytesIO()
        user = a.server_negotiate(rfile, wfile, StaticProvider())
        assert user == "alice"
        st, _ = a.read_sasl_message(io.BytesIO(wfile.getvalue()))
        assert st == a.COMPLETE


def test_jdbc_provider_works_with_none_returning_execute(tmp_path):
    """DBAPI leaves execute()'s return undefined — a driver whose cursor
    returns None (psycopg2/pymysql style) must still authenticate."""
    import sqlite3 as s3

    db = tmp_path / "auth.db"
    conn = s3.connect(db)
    conn.execute("CREATE TABLE u(n TEXT, p TEXT)")
    conn.execute("INSERT INTO u VALUES ('erin', 'pw')")
    conn.commit()
    conn.close()

    class NoneCursor:
        def __init__(self, cur):
            self._cur = cur

        def execute(self, sql, params):
            self._cur.execute(sql, params)
            return None  # the DBAPI-legal behavior sqlite3 doesn't show

        def fetchall(self):
            return self._cur.fetchall()

        def close(self):
            self._cur.close()

    class Conn:
        def __init__(self, path):
            self._c = s3.connect(path)

        def cursor(self):
            return NoneCursor(self._c.cursor())

        def close(self):
            self._c.close()

    p = JdbcAuthenticationProvider(
        lambda: Conn(db), "SELECT 1 FROM u WHERE n=${user} AND p=${password}"
    )
    p.authenticate("erin", "pw")
    with pytest.raises(AuthenticationError):
        p.authenticate("erin", "bad")


def test_basic_success_cache_skips_reauth_but_never_caches_failures():
    import kyuubi_spark.gateway.auth as a

    calls = []

    class Counting:
        def authenticate(self, user, password):
            calls.append(user)
            if password != "ok":
                raise AuthenticationError("no")

    import base64

    prov = Counting()
    good = "Basic " + base64.b64encode(b"u:ok").decode()
    bad = "Basic " + base64.b64encode(b"u:bad").decode()
    assert a.check_basic(good, prov) == "u"
    assert a.check_basic(good, prov) == "u"  # cached — no second call
    assert calls == ["u"]
    with pytest.raises(AuthenticationError):
        a.check_basic(bad, prov)
    with pytest.raises(AuthenticationError):
        a.check_basic(bad, prov)  # failures re-validate every time
    assert calls == ["u", "u", "u"]


def test_rest_batch_records_authenticated_principal(spark):
    import base64
    import json as _json
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.rest import RestGateway

    gw = RestGateway(Engine(spark=spark), auth=StaticProvider()).start()
    try:
        blob = base64.b64encode(b"alice:wonder").decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{gw.port}/api/v1/batches",
            data=_json.dumps(
                {"script": "print('hi')", "user": "mallory"}
            ).encode(),
            method="POST",
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Basic {blob}",
            },
        )
        with urllib.request.urlopen(req) as resp:
            out = _json.loads(resp.read())
        job = gw.batches[out["id"]]
        assert job.user == "alice"  # principal outranks the body's user
    finally:
        gw.shutdown()

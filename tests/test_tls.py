"""TLS across all four frontends + LDAPS client.

The reference treats SSL as first-class server conf
(kyuubi.frontend.thrift.binary.ssl.enabled + kyuubi.frontend.ssl.keystore.*,
KyuubiConf.scala:553-612; kyuubi.frontend.thrift.http.use.SSL:945-990) —
here stdlib ``ssl`` contexts from gateway/tls.py.  Each test proves
identical results over TLS with a test-generated self-signed cert, and
that the credential-bearing handshakes (SASL/PLAIN, HTTP Basic, LDAP
simple bind) ride INSIDE the encrypted channel.
"""

from __future__ import annotations

import json
import ssl
import threading
import urllib.request

import pytest

from kyuubi_spark.gateway.tls import (
    SSL_ENABLED_KEY,
    SSL_KEY_PATH_KEY,
    SSL_KEYSTORE_PATH_KEY,
    client_ssl_context,
    generate_self_signed_cert,
    server_ssl_context,
    ssl_enabled,
)


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    cert, key = generate_self_signed_cert(str(d))
    return cert, key


@pytest.fixture(scope="module")
def server_ctx(certs):
    cert, key = certs
    return server_ssl_context({
        SSL_ENABLED_KEY: "true",
        SSL_KEYSTORE_PATH_KEY: cert,
        SSL_KEY_PATH_KEY: key,
    })


def _client_ctx(certs):
    return client_ssl_context(cafile=certs[0])


# -- conf plumbing ------------------------------------------------------------


def test_ssl_conf_gates(certs):
    cert, key = certs
    assert server_ssl_context(None) is None
    assert server_ssl_context({SSL_ENABLED_KEY: "false"}) is None
    # enabled without a keystore fails server start, like the reference
    with pytest.raises(ValueError, match="keystore"):
        server_ssl_context({SSL_ENABLED_KEY: "true"})
    # either enable key turns the shared plane on
    assert ssl_enabled({"kyuubi.frontend.thrift.http.use.SSL": "true"})
    ctx = server_ssl_context({
        SSL_ENABLED_KEY: "true",
        SSL_KEYSTORE_PATH_KEY: cert,
        SSL_KEY_PATH_KEY: key,
        "kyuubi.frontend.thrift.binary.ssl.disallowed.protocols":
            "SSLv2,SSLv3,TLSv1,TLSv1.1",
    })
    assert ctx.minimum_version == ssl.TLSVersion.TLSv1_2


# -- thrift binary ------------------------------------------------------------


def test_thrift_binary_over_tls(spark, certs, server_ctx):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

    svc = ThriftFrontendService(
        Engine(spark=spark), ssl_context=server_ctx
    ).start()
    try:
        c = ThriftClient(svc.host, svc.port, cafile=certs[0])
        c.open_session(user="tls_user")
        op = c.execute("SELECT 6 * 7 AS v, 'tls' AS t")
        assert c.fetch(op, 10) == [[42, "tls"]]
        assert [s[0] for s in c.result_schema(op)] == ["v", "t"]
        c.close_session()
        c.close()
        # a plaintext client against the TLS port fails the handshake
        # instead of silently talking in clear
        with pytest.raises((ConnectionError, OSError, EOFError)):
            plain = ThriftClient(svc.host, svc.port)
            plain.open_session(user="nope")
    finally:
        svc.stop()


def test_thrift_binary_tls_plus_sasl(spark, certs, server_ctx):
    """SASL/PLAIN credentials ride inside the TLS channel — the layering
    the reference uses for ssl.enabled + kyuubi.authentication."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.auth import AuthenticationError
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

    class OneUser:
        def authenticate(self, user, password):
            if (user, password) != ("alice", "wonder"):
                raise AuthenticationError("bad credentials")

    svc = ThriftFrontendService(
        Engine(spark=spark), auth=OneUser(), ssl_context=server_ctx
    ).start()
    try:
        c = ThriftClient(
            svc.host, svc.port, user="alice", password="wonder",
            cafile=certs[0],
        )
        c.open_session(user="ignored-by-sasl-principal")
        op = c.execute("SELECT 1 AS one")
        assert c.fetch(op, 5) == [[1]]
        c.close_session()
        c.close()
        with pytest.raises(Exception):
            bad = ThriftClient(
                svc.host, svc.port, user="alice", password="nope",
                cafile=certs[0],
            )
            bad.open_session(user="x")
    finally:
        svc.stop()


def test_client_rejects_untrusted_cert(spark, server_ctx):
    """Without the CA the client refuses the self-signed server — TLS is
    actually verifying, not just encrypting."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

    svc = ThriftFrontendService(
        Engine(spark=spark), ssl_context=server_ctx
    ).start()
    try:
        with pytest.raises(ssl.SSLError):
            ThriftClient(svc.host, svc.port, ssl_context=client_ssl_context())
    finally:
        svc.stop()


# -- thrift HTTP --------------------------------------------------------------


def test_thrift_http_over_tls(spark, certs, server_ctx):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import (
        ThriftFrontendService,
        ThriftHttpClient,
    )

    svc = ThriftFrontendService(
        Engine(spark=spark), transport="http", ssl_context=server_ctx
    ).start()
    try:
        c = ThriftHttpClient(svc.host, svc.port, cafile=certs[0])
        assert c.url.startswith("https://")
        c.open_session(user="https_user")
        op = c.execute("SELECT 10 * 9 AS v")
        assert c.fetch(op, 10) == [[90]]
        c.close_session()
    finally:
        svc.stop()


# -- REST ---------------------------------------------------------------------


def test_rest_over_tls(spark, certs, server_ctx):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.rest import RestGateway

    svc = RestGateway(Engine(spark=spark), ssl_context=server_ctx).start()
    try:
        ctx = _client_ctx(certs)
        req = urllib.request.Request(
            f"https://{svc.httpd.server_address[0]}:{svc.port}/api/v1/sessions",
            data=json.dumps({"user": "rest_tls"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, context=ctx) as r:
            sid = json.loads(r.read())["identifier"]
        assert sid
        urllib.request.urlopen(
            urllib.request.Request(
                f"https://127.0.0.1:{svc.port}/api/v1/sessions/{sid}",
                method="DELETE",
            ),
            context=ctx,
        )
    finally:
        svc.shutdown()


# -- Trino --------------------------------------------------------------------


def test_trino_over_tls_with_https_next_uri(spark, certs, server_ctx):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.trino import TrinoGateway

    svc = TrinoGateway(
        Engine(spark=spark), page_size=4, ssl_context=server_ctx
    ).start()
    try:
        ctx = _client_ctx(certs)
        req = urllib.request.Request(
            f"https://{svc.host}:{svc.port}/v1/statement",
            data=b"SELECT id FROM range(11) ORDER BY id",
            headers={"X-Trino-User": "trino_tls"},
            method="POST",
        )
        with urllib.request.urlopen(req, context=ctx) as r:
            page = json.loads(r.read())
        rows = list(page.get("data") or [])
        # nextUri pages advertise https and stay on the TLS listener
        while page.get("nextUri"):
            assert page["nextUri"].startswith("https://")
            with urllib.request.urlopen(page["nextUri"], context=ctx) as r:
                page = json.loads(r.read())
            rows.extend(page.get("data") or [])
        assert [r[0] for r in rows] == list(range(11))
    finally:
        svc.stop()


# -- full server assembly -----------------------------------------------------


def test_kyuubi_server_all_frontends_tls(spark, certs):
    """KyuubiServer with the reference's conf keys brings up ALL FOUR
    frontends on TLS from one shared context."""
    from kyuubi_spark.gateway.server_main import KyuubiServer
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftHttpClient

    cert, key = certs
    server = KyuubiServer(
        spark,
        conf={
            SSL_ENABLED_KEY: "true",
            SSL_KEYSTORE_PATH_KEY: cert,
            SSL_KEY_PATH_KEY: key,
        },
    ).start()
    try:
        eps = server.endpoints()
        c = ThriftClient(*eps["thrift_binary"], cafile=cert)
        c.open_session(user="tls_bin")
        assert c.fetch(c.execute("SELECT 1 AS a"), 5) == [[1]]
        c.close_session(); c.close()

        h = ThriftHttpClient(*eps["thrift_http"], cafile=cert)
        h.open_session(user="tls_http")
        assert h.fetch(h.execute("SELECT 2 AS b"), 5) == [[2]]
        h.close_session()

        ctx = client_ssl_context(cafile=cert)
        with urllib.request.urlopen(
            f"https://127.0.0.1:{eps['rest'][1]}/api/v1/sessions", context=ctx
        ) as r:
            assert r.status == 200

        req = urllib.request.Request(
            f"https://127.0.0.1:{eps['trino'][1]}/v1/statement",
            data=b"SELECT 3 AS c",
            headers={"X-Trino-User": "tls_trino"},
            method="POST",
        )
        with urllib.request.urlopen(req, context=ctx) as r:
            assert json.loads(r.read())["data"] == [[3]]
    finally:
        server.stop()


# -- LDAPS --------------------------------------------------------------------


def test_ldaps_simple_bind(certs):
    """ldaps:// runs the RFC 4511 simple bind inside TLS against the
    in-test stub directory (gateway/ldap.py — the ValueError rejection is
    gone; cafile is the PEM analog of the JVM truststore)."""
    import socketserver

    from kyuubi_spark.gateway.auth import (
        AuthenticationError,
        get_authentication_provider,
    )
    from tests.test_ldap import _ToyLdapHandler

    cert, key = certs
    srv_ctx = server_ssl_context({
        SSL_ENABLED_KEY: "true",
        SSL_KEYSTORE_PATH_KEY: cert,
        SSL_KEY_PATH_KEY: key,
    })

    class TlsHandler(_ToyLdapHandler):
        def setup(self):
            self.request = srv_ctx.wrap_socket(self.request, server_side=True)

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), TlsHandler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    try:
        p = get_authentication_provider(
            "LDAP",
            {
                "kyuubi.authentication.ldap.url": f"ldaps://{host}:{port}",
                "kyuubi.authentication.ldap.baseDN":
                    "ou=users,dc=example,dc=com",
                "kyuubi.authentication.ldap.ssl.cafile": cert,
            },
        )
        p.authenticate("alice", "wonder")
        with pytest.raises(AuthenticationError):
            p.authenticate("alice", "nope")
        # without the CA, the bind fails at the handshake (as
        # AuthenticationError, not a success)
        p_noca = get_authentication_provider(
            "LDAP",
            {
                "kyuubi.authentication.ldap.url": f"ldaps://{host}:{port}",
                "kyuubi.authentication.ldap.baseDN":
                    "ou=users,dc=example,dc=com",
            },
        )
        with pytest.raises(AuthenticationError):
            p_noca.authenticate("alice", "wonder")
    finally:
        srv.shutdown()
        srv.server_close()


# -- beeline ------------------------------------------------------------------


def test_beeline_ssl_flag(spark, certs, server_ctx, capsys):
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from tools import beeline

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    svc = ThriftFrontendService(
        Engine(spark=spark), ssl_context=server_ctx
    ).start()
    try:
        rc = beeline.main([
            "-u", f"{svc.host}:{svc.port}",
            "-e", "SELECT 7 AS seven",
            "--outputformat", "csv",
            "--ssl-ca", certs[0],
        ])
        assert rc == 0
        assert "7" in capsys.readouterr().out
    finally:
        svc.stop()


# -- engine-side clients over TLS ---------------------------------------------


def test_remote_thrift_session_over_tls(spark, certs, server_ctx):
    """A THRIFT-type session reaches a TLS engine frontend via
    kyuubi.engine.thrift.ssl.enabled/.cafile — the gateway→engine hop is
    encrypted end-to-end, matching the server-side conf plane."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.engine import Engine as GwEngine
    from kyuubi_spark.gateway.state import FetchOrientation
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    svc = ThriftFrontendService(
        Engine(spark=spark), ssl_context=server_ctx
    ).start()
    try:
        gw = GwEngine(spark)
        s = gw.open_session(
            user="tls_remote",
            conf={
                "kyuubi.engine.type": "THRIFT",
                "kyuubi.engine.thrift.host": svc.host,
                "kyuubi.engine.thrift.port": str(svc.port),
                "kyuubi.engine.thrift.ssl.enabled": "true",
                "kyuubi.engine.thrift.ssl.cafile": certs[0],
            },
        )
        op = s.execute_statement("SELECT 'tls-hop' AS msg")
        rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
        assert rows == [["tls-hop"]]
        gw.close_session(s.handle)
    finally:
        svc.stop()


def test_trino_engine_session_over_https(spark, certs, server_ctx):
    """A TRINO-type session drains pages from an https endpoint via
    kyuubi.engine.trino.connection.ssl.cafile."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.engine import Engine as GwEngine
    from kyuubi_spark.gateway.state import FetchOrientation
    from kyuubi_spark.gateway.trino import TrinoGateway

    svc = TrinoGateway(
        Engine(spark=spark), page_size=3, ssl_context=server_ctx
    ).start()
    try:
        gw = GwEngine(spark)
        s = gw.open_session(
            user="tls_trino_engine",
            conf={
                "kyuubi.engine.type": "TRINO",
                "kyuubi.engine.trino.connection.url":
                    f"https://{svc.host}:{svc.port}",
                "kyuubi.engine.trino.connection.ssl.cafile": certs[0],
            },
        )
        op = s.execute_statement("SELECT id FROM range(7) ORDER BY id")
        rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 100)
        assert [r[0] for r in rows] == list(range(7))
        gw.close_session(s.handle)
    finally:
        svc.stop()

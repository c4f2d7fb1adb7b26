"""LDAP simple-bind provider against an in-process toy directory server.

The server speaks just enough RFC 4511: parse the BindRequest's DN and
password with the same BER reader the client uses, answer resultCode 0
(success) or 49 (invalidCredentials). Mirrors the reference's
LdapAuthenticationProviderImplSuite shape (an embedded directory with
one known user).
"""

from __future__ import annotations

import socketserver
import threading

import pytest

from kyuubi_spark.gateway.auth import (
    AuthenticationError,
    get_authentication_provider,
)
from kyuubi_spark.gateway import ldap as L


CREDS = {"uid=alice,ou=users,dc=example,dc=com": "wonder"}


def _bind_response(msg_id: int, code: int) -> bytes:
    inner = (
        L._tlv(L._ENUMERATED, bytes([code]))
        + L._tlv(L._OCTET_STRING, b"")  # matchedDN
        + L._tlv(L._OCTET_STRING, b"")  # diagnosticMessage
    )
    body = L._tlv(L._INTEGER, bytes([msg_id])) + L._tlv(
        L._APP_BIND_RESPONSE, inner
    )
    return L._tlv(L._SEQUENCE, body)


class _ToyLdapHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        buf = b""
        while True:
            chunk = self.request.recv(4096)
            if not chunk:
                return
            buf += chunk
            try:
                _tag, body, _ = L._read_tlv(buf, 0)
            except ValueError:
                continue  # incomplete message
            _t, msgid, off = L._read_tlv(body, 0)
            _t, op, _ = L._read_tlv(body, off)
            _t, _ver, o = L._read_tlv(op, 0)
            _t, dn, o = L._read_tlv(op, o)
            _t, pw, _ = L._read_tlv(op, o)
            ok = CREDS.get(dn.decode()) == pw.decode() and pw != b""
            code = L.RESULT_SUCCESS if ok else L.RESULT_INVALID_CREDENTIALS
            self.request.sendall(_bind_response(msgid[0], code))
            return


@pytest.fixture(scope="module")
def ldap_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _ToyLdapHandler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def _provider(host, port):
    return get_authentication_provider(
        "LDAP",
        {
            "kyuubi.authentication.ldap.url": f"ldap://{host}:{port}",
            "kyuubi.authentication.ldap.baseDN": "ou=users,dc=example,dc=com",
        },
    )


def test_ldap_bind_accepts_good_credentials(ldap_server):
    _provider(*ldap_server).authenticate("alice", "wonder")


def test_ldap_bind_rejects_bad_password(ldap_server):
    with pytest.raises(AuthenticationError) as ei:
        _provider(*ldap_server).authenticate("alice", "nope")
    assert "49" in str(ei.value)


def test_ldap_bind_rejects_unknown_user(ldap_server):
    with pytest.raises(AuthenticationError):
        _provider(*ldap_server).authenticate("mallory", "wonder")


def test_ldap_empty_password_is_never_an_anonymous_bind(ldap_server):
    # RFC 4513 §5.1.2: empty password = unauthenticated bind, which many
    # servers accept — the provider must reject it before any wire call
    with pytest.raises(AuthenticationError):
        _provider(*ldap_server).authenticate("alice", "")


def test_ldap_dn_construction():
    p = _provider("127.0.0.1", 1)
    assert p._bind_dn("bob") == "uid=bob,ou=users,dc=example,dc=com"
    # a full DN passes through untouched
    dn = "cn=svc,dc=example,dc=com"
    assert p._bind_dn(dn) == dn
    q = get_authentication_provider(
        "LDAP",
        {
            "kyuubi.authentication.ldap.url": "ldap://h:389",
            "kyuubi.authentication.ldap.domain": "example.com",
        },
    )
    assert q._bind_dn("bob") == "bob@example.com"


def test_ber_codec_round_trip():
    req = L.bind_request(7, "uid=x,dc=y", "s3cret")
    _tag, body, _ = L._read_tlv(req, 0)
    _t, msgid, off = L._read_tlv(body, 0)
    assert msgid == bytes([7])
    _t, op, _ = L._read_tlv(body, off)
    _t, ver, o = L._read_tlv(op, 0)
    assert ver == bytes([3])
    _t, dn, o = L._read_tlv(op, o)
    assert dn == b"uid=x,dc=y"
    tag, pw, _ = L._read_tlv(op, o)
    assert tag == L._CTX_SIMPLE_AUTH and pw == b"s3cret"
    # long-form lengths survive the round trip
    long_pw = "p" * 300
    req2 = L.bind_request(1, "uid=x", long_pw)
    _tag, body2, _ = L._read_tlv(req2, 0)
    _t, _m, off2 = L._read_tlv(body2, 0)
    _t, op2, _ = L._read_tlv(body2, off2)
    _t, _v, o2 = L._read_tlv(op2, 0)
    _t, _d, o2 = L._read_tlv(op2, o2)
    _t, pw2, _ = L._read_tlv(op2, o2)
    assert pw2 == long_pw.encode()


def test_sasl_plain_with_ldap_provider_end_to_end(spark, ldap_server):
    """The full stack: thrift SASL/PLAIN wire -> LDAP simple bind."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

    host, port = ldap_server
    svc = ThriftFrontendService(
        Engine(spark=spark), auth=_provider(host, port)
    ).start()
    try:
        c = ThriftClient(svc.host, svc.port, user="alice", password="wonder")
        c.open_session(user="ignored")
        op = c.execute("SELECT session_user() AS u")
        assert [r for r in c.fetch(op, 10)] == [["alice"]]
        c.close_session()
        c.close()
        with pytest.raises(AuthenticationError):
            ThriftClient(svc.host, svc.port, user="alice", password="bad")
    finally:
        svc.stop()


def test_ldap_url_parsing_errors_and_paths():
    # ldaps:// parses to a TLS bind, default port 636
    p_tls = get_authentication_provider(
        "LDAP",
        {"kyuubi.authentication.ldap.url": "ldaps://ds.example.com"},
    )
    assert p_tls.use_tls and (p_tls.host, p_tls.port) == ("ds.example.com", 636)
    with pytest.raises(ValueError):
        get_authentication_provider(
            "LDAP", {"kyuubi.authentication.ldap.url": "http://x:1"}
        )
    # RFC 4516 URL with a /dn path parses down to host:port
    p = get_authentication_provider(
        "LDAP",
        {"kyuubi.authentication.ldap.url": "ldap://h.example.com:389/dc=x"},
    )
    assert (p.host, p.port) == ("h.example.com", 389)
    # default port
    q = get_authentication_provider(
        "LDAP", {"kyuubi.authentication.ldap.url": "ldap://h2"}
    )
    assert (q.host, q.port) == ("h2", 389)


def test_ber_int_encoding():
    assert L._ber_int(0) == b"\x00"
    assert L._ber_int(3) == b"\x03"
    # high-bit values need a 0x00 pad so they don't decode negative
    assert L._ber_int(128) == b"\x00\x80"
    assert L._ber_int(255) == b"\x00\xff"
    assert L._ber_int(256) == b"\x01\x00"
    # bind_request no longer crashes for msg_id > 255
    L.bind_request(300, "uid=x", "pw")


def test_parse_fails_fast_on_complete_wrong_message():
    # a COMPLETE message that isn't a BindResponse must raise plain
    # ValueError (fail fast), while a truncated one raises Truncated
    # (wait for more bytes)
    notice = L._tlv(
        L._SEQUENCE,
        L._tlv(L._INTEGER, b"\x00") + L._tlv(0x78, b""),  # ExtendedResponse
    )
    with pytest.raises(ValueError) as ei:
        L.parse_bind_response(notice)
    assert not isinstance(ei.value, L.Truncated)
    with pytest.raises(L.Truncated):
        L.parse_bind_response(notice[:3])


def test_ldap_multi_pattern_candidates():
    """Every colon-separated userDNPattern yields a candidate principal
    (reference LdapUtils.getCandidatePrincipals) — a user under the
    SECOND pattern's subtree must still be able to bind."""
    p = get_authentication_provider(
        "LDAP",
        {
            "kyuubi.authentication.ldap.url": "ldap://h:389",
            "kyuubi.authentication.ldap.userDNPattern":
                "uid=%s,ou=staff,dc=x:uid=%s,ou=svc,dc=x",
        },
    )
    assert p._candidate_dns("bot") == [
        "uid=bot,ou=staff,dc=x", "uid=bot,ou=svc,dc=x",
    ]
    # first pattern stays the primary (back-compat accessor)
    assert p._bind_dn("bot") == "uid=bot,ou=staff,dc=x"


def test_ldap_second_pattern_user_binds(ldap_server):
    """End-to-end: the toy directory only knows the ou=svc DN, so the
    bind succeeds via the second candidate."""
    host, port = ldap_server
    p = get_authentication_provider(
        "LDAP",
        {
            "kyuubi.authentication.ldap.url": f"ldap://{host}:{port}",
            "kyuubi.authentication.ldap.userDNPattern":
                "uid=%s,ou=staff,dc=example,dc=com:"
                "uid=%s,ou=users,dc=example,dc=com",
        },
    )
    p.authenticate("alice", "wonder")  # only uid=alice,ou=users,... exists
    with pytest.raises(AuthenticationError):
        p.authenticate("alice", "wrong")


def test_ldap_socket_error_on_first_candidate_does_not_mask_second(
    monkeypatch,
):
    """No-filter path: a server that abruptly closes the socket on a
    bad-DN bind (OSError) must not abort authentication — a later
    candidate's valid credentials still win (reference createDirSearch
    candidate loop semantics)."""
    calls = []

    def fake_bind(host, port, dn, password, ssl_context=None):
        calls.append(dn)
        if "ou=staff" in dn:
            raise OSError("connection reset by peer")
        return L.RESULT_SUCCESS

    monkeypatch.setattr(L, "simple_bind", fake_bind)
    p = get_authentication_provider(
        "LDAP",
        {
            "kyuubi.authentication.ldap.url": "ldap://h:389",
            "kyuubi.authentication.ldap.userDNPattern":
                "uid=%s,ou=staff,dc=x:uid=%s,ou=svc,dc=x",
        },
    )
    p.authenticate("bot", "secret")  # no raise: second candidate succeeds
    assert calls == ["uid=bot,ou=staff,dc=x", "uid=bot,ou=svc,dc=x"]

    # and when EVERY candidate errors, the last error surfaces
    def always_err(host, port, dn, password, ssl_context=None):
        raise OSError("down")

    monkeypatch.setattr(L, "simple_bind", always_err)
    with pytest.raises(AuthenticationError, match="bind failed"):
        p.authenticate("bot", "secret")

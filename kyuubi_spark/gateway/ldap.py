"""LDAP simple-bind authentication — dependency-free RFC 4511 subset.

The reference's ``LdapAuthenticationProviderImpl.scala`` authenticates by
performing an LDAP *simple bind* as the user and treating a successful
bind as a valid credential. The container ships no LDAP client library,
so this module speaks the wire protocol directly: a BindRequest is a
small, fixed BER structure (RFC 4511 §4.2) and the BindResponse's
resultCode is all we need back. Conf keys mirror the reference
(KyuubiConf.scala:1080-1158): ``kyuubi.authentication.ldap.url``,
``.baseDN``, ``.domain``, ``.guidKey`` (default ``uid``); the bind DN is
``{guidKey}={user},{baseDN}`` when a baseDN is set (the classic
Hive/Kyuubi pattern), else ``user@domain`` when a domain is set, else
the bare user.

``ldaps://`` URLs run the bind over TLS (stdlib ``ssl``; see
``kyuubi.authentication.ldap.ssl.cafile`` below, the PEM analog of the
JVM truststore the Java reference relies on).
"""

from __future__ import annotations

import socket

from kyuubi_spark.gateway.auth import (
    AuthenticationError,
    PasswdAuthenticationProvider,
)

# BER/LDAP tags (RFC 4511 / X.690)
_SEQUENCE = 0x30
_INTEGER = 0x02
_OCTET_STRING = 0x04
_ENUMERATED = 0x0A
_APP_BIND_REQUEST = 0x60  # [APPLICATION 0] constructed
_APP_BIND_RESPONSE = 0x61  # [APPLICATION 1] constructed
_CTX_SIMPLE_AUTH = 0x80  # [0] primitive: simple password

RESULT_SUCCESS = 0
RESULT_INVALID_CREDENTIALS = 49


def _ber_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _tlv(tag: int, payload: bytes) -> bytes:
    return bytes([tag]) + _ber_len(len(payload)) + payload


def _ber_int(n: int) -> bytes:
    """X.690 two's-complement INTEGER content octets (n >= 0): pad with a
    leading 0x00 when the high bit is set so 128..255 don't decode as
    negative, and grow beyond one octet as needed."""
    if n == 0:
        return b"\x00"
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return b"\x00" + body if body[0] & 0x80 else body


def bind_request(msg_id: int, dn: str, password: str) -> bytes:
    """LDAPMessage{messageID, BindRequest{version=3, name, simple}}."""
    inner = (
        _tlv(_INTEGER, _ber_int(3))
        + _tlv(_OCTET_STRING, dn.encode("utf-8"))
        + _tlv(_CTX_SIMPLE_AUTH, password.encode("utf-8"))
    )
    body = _tlv(_INTEGER, _ber_int(msg_id)) + _tlv(_APP_BIND_REQUEST, inner)
    return _tlv(_SEQUENCE, body)


class Truncated(ValueError):
    """The buffer ends mid-element — more bytes may still arrive.
    Distinct from other ValueErrors (complete-but-wrong messages), which
    must fail FAST instead of waiting out the socket timeout."""


def _read_tlv(buf: bytes, off: int) -> tuple[int, bytes, int]:
    """-> (tag, payload, next_offset); raises Truncated on short input."""
    if off + 2 > len(buf):
        raise Truncated("truncated BER element")
    tag = buf[off]
    first = buf[off + 1]
    off += 2
    if first < 0x80:
        ln = first
    else:
        nlen = first & 0x7F
        if off + nlen > len(buf):
            raise Truncated("truncated BER length")
        ln = int.from_bytes(buf[off : off + nlen], "big")
        off += nlen
    if off + ln > len(buf):
        raise Truncated("truncated BER payload")
    return tag, buf[off : off + ln], off + ln


def parse_bind_response(data: bytes) -> int:
    """Extract the BindResponse resultCode from an LDAPMessage."""
    tag, body, _ = _read_tlv(data, 0)
    if tag != _SEQUENCE:
        raise ValueError(f"not an LDAPMessage (tag 0x{tag:02x})")
    tag, _msgid, off = _read_tlv(body, 0)
    if tag != _INTEGER:
        raise ValueError("LDAPMessage without messageID")
    tag, op, _ = _read_tlv(body, off)
    if tag != _APP_BIND_RESPONSE:
        raise ValueError(f"not a BindResponse (tag 0x{tag:02x})")
    tag, code, _ = _read_tlv(op, 0)
    if tag != _ENUMERATED:
        raise ValueError("BindResponse without resultCode")
    return int.from_bytes(code, "big")


def simple_bind(host: str, port: int, dn: str, password: str,
                timeout: float = 10.0, ssl_context=None) -> int:
    """One TCP round-trip: send BindRequest, return the resultCode.

    ``ssl_context`` switches the connection to LDAP-over-TLS (ldaps://,
    RFC 4513 §3) — the handshake completes before the BindRequest is
    sent, so the credential never crosses the wire in clear."""
    with socket.create_connection((host, port), timeout=timeout) as raw:
        sock = raw
        if ssl_context is not None:
            sock = ssl_context.wrap_socket(raw, server_hostname=host)
        sock.sendall(bind_request(1, dn, password))
        buf = b""
        while True:
            chunk = sock.recv(4096)
            if not chunk:
                raise AuthenticationError("LDAP server closed connection")
            buf += chunk
            try:
                return parse_bind_response(buf)
            except Truncated:
                continue  # need more bytes
            # any other ValueError (complete but not a BindResponse —
            # e.g. a Notice of Disconnection) propagates and fails fast
            # instead of spinning until the socket timeout


class LdapAuthenticationProvider(PasswdAuthenticationProvider):
    """Simple-bind provider (LdapAuthenticationProviderImpl semantics)."""

    def __init__(self, conf: dict):
        url = conf.get("kyuubi.authentication.ldap.url", "")
        if not url:
            raise ValueError(
                "kyuubi.authentication.ldap.url must be set for LDAP "
                "authentication"
            )
        # "SPACE character separated LDAP connection URL(s)" — use the
        # first; multi-server failover is a deployment concern
        first = url.split()[0]
        self.use_tls = False
        if first.startswith("ldaps://"):
            # LDAP over TLS (stdlib ssl): handshake before the bind, so
            # the credential never crosses the wire in clear.  The Java
            # reference trusts the JVM truststore; the PEM analog is
            # kyuubi.authentication.ldap.ssl.cafile (self-signed servers
            # pass their own cert), .ssl.insecure=true skips verification.
            self.use_tls = True
            first = first[len("ldaps://") :]
        elif first.startswith("ldap://"):
            first = first[len("ldap://") :]
        elif "://" in first:
            scheme = first.split("://", 1)[0]
            raise ValueError(f"unsupported LDAP URL scheme: {scheme}://")
        # RFC 4516 URLs may carry a /dn path — host:port is all we need
        first = first.split("/", 1)[0]
        host, _, port = first.partition(":")
        self.cafile = conf.get("kyuubi.authentication.ldap.ssl.cafile")
        self.insecure = str(
            conf.get("kyuubi.authentication.ldap.ssl.insecure", "false")
        ).strip().lower() in ("true", "1", "yes")
        try:
            self.host = host
            self.port = int(port or (636 if self.use_tls else 389))
        except ValueError as e:
            raise ValueError(
                f"cannot parse LDAP URL host:port from {url!r}"
            ) from e
        self.base_dn = conf.get(
            "kyuubi.authentication.ldap.baseDN",
            conf.get("kyuubi.authentication.ldap.base.dn", ""),
        )
        self.domain = conf.get("kyuubi.authentication.ldap.domain", "")
        self.guid_key = conf.get("kyuubi.authentication.ldap.guidKey", "uid")
        self.conf = dict(conf)
        # search-based authorization filters (userFilter / groupFilter /
        # customLDAPQuery — gateway/ldap_search.py); None when none set
        from kyuubi_spark.gateway.ldap_search import resolve_filter

        self.filter = resolve_filter(conf)

    def _candidate_dns(self, user: str) -> list[str]:
        """Every principal the user may bind as, tried in order — the
        reference derives the same candidate list (LdapUtils
        .getCandidatePrincipals: every colon-separated userDNPattern
        first, then the guidKey+baseDN / domain fallbacks)."""
        if "=" in user or "," in user:
            return [user]  # already a DN
        patterns = [
            p
            for p in self.conf.get(
                "kyuubi.authentication.ldap.userDNPattern", ""
            ).split(":")
            if p and "%s" in p
        ]
        if patterns:
            return [p.replace("%s", user) for p in patterns]
        if self.base_dn:
            return [f"{self.guid_key}={user},{self.base_dn}"]
        if self.domain and "@" not in user:
            return [f"{user}@{self.domain}"]
        return [user]

    def _bind_dn(self, user: str) -> str:
        return self._candidate_dns(user)[0]

    def authenticate(self, user: str, password: str) -> None:
        if not user:
            raise AuthenticationError("no user name provided")
        if not password:
            # RFC 4513 §5.1.2: an empty password is an UNAUTHENTICATED
            # bind, which most servers report as success — never treat it
            # as a valid credential (Hive/Kyuubi reject it the same way)
            raise AuthenticationError("empty passwords are not allowed")
        ctx = None
        if self.use_tls:
            from kyuubi_spark.gateway.tls import client_ssl_context

            ctx = client_ssl_context(
                cafile=self.cafile, insecure=self.insecure
            )
        candidates = self._candidate_dns(user)
        if self.filter is None:
            # mirror the filter path (and the reference's createDirSearch
            # candidate loop): a socket/protocol error on one candidate DN
            # must not mask a later candidate's valid credentials — record
            # it and keep going, raise only after exhausting the list
            code = None
            last_err: Exception | None = None
            for dn in candidates:
                try:
                    code = simple_bind(
                        self.host, self.port, dn, password, ssl_context=ctx
                    )
                except (OSError, ValueError) as e:
                    last_err = e
                    continue
                if code == RESULT_SUCCESS:
                    return
            if code is None:
                raise AuthenticationError(
                    f"LDAP bind failed: {last_err}"
                ) from last_err
            raise AuthenticationError(
                f"LDAP bind rejected for {user} (resultCode {code})"
            )
        # filters configured: bind and search on ONE connection held as
        # the authenticating user (the reference creates its DirSearch
        # with the just-bound credentials, LdapAuthenticationProviderImpl
        # .scala:54-71) — a bindable user still fails unless the filter
        # chain authorizes them
        from kyuubi_spark.gateway.ldap_search import LdapConnection, LdapSearch

        # one fresh connection per candidate: RFC 4511 allows rebinding on
        # a connection, but servers MAY close after a failed bind — reusing
        # the socket would mask a later candidate's valid credentials
        conn = None
        code = None
        last_err: Exception | None = None
        for dn in candidates:
            try:
                c = LdapConnection(self.host, self.port, ssl_context=ctx)
            except (OSError, ValueError) as e:
                raise AuthenticationError(f"LDAP connect failed: {e}") from e
            try:
                code = c.bind(dn, password)
            except (OSError, ValueError) as e:
                last_err = e
                c.close()
                continue
            if code == RESULT_SUCCESS:
                conn = c
                break
            c.close()
        if conn is None:
            if code is None:
                raise AuthenticationError(
                    f"LDAP bind failed: {last_err}"
                ) from last_err
            raise AuthenticationError(
                f"LDAP bind rejected for {user} (resultCode {code})"
            )
        with conn:
            try:
                self.filter.apply(LdapSearch(conn, self.conf), user)
            except AuthenticationError:
                raise
            except (OSError, ValueError) as e:
                raise AuthenticationError(
                    f"LDAP filter evaluation failed: {e}"
                ) from e

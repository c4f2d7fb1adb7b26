"""LDAP search-based user/group authorization filters.

Reference: authentication/ldap package — UserFilterFactory.scala,
GroupFilterFactory.scala (both membership directions),
CustomQueryFilterFactory.scala, ChainFilterFactory.scala, LdapSearch.scala
— exercised against an in-test directory server that answers RFC 4511
bind AND search requests over the repo's own BER codec.
"""

from __future__ import annotations

import socketserver
import threading

import pytest

from kyuubi_spark.gateway import ldap as L
from kyuubi_spark.gateway import ldap_search as LS
from kyuubi_spark.gateway.auth import (
    AuthenticationError,
    get_authentication_provider,
)

# -- in-memory directory ------------------------------------------------------

_USERS_BASE = "ou=users,dc=example,dc=com"
_GROUPS_BASE = "ou=groups,dc=example,dc=com"

DIRECTORY: dict[str, dict[str, list[str]]] = {
    f"uid=alice,{_USERS_BASE}": {
        "objectclass": ["person", "inetOrgPerson"],
        "uid": ["alice"],
        "memberof": [f"cn=admins,{_GROUPS_BASE}"],
    },
    f"uid=bob,{_USERS_BASE}": {
        "objectclass": ["person", "inetOrgPerson"],
        "uid": ["bob"],
        "memberof": [f"cn=devs,{_GROUPS_BASE}"],
    },
    # groups carry the guidKey attr (uid) too: QueryFactory.findGroupDnById
    # matches (&(objectClass=<groupClass>)(<guidAttr>=<groupID>)) with the
    # SAME guid key used for users (reference default 'uid')
    f"cn=admins,{_GROUPS_BASE}": {
        "objectclass": ["groupOfNames"],
        "cn": ["admins"],
        "uid": ["admins"],
        "member": [f"uid=alice,{_USERS_BASE}"],
    },
    f"cn=devs,{_GROUPS_BASE}": {
        "objectclass": ["groupOfNames"],
        "cn": ["devs"],
        "uid": ["devs"],
        "member": [f"uid=bob,{_USERS_BASE}"],
    },
}

PASSWORDS = {
    f"uid=alice,{_USERS_BASE}": "wonder",
    f"uid=bob,{_USERS_BASE}": "builder",
}


# -- BER filter decoding + evaluation (server side of the stub) ---------------


def _decode_filter(blob: bytes):
    tag, body, _ = LS._read_tlv(blob, 0)
    if tag in (LS._FILTER_AND, LS._FILTER_OR):
        kids, pos = [], 0
        while pos < len(body):
            _t, _b, nxt = LS._read_tlv(body, pos)
            kids.append(_decode_filter(body[pos:nxt]))
            pos = nxt
        return ("and" if tag == LS._FILTER_AND else "or", kids)
    if tag == LS._FILTER_NOT:
        return ("not", _decode_filter(body))
    if tag == LS._FILTER_PRESENT:
        return ("present", body.decode())
    if tag == LS._FILTER_EQ:
        _t, attr, off = LS._read_tlv(body, 0)
        _t, val, _ = LS._read_tlv(body, off)
        return ("eq", attr.decode(), val.decode())
    raise ValueError(f"stub: unsupported filter tag 0x{tag:02x}")


def _matches(node, attrs: dict[str, list[str]]) -> bool:
    kind = node[0]
    if kind == "and":
        return all(_matches(k, attrs) for k in node[1])
    if kind == "or":
        return any(_matches(k, attrs) for k in node[1])
    if kind == "not":
        return not _matches(node[1], attrs)
    if kind == "present":
        return node[1].lower() in attrs
    if kind == "eq":
        vals = attrs.get(node[1].lower(), [])
        return any(v.lower() == node[2].lower() for v in vals)
    return False


def _search_entry(msg_id: int, dn: str, attrs: dict[str, list[str]]) -> bytes:
    pairs = b""
    for name, vals in attrs.items():
        vset = b"".join(L._tlv(L._OCTET_STRING, v.encode()) for v in vals)
        pairs += L._tlv(
            L._SEQUENCE,
            L._tlv(L._OCTET_STRING, name.encode()) + L._tlv(LS._SET, vset),
        )
    op = L._tlv(L._OCTET_STRING, dn.encode()) + L._tlv(L._SEQUENCE, pairs)
    body = L._tlv(L._INTEGER, L._ber_int(msg_id)) + L._tlv(
        LS._APP_SEARCH_ENTRY, op
    )
    return L._tlv(L._SEQUENCE, body)


def _result_done(msg_id: int, tag: int, code: int) -> bytes:
    inner = (
        L._tlv(L._ENUMERATED, bytes([code]))
        + L._tlv(L._OCTET_STRING, b"")
        + L._tlv(L._OCTET_STRING, b"")
    )
    body = L._tlv(L._INTEGER, L._ber_int(msg_id)) + L._tlv(tag, inner)
    return L._tlv(L._SEQUENCE, body)


class _DirectoryHandler(socketserver.BaseRequestHandler):
    """Bind + subtree-search against the DIRECTORY dict."""

    def handle(self) -> None:
        buf = b""
        while True:
            try:
                chunk = self.request.recv(4096)
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            while True:
                try:
                    _tag, body, end = L._read_tlv(buf, 0)
                except L.Truncated:
                    break
                buf = buf[end:]
                _t, msgid_raw, off = L._read_tlv(body, 0)
                msg_id = int.from_bytes(msgid_raw, "big")
                op_tag, op, _ = L._read_tlv(body, off)
                if op_tag == L._APP_BIND_REQUEST:
                    _t, _ver, o = L._read_tlv(op, 0)
                    _t, dn, o = L._read_tlv(op, o)
                    _t, pw, _ = L._read_tlv(op, o)
                    ok = (
                        pw != b""
                        and PASSWORDS.get(dn.decode()) == pw.decode()
                    )
                    code = (
                        L.RESULT_SUCCESS
                        if ok
                        else L.RESULT_INVALID_CREDENTIALS
                    )
                    self.request.sendall(
                        _result_done(msg_id, L._APP_BIND_RESPONSE, code)
                    )
                elif op_tag == LS._APP_SEARCH_REQUEST:
                    _t, base, o = L._read_tlv(op, 0)
                    _t, _scope, o = L._read_tlv(op, o)
                    _t, _deref, o = L._read_tlv(op, o)
                    _t, size_raw, o = L._read_tlv(op, o)
                    _t, _tl, o = L._read_tlv(op, o)
                    _t, _types, o = L._read_tlv(op, o)
                    flt = _decode_filter(op[o:])
                    base_dn = base.decode().lower()
                    limit = int.from_bytes(size_raw, "big") or 10**9
                    sent = 0
                    for dn, attrs in DIRECTORY.items():
                        if base_dn and not dn.lower().endswith(base_dn):
                            continue
                        if _matches(flt, attrs) and sent < limit:
                            self.request.sendall(
                                _search_entry(msg_id, dn, attrs)
                            )
                            sent += 1
                    self.request.sendall(
                        _result_done(msg_id, LS._APP_SEARCH_DONE, 0)
                    )
                elif op_tag == LS._APP_UNBIND:
                    return
                else:
                    return


@pytest.fixture(scope="module")
def directory_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _DirectoryHandler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def _conf(host, port, **extra):
    conf = {
        "kyuubi.authentication.ldap.url": f"ldap://{host}:{port}",
        # root base for searches (custom queries span users AND groups);
        # bind principal + user searches come from the userDNPattern
        "kyuubi.authentication.ldap.baseDN": "dc=example,dc=com",
        "kyuubi.authentication.ldap.userDNPattern":
            f"uid=%s,{_USERS_BASE}",
        "kyuubi.authentication.ldap.groupDNPattern":
            f"cn=%s,{_GROUPS_BASE}",
    }
    conf.update(extra)
    return conf


def _provider(host, port, **extra):
    return get_authentication_provider("LDAP", _conf(host, port, **extra))


# -- filter string codec ------------------------------------------------------


def test_filter_parse_roundtrip():
    ast = LS.parse_filter("(&(objectClass=person)(|(uid=a)(uid=b))(!(x=*)))")
    assert ast == (
        "and",
        [
            ("eq", "objectClass", "person"),
            ("or", [("eq", "uid", "a"), ("eq", "uid", "b")]),
            ("not", ("present", "x")),
        ],
    )
    with pytest.raises(LS.FilterSyntaxError):
        LS.parse_filter("(uid=a")
    with pytest.raises(LS.FilterSyntaxError):
        LS.parse_filter("(uid=a)(x=y)")


def test_filter_escaping_blocks_injection():
    evil = LS.escape_filter_value("*)(uid=admin")
    assert "(" not in evil and "*" not in evil and ")" not in evil
    # and the parser reads the escaped value back as literal text
    ast = LS.parse_filter(f"(uid={evil})")
    assert ast == ("eq", "uid", "*)(uid=admin")


# -- group filter (group-membership direction) --------------------------------


def test_group_filter_allows_member_denies_nonmember(directory_server):
    p = _provider(
        *directory_server,
        **{"kyuubi.authentication.ldap.groupFilter": "admins"},
    )
    p.authenticate("alice", "wonder")  # admins member
    with pytest.raises(AuthenticationError, match="not a member"):
        p.authenticate("bob", "builder")  # bindable but devs-only
    # wrong password still fails at the BIND, before any filter
    with pytest.raises(AuthenticationError, match="resultCode|rejected"):
        p.authenticate("alice", "nope")


def test_group_filter_multiple_groups(directory_server):
    p = _provider(
        *directory_server,
        **{"kyuubi.authentication.ldap.groupFilter": "admins,devs"},
    )
    p.authenticate("alice", "wonder")
    p.authenticate("bob", "builder")


# -- group filter (user-membership direction: memberOf) -----------------------


def test_user_membership_key_filter(directory_server):
    p = _provider(
        *directory_server,
        **{
            "kyuubi.authentication.ldap.groupFilter": "admins",
            "kyuubi.authentication.ldap.userMembershipKey": "memberOf",
        },
    )
    assert isinstance(p.filter, LS.UserMembershipKeyFilter)
    p.authenticate("alice", "wonder")
    with pytest.raises(AuthenticationError, match="not a member"):
        p.authenticate("bob", "builder")


def test_user_membership_key_unknown_group(directory_server):
    p = _provider(
        *directory_server,
        **{
            "kyuubi.authentication.ldap.groupFilter": "nope_group",
            "kyuubi.authentication.ldap.userMembershipKey": "memberOf",
        },
    )
    with pytest.raises(AuthenticationError, match="No DN"):
        p.authenticate("alice", "wonder")


# -- user filter --------------------------------------------------------------


def test_user_filter_allow_list(directory_server):
    p = _provider(
        *directory_server,
        **{"kyuubi.authentication.ldap.userFilter": "alice,carol"},
    )
    p.authenticate("alice", "wonder")
    with pytest.raises(AuthenticationError, match="not a member"):
        p.authenticate("bob", "builder")


# -- chain --------------------------------------------------------------------


def test_chain_user_and_group_filters(directory_server):
    """ChainFilter: EVERY configured filter must pass — alice passes the
    user list but must also be in devs, which she is not."""
    p = _provider(
        *directory_server,
        **{
            "kyuubi.authentication.ldap.userFilter": "alice,bob",
            "kyuubi.authentication.ldap.groupFilter": "devs",
        },
    )
    assert isinstance(p.filter, LS.ChainFilter)
    p.authenticate("bob", "builder")  # in list AND in devs
    with pytest.raises(AuthenticationError, match="not a member"):
        p.authenticate("alice", "wonder")


# -- custom query -------------------------------------------------------------


def test_custom_query_filter_group_members(directory_server):
    """A query selecting the admins GROUP authorizes its members via the
    returned membership attribute values, the reference's documented
    pattern for customLDAPQuery."""
    p = _provider(
        *directory_server,
        **{
            "kyuubi.authentication.ldap.customLDAPQuery":
                "(&(objectClass=groupOfNames)(cn=admins))",
        },
    )
    assert isinstance(p.filter, LS.CustomQueryFilter)
    p.authenticate("alice", "wonder")
    with pytest.raises(AuthenticationError, match="returned no data"):
        p.authenticate("bob", "builder")


def test_custom_query_wins_over_chain(directory_server):
    """FILTER_FACTORIES order: customLDAPQuery REPLACES user/group
    filters (bob is outside the user list yet still authorized)."""
    p = _provider(
        *directory_server,
        **{
            "kyuubi.authentication.ldap.customLDAPQuery":
                "(&(objectClass=person)(uid=%s))",
            "kyuubi.authentication.ldap.userFilter": "alice",
        },
    )
    assert isinstance(p.filter, LS.CustomQueryFilter)
    # generic %s user search: exactly-one-result fallback authorizes bob
    p.authenticate("bob", "builder")


# -- DirSearch primitives -----------------------------------------------------


def test_ldap_search_primitives(directory_server):
    host, port = directory_server
    conn = LS.LdapConnection(host, port)
    try:
        assert conn.bind(f"uid=alice,{_USERS_BASE}", "wonder") == 0
        s = LS.LdapSearch(conn, _conf(host, port))
        assert s.find_user_dn("alice") == f"uid=alice,{_USERS_BASE}"
        assert s.find_user_dn("mallory") is None
        assert s.find_group_dn("admins") == f"cn=admins,{_GROUPS_BASE}"
        assert s.find_groups_for_user(f"uid=alice,{_USERS_BASE}") == [
            f"cn=admins,{_GROUPS_BASE}"
        ]
        # injection attempt: a crafted "user" cannot widen the search
        assert s.find_user_dn("*") is None
        assert s.find_user_dn("*)(uid=alice") is None
    finally:
        conn.close()


def test_short_name_helpers():
    assert LS.get_short_name("uid=alice,ou=users,dc=x") == "alice"
    assert LS.get_short_name("plain") == "plain"
    assert LS.extract_user_name("uid=bob,ou=u,dc=x") == "bob"
    assert LS.extract_user_name("carol@example.com") == "carol"
    assert LS.extract_user_name("dave") == "dave"


def test_unsupported_filter_operators_fail_closed():
    """RFC 4515 constructs this codec doesn't implement (substring 'a*',
    >=, <=, ~=) must raise, never degrade into a literal equality — a
    silently-widened filter under a NOT would authorize excluded users."""
    import pytest

    for flt in (
        "(dept=contractor*)",          # substring
        "(cn=*smith)",                 # substring (leading)
        "(cn=a*b)",                    # substring (medial)
        "(age>=5)",                    # greater-or-equal
        "(age<=5)",                    # less-or-equal
        "(name~=smith)",               # approx match
        "(&(objectClass=person)(!(dept=contractor*)))",  # nested
    ):
        with pytest.raises(LS.FilterSyntaxError):
            LS.parse_filter(flt)
    # escaped literal '*' still parses as equality on the literal char
    assert LS.parse_filter("(cn=a\\2ab)") == ("eq", "cn", "a*b")
    # presence stays supported
    assert LS.parse_filter("(cn=*)") == ("present", "cn")


def test_multi_pattern_bind_with_filters(directory_server):
    """With authorization filters on, a user under the SECOND
    userDNPattern must still authenticate: each candidate gets a fresh
    connection (a server may close the socket after a failed bind, which
    must not mask a later candidate's valid credentials), and the filter
    search runs on the surviving bound connection."""
    host, port = directory_server
    p = _provider(
        host,
        port,
        **{
            "kyuubi.authentication.ldap.userDNPattern":
                f"uid=%s,ou=svc,dc=example,dc=com:uid=%s,{_USERS_BASE}",
            "kyuubi.authentication.ldap.userFilter": "alice,bob",
        },
    )
    p.authenticate("alice", "wonder")  # exists only under the 2nd pattern
    with pytest.raises(Exception):
        p.authenticate("alice", "wrong")

"""LDAP search-based user/group authorization filters — RFC 4511 subset.

After a successful simple bind proves the CREDENTIAL, the reference
applies search-based FILTERS that prove AUTHORIZATION (a bindable user is
not necessarily an allowed user).  This module mirrors the reference's
``authentication/ldap`` package:

- ``UserFilter`` (UserFilterFactory.scala): allow-list of short user
  names — no directory round-trip.
- ``GroupMembershipKeyFilter`` (GroupFilterFactory.scala): resolve the
  user's DN, list the groups whose ``member`` attribute carries it, pass
  if any short group name is in the configured set.
- ``UserMembershipKeyFilter`` (GroupFilterFactory.scala): resolve each
  configured group's DN, pass if the USER entry's membership attribute
  (``kyuubi.authentication.ldap.userMembershipKey``) carries one of them.
- ``CustomQueryFilter`` (CustomQueryFilterFactory.scala): run an
  arbitrary LDAP filter; pass when the user's short name appears among
  the matched DNs or the returned membership-attribute values, with the
  reference's ``%s`` generic-user-search fallback.
- ``ChainFilter`` (ChainFilterFactory.scala): all configured filters
  must pass.  Resolution order matches
  LdapAuthenticationProviderImpl.FILTER_FACTORIES:116-120 — a custom
  query REPLACES the user/group chain.

The directory dialogue is the RFC 4511 wire protocol spoken directly
(the container has no LDAP client library): SearchRequest with a
BER-encoded RFC 4515 filter, SearchResultEntry / SearchResultDone
parsing, over one persistent (optionally TLS) connection bound as the
authenticating user — the same connection reuse as LdapSearchFactory.
User input substituted into filters is RFC 4515-escaped, so a login name
like ``*)(uid=admin`` cannot widen a search.
"""

from __future__ import annotations

import re
import socket

from kyuubi_spark.gateway.auth import AuthenticationError
from kyuubi_spark.gateway.ldap import (
    _ber_int,
    _read_tlv,
    _tlv,
    bind_request,
    RESULT_SUCCESS,
    Truncated,
    _ENUMERATED,
    _INTEGER,
    _OCTET_STRING,
    _SEQUENCE,
)

# RFC 4511 application tags
_APP_SEARCH_REQUEST = 0x63  # [APPLICATION 3] constructed
_APP_SEARCH_ENTRY = 0x64  # [APPLICATION 4] constructed
_APP_SEARCH_DONE = 0x65  # [APPLICATION 5] constructed
_APP_UNBIND = 0x42  # [APPLICATION 2] primitive
_SET = 0x31
_BOOLEAN = 0x01

# filter tags (RFC 4511 §4.5.1.7)
_FILTER_AND = 0xA0
_FILTER_OR = 0xA1
_FILTER_NOT = 0xA2
_FILTER_EQ = 0xA3
_FILTER_PRESENT = 0x87

_USER_OBJECT_CLASSES = ("person", "user", "inetOrgPerson")

# legal attribute description (RFC 4512 §2.5: descr / numericoid, with
# options) — anything else is refused before filter substitution
_ATTR_NAME = re.compile(r"[A-Za-z][A-Za-z0-9-]*(;[A-Za-z0-9-]+)*")


# --------------------------------------------------------------------------
# RFC 4515 filter string -> BER (and escaping)
# --------------------------------------------------------------------------


def escape_filter_value(value: str) -> str:
    """RFC 4515 §3: escape NUL, '(', ')', '*', '\\' in assertion values."""
    out = []
    for ch in value:
        if ch in "\\*()\x00":
            out.append(f"\\{ord(ch):02x}")
        else:
            out.append(ch)
    return "".join(out)


def _unescape(value: str) -> str:
    out, i = [], 0
    while i < len(value):
        if value[i] == "\\" and i + 2 < len(value) + 1 and i + 3 <= len(value):
            try:
                out.append(chr(int(value[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(value[i])
        i += 1
    return "".join(out)


class FilterSyntaxError(ValueError):
    pass


def parse_filter(text: str):
    """Parse an RFC 4515 filter string into a nested tuple AST:
    ('and'|'or', [children]) / ('not', child) / ('eq', attr, value) /
    ('present', attr)."""
    text = text.strip()
    node, pos = _parse_one(text, 0)
    if pos != len(text):
        raise FilterSyntaxError(f"trailing data in filter: {text[pos:]!r}")
    return node


def _parse_one(s: str, i: int):
    if i >= len(s) or s[i] != "(":
        raise FilterSyntaxError(f"expected '(' at {i} in {s!r}")
    i += 1
    if i >= len(s):
        raise FilterSyntaxError("unterminated filter")
    ch = s[i]
    if ch in "&|":
        kids = []
        i += 1
        while i < len(s) and s[i] == "(":
            kid, i = _parse_one(s, i)
            kids.append(kid)
        if i >= len(s) or s[i] != ")":
            raise FilterSyntaxError("unterminated and/or")
        return ("and" if ch == "&" else "or", kids), i + 1
    if ch == "!":
        kid, i = _parse_one(s, i + 1)
        if i >= len(s) or s[i] != ")":
            raise FilterSyntaxError("unterminated not")
        return ("not", kid), i + 1
    # simple item: attr=value (value may contain escaped parens)
    j = i
    while j < len(s) and s[j] not in "=)":
        j += 1
    if j >= len(s) or s[j] != "=":
        raise FilterSyntaxError(f"expected '=' in item at {i}")
    attr = s[i:j]
    # RFC 4515 also defines >=, <= and ~= match operators; this codec
    # implements equality/presence only. An authorization filter that
    # silently degraded ('age>' as a literal attribute name) would match
    # nothing — or worse, widen under a NOT — so unsupported operators
    # FAIL CLOSED at parse time instead.
    if attr.endswith((">", "<", "~")):
        raise FilterSyntaxError(
            f"unsupported match operator {attr[-1]}= at {i} "
            "(only = and =* are implemented)"
        )
    j += 1
    val = []
    while j < len(s) and s[j] != ")":
        if s[j] == "\\" and j + 2 < len(s):
            val.append(s[j : j + 3])
            j += 3
        else:
            val.append(s[j])
            j += 1
    if j >= len(s):
        raise FilterSyntaxError("unterminated item")
    value = "".join(val)
    if value == "*":
        return ("present", attr), j + 1
    # substring filters ('ab*', '*ab', 'a*b') would need the RFC 4511
    # SubstringFilter encoding; matching them as a literal equality on a
    # string containing '*' silently changes authorization semantics —
    # reject instead (an UNESCAPED '*' anywhere in the value; the \2a
    # escape for a literal asterisk still passes through _unescape).
    if "*" in value:
        raise FilterSyntaxError(
            f"substring filter {attr}={value!r} not supported "
            "(escape a literal '*' as \\2a)"
        )
    return ("eq", attr, _unescape(value)), j + 1


def encode_filter(node) -> bytes:
    kind = node[0]
    if kind in ("and", "or"):
        tag = _FILTER_AND if kind == "and" else _FILTER_OR
        return _tlv(tag, b"".join(encode_filter(k) for k in node[1]))
    if kind == "not":
        return _tlv(_FILTER_NOT, encode_filter(node[1]))
    if kind == "present":
        return _tlv(_FILTER_PRESENT, node[1].encode("utf-8"))
    if kind == "eq":
        return _tlv(
            _FILTER_EQ,
            _tlv(_OCTET_STRING, node[1].encode("utf-8"))
            + _tlv(_OCTET_STRING, node[2].encode("utf-8")),
        )
    raise FilterSyntaxError(f"unknown filter node {kind!r}")


def search_request(
    msg_id: int,
    base_dn: str,
    filter_text: str,
    attributes: tuple[str, ...] = (),
    size_limit: int = 0,
) -> bytes:
    """LDAPMessage{messageID, SearchRequest} — wholeSubtree scope,
    neverDerefAliases, typesOnly=false (RFC 4511 §4.5.1)."""
    flt = encode_filter(parse_filter(filter_text))
    attrs = b"".join(_tlv(_OCTET_STRING, a.encode()) for a in attributes)
    inner = (
        _tlv(_OCTET_STRING, base_dn.encode("utf-8"))
        + _tlv(_ENUMERATED, bytes([2]))  # wholeSubtree
        + _tlv(_ENUMERATED, bytes([0]))  # neverDerefAliases
        + _tlv(_INTEGER, _ber_int(size_limit))
        + _tlv(_INTEGER, _ber_int(0))  # timeLimit
        + _tlv(_BOOLEAN, b"\x00")  # typesOnly
        + flt
        + _tlv(_SEQUENCE, attrs)
    )
    body = _tlv(_INTEGER, _ber_int(msg_id)) + _tlv(_APP_SEARCH_REQUEST, inner)
    return _tlv(_SEQUENCE, body)


def _parse_entry(op: bytes) -> tuple[str, dict[str, list[str]]]:
    """SearchResultEntry -> (dn, {attr_lower: [values]})."""
    _t, dn, off = _read_tlv(op, 0)
    _t, attrs_blob, _ = _read_tlv(op, off)
    attrs: dict[str, list[str]] = {}
    pos = 0
    while pos < len(attrs_blob):
        _t, pair, pos = _read_tlv(attrs_blob, pos)
        _t, name, o = _read_tlv(pair, 0)
        _t, vals_blob, _ = _read_tlv(pair, o)
        vals, vp = [], 0
        while vp < len(vals_blob):
            _t, v, vp = _read_tlv(vals_blob, vp)
            vals.append(v.decode("utf-8", "replace"))
        attrs[name.decode().lower()] = vals
    return dn.decode("utf-8", "replace"), attrs


# --------------------------------------------------------------------------
# persistent connection (bind once, search many — LdapSearchFactory shape)
# --------------------------------------------------------------------------


class LdapConnection:
    """One bound LDAP connection: bind(), search(), close()."""

    def __init__(self, host: str, port: int, timeout: float = 10.0,
                 ssl_context=None):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if ssl_context is not None:
            self._sock = ssl_context.wrap_socket(
                self._sock, server_hostname=host
            )
        self._buf = b""
        self._msg_id = 0

    def close(self) -> None:
        try:
            self._sock.sendall(
                _tlv(
                    _SEQUENCE,
                    _tlv(_INTEGER, _ber_int(self._msg_id + 1))
                    + _tlv(_APP_UNBIND, b""),
                )
            )
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "LdapConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _read_message(self) -> tuple[int, bytes]:
        """-> (application tag, op payload) of the next LDAPMessage."""
        while True:
            try:
                _tag, body, end = _read_tlv(self._buf, 0)
            except Truncated:
                chunk = self._sock.recv(4096)
                if not chunk:
                    raise AuthenticationError(
                        "LDAP server closed connection"
                    ) from None
                self._buf += chunk
                continue
            self._buf = self._buf[end:]
            _t, _msgid, off = _read_tlv(body, 0)
            tag, op, _ = _read_tlv(body, off)
            return tag, op

    def bind(self, dn: str, password: str) -> int:
        self._msg_id += 1
        self._sock.sendall(bind_request(self._msg_id, dn, password))
        tag, op = self._read_message()
        _t, code, _ = _read_tlv(op, 0)
        return int.from_bytes(code, "big")

    def search(
        self,
        base_dn: str,
        filter_text: str,
        attributes: tuple[str, ...] = (),
        size_limit: int = 0,
    ) -> list[tuple[str, dict[str, list[str]]]]:
        """-> [(dn, attrs)] until SearchResultDone."""
        self._msg_id += 1
        self._sock.sendall(
            search_request(
                self._msg_id, base_dn, filter_text, attributes, size_limit
            )
        )
        out = []
        while True:
            tag, op = self._read_message()
            if tag == _APP_SEARCH_ENTRY:
                out.append(_parse_entry(op))
            elif tag == _APP_SEARCH_DONE:
                return out
            else:
                raise AuthenticationError(
                    f"unexpected LDAP response tag 0x{tag:02x} during search"
                )


# --------------------------------------------------------------------------
# LdapUtils analogs
# --------------------------------------------------------------------------


def is_dn(name: str) -> bool:
    return "=" in name


def get_short_name(dn: str) -> str:
    """First RDN's value ('uid=alice,ou=x' -> 'alice'); pass-through for
    non-DNs (LdapUtils.getShortName)."""
    if not is_dn(dn):
        return dn
    first = dn.split(",", 1)[0]
    return first.split("=", 1)[1].strip()


def extract_user_name(user: str) -> str:
    """DN -> first RDN value; user@domain -> user; else unchanged
    (LdapUtils.extractUserName)."""
    if is_dn(user):
        return get_short_name(user)
    return user.split("@", 1)[0]


def extract_base_dn(dn: str) -> str:
    return dn.split(",", 1)[1] if "," in dn else ""


def _parse_patterns(raw: str, guid_key: str, base_dn: str) -> list[str]:
    """parseDnPatterns: colon-separated '<rdn>=%s,<base>' patterns, else
    derive '<guidKey>=%s,<baseDn>' from the base DN."""
    pats = [p for p in (raw or "").split(":") if p]
    if pats:
        return pats
    if base_dn:
        return [f"{guid_key}=%s,{base_dn}"]
    return []


# --------------------------------------------------------------------------
# DirSearch analog (LdapSearch.scala + QueryFactory.scala)
# --------------------------------------------------------------------------


class LdapSearch:
    """Directory queries used by the filters, with the QueryFactory's
    filter shapes (QueryFactory.scala:30-100)."""

    def __init__(self, conn: LdapConnection, conf: dict):
        self.conn = conn
        self.base_dn = conf.get(
            "kyuubi.authentication.ldap.baseDN",
            conf.get("kyuubi.authentication.ldap.base.dn", ""),
        )
        self.guid_key = conf.get("kyuubi.authentication.ldap.guidKey", "uid")
        self.group_class = conf.get(
            "kyuubi.authentication.ldap.groupClassKey", "groupOfNames"
        )
        self.group_membership = conf.get(
            "kyuubi.authentication.ldap.groupMembershipKey", "member"
        )
        self.user_membership = conf.get(
            "kyuubi.authentication.ldap.userMembershipKey"
        )
        self.user_patterns = _parse_patterns(
            conf.get("kyuubi.authentication.ldap.userDNPattern", ""),
            self.guid_key,
            self.base_dn,
        )
        self.user_bases = [extract_base_dn(p) for p in self.user_patterns]
        group_patterns = _parse_patterns(
            conf.get("kyuubi.authentication.ldap.groupDNPattern", ""),
            self.guid_key,
            self.base_dn,
        )
        self.group_bases = [extract_base_dn(p) for p in group_patterns]

    def _classes_clause(self) -> str:
        return "(|" + "".join(
            f"(objectClass={c})" for c in _USER_OBJECT_CLASSES
        ) + ")"

    def _dns(self, base: str, flt: str, limit: int = 0) -> list[str]:
        return [dn for dn, _ in self.conn.search(base, flt, (), limit)]

    def find_user_dn(self, user: str) -> str | None:
        """LdapSearch.findUserDn:57-75 — exactly one match or None."""
        if is_dn(user):
            rdn = user.split(",", 1)[0]
            attr, _, val = rdn.partition("=")
            if not _ATTR_NAME.fullmatch(attr):
                # not a legal attribute description — a crafted "DN" like
                # '*)(uid=admin' cannot smuggle filter syntax in as the
                # attribute half (the value half is escaped below)
                return None
            flt = (
                f"(&{self._classes_clause()}"
                f"({attr}={escape_filter_value(val)}))"
            )
            names = self._dns(extract_base_dn(user), flt, 2)
        else:
            u = escape_filter_value(user)
            names = []
            for pat, base in zip(self.user_patterns, self.user_bases):
                rdn = pat.split(",", 1)[0].replace("%s", u)
                names.extend(self._dns(base, f"({rdn})", 2))
            if not names:
                flt = (
                    f"(&{self._classes_clause()}"
                    f"(|(uid={u})(sAMAccountName={u})))"
                )
                for base in self.user_bases or [self.base_dn]:
                    names.extend(self._dns(base, flt, 2))
        return names[0] if len(names) == 1 else None

    def find_group_dn(self, group_id: str) -> str | None:
        g = escape_filter_value(group_id)
        flt = f"(&(objectClass={self.group_class})({self.guid_key}={g}))"
        for base in self.group_bases or [self.base_dn]:
            names = self._dns(base, flt, 2)
            if len(names) == 1:
                return names[0]
        return None

    def find_groups_for_user(self, user_dn: str) -> list[str]:
        """Groups whose membership attr carries the user DN or short
        name (QueryFactory.findGroupsForUser)."""
        name = escape_filter_value(get_short_name(user_dn))
        dn = escape_filter_value(user_dn)
        flt = (
            f"(&(objectClass={self.group_class})"
            f"(|({self.group_membership}={dn})"
            f"({self.group_membership}={name})))"
        )
        out: list[str] = []
        for base in self.group_bases or [self.base_dn]:
            out.extend(self._dns(base, flt))
        return out

    def is_user_member_of_group(self, user: str, group_dn: str) -> bool:
        """QueryFactory.isUserMemberOfGroup — needs userMembershipKey."""
        if not self.user_membership:
            raise AuthenticationError(
                "kyuubi.authentication.ldap.userMembershipKey is not "
                "configured"
            )
        u = escape_filter_value(extract_user_name(user))
        g = escape_filter_value(group_dn)
        flt = (
            f"(&{self._classes_clause()}"
            f"({self.user_membership}={g})({self.guid_key}={u}))"
        )
        for base in self.user_bases or [self.base_dn]:
            if self._dns(base, flt, 2):
                return True
        return False

    def execute_custom_query(self, query: str) -> list[str]:
        """Matched DNs plus the membership-attribute values of every
        matched entry (QueryFactory.customQuery returnAttribute) — so a
        query that selects a GROUP yields its members."""
        out: list[str] = []
        for dn, attrs in self.conn.search(self.base_dn, query):
            out.append(dn)
            out.extend(attrs.get(self.group_membership.lower(), []))
        return out


# --------------------------------------------------------------------------
# Filters (Filter.scala implementations)
# --------------------------------------------------------------------------


class UserFilter:
    """Allow-list of short user names (UserFilterFactory.scala:25-46)."""

    def __init__(self, users: list[str]):
        self.users = {u.strip().lower() for u in users if u.strip()}

    def apply(self, search: LdapSearch, user: str) -> None:
        if extract_user_name(user).lower() not in self.users:
            raise AuthenticationError(
                "Authentication failed: User not a member of specified list"
            )


class GroupMembershipKeyFilter:
    """Pass when any group carrying the user in its membership attr has
    a short name in the set (GroupFilterFactory.scala:42-72)."""

    def __init__(self, groups: list[str]):
        self.groups = {g.strip().lower() for g in groups if g.strip()}

    def apply(self, search: LdapSearch, user: str) -> None:
        user_dn = search.find_user_dn(user)
        member_of = (
            search.find_groups_for_user(user_dn) if user_dn else []
        )
        for group_dn in member_of:
            if get_short_name(group_dn).lower() in self.groups:
                return
        raise AuthenticationError(
            "Authentication failed: User not a member of specified list"
        )


class UserMembershipKeyFilter:
    """Pass when the USER entry's membership attribute carries one of
    the configured groups' DNs (GroupFilterFactory.scala:74-108)."""

    def __init__(self, groups: list[str]):
        self.groups = [g.strip() for g in groups if g.strip()]

    def apply(self, search: LdapSearch, user: str) -> None:
        group_dns = [
            dn
            for dn in (search.find_group_dn(g) for g in self.groups)
            if dn
        ]
        if not group_dns:
            raise AuthenticationError(
                "No DN(s) has been found for any of specified group(s)"
            )
        for group_dn in group_dns:
            try:
                if search.is_user_member_of_group(user, group_dn):
                    return
            except AuthenticationError:
                raise
            except Exception:
                continue  # cannot match this group — try the next
        raise AuthenticationError(
            "Authentication failed: User not a member of listed groups"
        )


class CustomQueryFilter:
    """Pass when the user appears in the custom query's result set
    (CustomQueryFilterFactory.scala:31-77), with the reference's %s
    generic-user-search fallback."""

    def __init__(self, query: str):
        self.query = query

    def apply(self, search: LdapSearch, user: str) -> None:
        results = search.execute_custom_query(self.query)
        short = extract_user_name(user).lower()
        for matched in results:
            if (
                get_short_name(matched).lower() == short
                or matched.lower() == user.lower()
            ):
                return
        if "%s" in self.query:
            generic = self.query.replace(
                "%s", escape_filter_value(extract_user_name(user))
            )
            if len(search.execute_custom_query(generic)) == 1:
                return
        raise AuthenticationError(
            "Authentication failed: LDAP query from property returned no data"
        )


class ChainFilter:
    """ALL chained filters must pass (ChainFilterFactory.scala:30-44)."""

    def __init__(self, filters: list):
        self.filters = filters

    def apply(self, search: LdapSearch, user: str) -> None:
        for f in self.filters:
            f.apply(search, user)


def _csv(conf: dict, key: str) -> list[str]:
    raw = conf.get(key, "")
    return [v for v in str(raw).split(",") if v.strip()] if raw else []


def resolve_filter(conf: dict):
    """FILTER_FACTORIES order (LdapAuthenticationProviderImpl.scala:
    116-120): customLDAPQuery wins; else chain(user, group); None when
    nothing is configured."""
    custom = conf.get("kyuubi.authentication.ldap.customLDAPQuery")
    if custom:
        return CustomQueryFilter(custom)
    chain = []
    users = _csv(conf, "kyuubi.authentication.ldap.userFilter")
    if users:
        chain.append(UserFilter(users))
    groups = _csv(conf, "kyuubi.authentication.ldap.groupFilter")
    if groups:
        if conf.get("kyuubi.authentication.ldap.userMembershipKey"):
            chain.append(UserMembershipKeyFilter(groups))
        else:
            chain.append(GroupMembershipKeyFilter(groups))
    if not chain:
        return None
    return chain[0] if len(chain) == 1 else ChainFilter(chain)

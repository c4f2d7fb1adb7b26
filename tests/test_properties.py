"""Property-based tests (hypothesis) for the pure-Python planes: SQL
literal escaping, delegation tokens, discovery instance parsing."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kyuubi_spark.gateway.credentials import DelegationTokenManager, TokenError
from kyuubi_spark.gateway.discovery import parse_instance_host_port
from kyuubi_spark.sources.jdbc_dialect import JdbcDialect, sql_literal


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_sql_literal_never_terminates_early(value):
    escaped = sql_literal(value)
    # inside '<escaped>' every quote is doubled: stripping '' pairs leaves
    # no lone quote to close the literal
    assert "'" not in escaped.replace("''", "")
    # and escaping is reversible (no information loss)
    assert escaped.replace("''", "'") == value


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_dialect_metadata_sql_single_statement(pattern):
    # arbitrary client pattern -> the generated metadata SQL stays ONE
    # statement with balanced quotes (no injection breakout)
    sql = JdbcDialect().tables_query(pattern)
    assert sql.count("'") % 2 == 0


_user = st.text(
    alphabet=string.ascii_letters + string.digits + "._-@", min_size=1, max_size=40
)


@given(_user, _user)
@settings(max_examples=100, deadline=None)
def test_token_roundtrip_any_user(user, renewer):
    mgr = DelegationTokenManager()
    tok = mgr.issue(user, renewer)
    assert mgr.verify(tok) == user


@given(_user, st.integers(min_value=0, max_value=200))
@settings(max_examples=100, deadline=None)
def test_token_tamper_any_position_rejected(user, pos):
    mgr = DelegationTokenManager()
    tok = mgr.issue(user)
    i = pos % len(tok)
    flipped = tok[:i] + ("0" if tok[i] != "0" else "1") + tok[i + 1:]
    if flipped == tok:
        return
    try:
        other = mgr.verify(flipped)
        # a successful verify after tampering may only happen if the
        # tampered byte was inside the user field AND the signature still
        # matched — impossible with HMAC; fail hard
        raise AssertionError(f"tampered token verified as {other!r}")
    except TokenError:
        pass


@given(
    st.text(alphabet=string.ascii_letters + string.digits + ".-", min_size=1, max_size=30),
    st.integers(min_value=1, max_value=65535),
)
@settings(max_examples=100, deadline=None)
def test_parse_instance_roundtrip(host, port):
    assert parse_instance_host_port(f"{host}:{port}") == (host, port)
    kv = (
        f"hive.server2.thrift.bind.host={host};"
        f"hive.server2.thrift.port={port};hive.server2.authentication=NONE"
    )
    assert parse_instance_host_port(kv) == (host, port)


# -- DBAPI literal binding ----------------------------------------------------


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_dbapi_literal_string_stays_quoted(value):
    """Any string renders as ONE quoted literal: unescaped quotes can
    never terminate it early (the injection shape)."""
    from kyuubi_spark.client.dbapi import _literal

    lit = _literal(value)
    assert lit.startswith("'") and lit.endswith("'")
    body = lit[1:-1]
    # every quote inside the body is escaped by a preceding backslash
    i = 0
    while i < len(body):
        if body[i] == "\\":
            i += 2
            continue
        assert body[i] != "'", f"unescaped quote in {lit!r}"
        i += 1


@given(st.one_of(st.integers(), st.floats(allow_nan=False),
                 st.booleans(), st.none(), st.binary(max_size=50)))
@settings(max_examples=100, deadline=None)
def test_dbapi_literal_scalars_never_raise(value):
    from kyuubi_spark.client.dbapi import _literal

    assert isinstance(_literal(value), str)


# -- LDAP filter codec --------------------------------------------------------


_attr = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}", fullmatch=True)
_val = st.text(
    alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0x2FF),
    min_size=1, max_size=20,
)


@given(_attr, _val)
@settings(max_examples=200, deadline=None)
def test_ldap_filter_escape_roundtrip(attr, value):
    """escape_filter_value -> parse_filter recovers the exact value for
    any attr/value pair — no character can alter the filter structure."""
    from kyuubi_spark.gateway import ldap_search as LS

    flt = f"({attr}={LS.escape_filter_value(value)})"
    node = LS.parse_filter(flt)
    assert node == ("eq", attr, value)
    # and the BER encoding is parseable structure (round length prefix)
    blob = LS.encode_filter(node)
    assert blob[0] == 0xA3  # equalityMatch tag


@given(st.lists(st.tuples(_attr, _val), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_ldap_filter_and_of_many(pairs):
    from kyuubi_spark.gateway import ldap_search as LS

    inner = "".join(
        f"({a}={LS.escape_filter_value(v)})" for a, v in pairs
    )
    node = LS.parse_filter(f"(&{inner})")
    assert node[0] == "and" and len(node[1]) == len(pairs)
    for (a, v), kid in zip(pairs, node[1]):
        assert kid == ("eq", a, v)


# -- internal-auth tokens -----------------------------------------------------


@given(st.binary(min_size=1, max_size=64), st.integers(0, 10**9))
@settings(max_examples=100, deadline=None)
def test_internal_token_roundtrip_any_secret(secret, lifetime):
    from kyuubi_spark.gateway.internal_auth import InternalSecurityAccessor

    acc = InternalSecurityAccessor(secret, max_lifetime_ms=lifetime + 60_000)
    acc.auth_token(acc.issue_token())


@given(st.binary(min_size=1, max_size=64), st.integers(0, 200))
@settings(max_examples=100, deadline=None)
def test_internal_token_tamper_rejected(secret, pos):
    import pytest as _pytest

    from kyuubi_spark.gateway.auth import AuthenticationError
    from kyuubi_spark.gateway.internal_auth import InternalSecurityAccessor

    acc = InternalSecurityAccessor(secret, max_lifetime_ms=60_000)
    tok = acc.issue_token()
    p = pos % len(tok)
    flipped = tok[:p] + chr((ord(tok[p]) % 26) + 97) + tok[p + 1:]
    if flipped == tok:
        return
    with _pytest.raises(AuthenticationError):
        acc.auth_token(flipped)


# -- arrowdir commit protocol (pure-Python: no Spark session) -----------------

_write_op = st.tuples(
    st.booleans(),  # overwrite?
    st.lists(  # per-task value batches (empty task allowed)
        st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        min_size=1,
        max_size=4,
    ),
)


@given(st.lists(_write_op, min_size=1, max_size=5), st.booleans())
@settings(max_examples=60, deadline=None)
def test_arrowdir_commit_protocol_roundtrip(ops, plant_orphan):
    """Any sequence of append/overwrite writes yields exactly the
    committed multiset: append extends, overwrite replaces, crashed-task
    leftovers stay invisible, and overwrite reclaims them."""
    import tempfile
    import shutil
    import os

    import pyarrow as pa

    from kyuubi_spark.sources.arrowdir import _ArrowDirReader, _ArrowDirWriter

    schema_json = (
        '{"type":"struct","fields":[{"name":"v","type":"long",'
        '"nullable":true,"metadata":{}}]}'
    )
    d = tempfile.mkdtemp(prefix="arrowprop_")
    try:
        expected: list[int] = []
        for overwrite, tasks in ops:
            w = _ArrowDirWriter(d, schema_json, overwrite)
            msgs = []
            for values in tasks:
                batch = pa.record_batch({"v": pa.array(values, pa.int64())})
                msgs.append(w.write(iter([batch])))
            if plant_orphan:  # a crashed task's staging leftover
                open(os.path.join(d, "part-crash.arrow.inprogress"), "w").close()
            w.commit(msgs)
            flat = [v for values in tasks for v in values]
            expected = flat if overwrite else expected + flat
        r = _ArrowDirReader(d)
        got = [
            v
            for p in r.partitions()
            for b in r.read(p)
            for v in b.column("v").to_pylist()
        ]
        assert sorted(got) == sorted(expected)
        assert r.manifest["rows"] == len(expected)
    finally:
        shutil.rmtree(d, ignore_errors=True)

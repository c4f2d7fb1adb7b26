"""Differential wire-format fuzz: the gateway's hand-rolled strict
TBinaryProtocol codec (gateway/thrift.py ProtocolWriter/ProtocolReader)
against the INDEPENDENT shim implementation (tests/pyhive_shim — the
byte layer the PyHive interop lane runs on).

Hypothesis generates random nested thrift values; each is encoded by one
implementation and decoded by the other, both directions.  A mirrored
encode/decode bug (the class that hid the fetchType field-id mismatch
for eight rounds) cannot survive a cross-implementation round-trip."""

from __future__ import annotations

import io
import math
import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kyuubi_spark.gateway.thrift import ProtocolReader, ProtocolWriter, TType

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "pyhive_shim")
)
from thrift.protocol.TBinaryProtocol import TBinaryProtocol  # noqa: E402


class _Trans:
    def __init__(self, data: bytes = b""):
        self._r = io.BytesIO(data)
        self._w = io.BytesIO()

    def read(self, n):
        return self._r.read(n)

    def write(self, b):
        self._w.write(b)

    def value(self) -> bytes:
        return self._w.getvalue()


# -- value strategies --------------------------------------------------------

_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_scalars = st.one_of(
    st.tuples(st.just(TType.BOOL), st.booleans()),
    st.tuples(st.just(TType.BYTE), st.integers(-128, 127)),
    st.tuples(st.just(TType.I16), st.integers(-(2**15), 2**15 - 1)),
    st.tuples(st.just(TType.I32), st.integers(-(2**31), 2**31 - 1)),
    st.tuples(st.just(TType.I64), _i64),
    st.tuples(
        st.just(TType.DOUBLE),
        st.floats(allow_nan=False, allow_infinity=True, width=64),
    ),
    st.tuples(st.just(TType.STRING), st.binary(max_size=64)),
)


_SCALAR_TYPES = (
    TType.BOOL, TType.BYTE, TType.I16, TType.I32, TType.I64,
    TType.DOUBLE, TType.STRING,
)


def _containers(children):
    return st.one_of(
        # homogeneous list of ONE scalar element type (structs below
        # provide the nesting)
        st.sampled_from(_SCALAR_TYPES).flatmap(
            lambda et: st.tuples(
                st.just(TType.LIST),
                st.tuples(
                    st.just(et),
                    st.lists(_values_of_type(et), max_size=5),
                ),
            )
        ),
        # struct: list of (fid, ftype, value) with unique positive fids
        st.lists(
            st.tuples(st.integers(1, 100), children), max_size=4
        ).map(
            lambda items: (
                TType.STRUCT,
                [
                    (fid, tv[0], tv[1])
                    for fid, tv in {f: t for f, t in items}.items()
                ],
            )
        ),
    )


def _values_of_type(ftype):
    if ftype == TType.BOOL:
        return st.booleans()
    if ftype == TType.BYTE:
        return st.integers(-128, 127)
    if ftype == TType.I16:
        return st.integers(-(2**15), 2**15 - 1)
    if ftype == TType.I32:
        return st.integers(-(2**31), 2**31 - 1)
    if ftype == TType.I64:
        return _i64
    if ftype == TType.DOUBLE:
        return st.floats(allow_nan=False, allow_infinity=True, width=64)
    if ftype == TType.STRING:
        return st.binary(max_size=64)
    raise AssertionError(ftype)


_typed_values = st.recursive(_scalars, _containers, max_leaves=12)


# -- helpers -----------------------------------------------------------------


def _shim_write(proto, ftype, v):
    if ftype == TType.BOOL:
        proto.writeBool(v)
    elif ftype == TType.BYTE:
        proto.writeByte(v)
    elif ftype == TType.I16:
        proto.writeI16(v)
    elif ftype == TType.I32:
        proto.writeI32(v)
    elif ftype == TType.I64:
        proto.writeI64(v)
    elif ftype == TType.DOUBLE:
        proto.writeDouble(v)
    elif ftype == TType.STRING:
        proto.writeBinary(v)
    elif ftype == TType.LIST:
        et, items = v
        proto.writeListBegin(et, len(items))
        for it in items:
            _shim_write(proto, et, it)
        proto.writeListEnd()
    elif ftype == TType.STRUCT:
        proto.writeStructBegin("s")
        for fid, ft, fv in v:
            proto.writeFieldBegin("f", ft, fid)
            _shim_write(proto, ft, fv)
            proto.writeFieldEnd()
        proto.writeFieldStop()
        proto.writeStructEnd()
    else:
        raise AssertionError(ftype)


def _shim_read(proto, ftype):
    if ftype == TType.BOOL:
        return proto.readBool()
    if ftype == TType.BYTE:
        return proto.readByte()
    if ftype == TType.I16:
        return proto.readI16()
    if ftype == TType.I32:
        return proto.readI32()
    if ftype == TType.I64:
        return proto.readI64()
    if ftype == TType.DOUBLE:
        return proto.readDouble()
    if ftype == TType.STRING:
        return proto.readBinary()
    if ftype == TType.LIST:
        et, n = proto.readListBegin()
        out = (et, [_shim_read(proto, et) for _ in range(n)])
        proto.readListEnd()
        return out
    if ftype == TType.STRUCT:
        proto.readStructBegin()
        fields = {}
        while True:
            _, ft, fid = proto.readFieldBegin()
            if ft == TType.STOP:
                break
            fields[fid] = (ft, _shim_read(proto, ft))
            proto.readFieldEnd()
        proto.readStructEnd()
        return fields
    raise AssertionError(ftype)


def _canon_gateway(ftype, v):
    """Gateway reader shapes -> comparable canonical form."""
    if ftype == TType.STRING:
        return bytes(v)
    if ftype == TType.LIST:
        et, items = v
        return ("list", et, tuple(_canon_gateway(et, i) for i in items))
    if ftype == TType.STRUCT:
        # reader: {fid: (ftype, value)}
        return (
            "struct",
            tuple(
                sorted(
                    (fid, ft, _canon_gateway(ft, fv))
                    for fid, (ft, fv) in v.items()
                )
            ),
        )
    if ftype == TType.DOUBLE and isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def _canon_writer_input(ftype, v):
    """Writer-side input -> the same canonical form."""
    if ftype == TType.STRING:
        return bytes(v)
    if ftype == TType.LIST:
        et, items = v
        return ("list", et, tuple(_canon_writer_input(et, i) for i in items))
    if ftype == TType.STRUCT:
        return (
            "struct",
            tuple(
                sorted(
                    (fid, ft, _canon_writer_input(ft, fv))
                    for fid, ft, fv in v
                )
            ),
        )
    return v


@settings(max_examples=200, deadline=None)
@given(_typed_values)
def test_gateway_encodes_shim_decodes(tv):
    ftype, v = tv
    w = ProtocolWriter()
    w.write_value(ftype, v)
    proto = TBinaryProtocol(_Trans(bytes(w.buf)))
    got = _shim_read(proto, ftype)
    assert _canon_gateway(ftype, got) == _canon_writer_input(ftype, v)


@settings(max_examples=200, deadline=None)
@given(_typed_values)
def test_shim_encodes_gateway_decodes(tv):
    ftype, v = tv
    trans = _Trans()
    proto = TBinaryProtocol(trans)
    _shim_write(proto, ftype, v)
    r = ProtocolReader(io.BytesIO(trans.value()))
    got = r.read_value(ftype)
    assert _canon_gateway(ftype, got) == _canon_writer_input(ftype, v)


@settings(max_examples=100, deadline=None)
@given(
    st.text(max_size=30),
    st.integers(1, 4),
    st.integers(-(2**31), 2**31 - 1),
)
def test_message_header_roundtrips_both_ways(name, mtype, seqid):
    w = ProtocolWriter()
    w.message_begin(name, mtype, seqid)
    proto = TBinaryProtocol(_Trans(bytes(w.buf)))
    assert proto.readMessageBegin() == (name, mtype, seqid)

    trans = _Trans()
    proto = TBinaryProtocol(trans)
    proto.writeMessageBegin(name, mtype, seqid)
    r = ProtocolReader(io.BytesIO(trans.value()))
    assert r.message_begin() == (name, mtype, seqid)


# -- DBAPI parameter-binding injection safety --------------------------------


@pytest.fixture(scope="module")
def dbapi_conn(spark):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    svc = ThriftFrontendService(Engine(spark=spark)).start()
    from kyuubi_spark.client import dbapi

    conn = dbapi.connect(host=svc.host, port=svc.port, user="fuzz")
    yield conn
    conn.close()
    svc.stop()


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
        ),
        max_size=40,
    )
)
def test_dbapi_string_binding_roundtrips_any_text(dbapi_conn, s):
    """Client-side pyformat literal substitution must return the EXACT
    input string for arbitrary text — quotes, backslashes, newlines,
    unicode — i.e. a bound value can never break out of its literal
    (the SQL-injection safety property of dbapi._literal)."""
    cur = dbapi_conn.cursor()
    cur.execute("SELECT %(x)s AS v", {"x": s})
    (got,) = cur.fetchone()
    cur.close()
    assert got == s


# -- z-order Morton code bijectivity ------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_morton_interleave_is_bijective(spark, x, y):
    """interleave_bits must place bit b of column j at position
    b*n_cols+j exactly (ZorderBytesUtils parity): de-interleaving the
    z-value recovers both inputs, so no two (x, y) pairs ever collide —
    the property file skipping correctness rests on."""
    from kyuubi_spark.operators.zorder import interleave_bits

    row = (
        spark.range(1)
        .select(
            interleave_bits(
                [F.lit(x).cast("long"), F.lit(y).cast("long")], bits=16
            ).alias("z")
        )
        .collect()[0]
    )
    z = int(row["z"])
    rx = sum(((z >> (2 * b)) & 1) << b for b in range(16))
    ry = sum(((z >> (2 * b + 1)) & 1) << b for b in range(16))
    assert (rx, ry) == (x, y)


# -- the same injection-safety fuzz THROUGH a launched engine process ---------


@pytest.fixture(scope="module")
def launched_dbapi_conn(spark, tmp_path_factory):
    """DBAPI connection whose every statement crosses THREE processes:
    client -> gateway thrift frontend -> remote.py thrift hop -> launched
    engine (r09 Next #5: the forwarded path gets the same differential
    treatment that caught the two PyHive wire bugs in-process)."""
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.server_main import KyuubiServer

    d = tmp_path_factory.mktemp("fuzz-engine")
    disco = SqliteDiscoveryClient(str(d / "registry.db"))
    disco.create_client()
    server = KyuubiServer(
        spark,
        conf={
            "kyuubi.engine.launch.enabled": "true",
            "kyuubi.session.engine.initialize.timeout": "90",
        },
        discovery=disco,
    ).start()
    host, port = server.endpoints()["thrift_binary"]
    from kyuubi_spark.client import dbapi

    conn = dbapi.connect(host=host, port=port, user="fuzz_proc")
    assert server.process_manager.engine_count == 1  # really forwarded
    yield conn
    conn.close()
    server.stop()
    disco.close_client()


@settings(max_examples=25, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=40,
    )
)
def test_launched_engine_string_binding_roundtrips_any_text(
    launched_dbapi_conn, s
):
    """Arbitrary text must survive the full forwarded wire path exactly:
    literal-bound at the client, executed on the launched engine, fetched
    back through remote.py's FetchResults framing."""
    cur = launched_dbapi_conn.cursor()
    cur.execute("SELECT %(x)s AS v, length(%(x)s) AS n", {"x": s})
    got, n = cur.fetchone()
    cur.close()
    assert got == s
    assert n == len(s)

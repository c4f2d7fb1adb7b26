"""Per-type wire matrix: one case per type from SchemaHelper.scala:40-65,
exercised through BOTH result formats — the thrift columnar rowset over a
real socket and the Arrow batches — asserting the TTypeId mapping and the
hive-string rendering of values (reference SparkDataTypeTests.scala:29-362
runs the same statements through its JDBC driver)."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from kyuubi_spark.gateway import Engine
from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

# TTypeId enum ordinals (public TCLIService.thrift)
T_BOOL, T_I8, T_I16, T_I32, T_I64 = 0, 1, 2, 3, 4
T_FLOAT, T_DOUBLE, T_STR, T_TS, T_BIN = 5, 6, 7, 8, 9
T_ARR, T_MAP, T_STRUCT, T_DEC, T_NULL, T_DATE = 10, 11, 12, 15, 16, 17
T_IYM, T_IDT = 20, 21


@pytest.fixture(scope="module", params=["inproc", "process"])
def wire(request, spark, launched_wire):
    """The thrift-columnar lane runs against the in-proc engine AND
    through a gateway-launched engine OS process (the reference runs
    SparkDataTypeTests against server and engines alike, SURVEY §5);
    the per-type TTypeIds must survive the second hop via the
    forwarded-schema pass-through.  The arrow-session half is in-proc
    only (process-mode Arrow is covered by test_process_arrow_ipc)."""
    if request.param == "process":
        client = ThriftClient(launched_wire.host, launched_wire.port)
        client.open_session(user="wire", conf=launched_wire.launch_conf)
        yield client, None
        client.close_session()
        client.close()
        return
    svc = ThriftFrontendService(Engine(spark=spark)).start()
    client = ThriftClient(svc.host, svc.port)
    client.open_session(user="types")
    yield client, None
    client.close_session()
    client.close()
    svc.stop()


@pytest.fixture(scope="module")
def arrow_session(spark):
    eng = Engine(spark=spark)
    session = eng.open_session(user="types_arrow")
    yield session
    eng.close_session(session.handle)


def thrift_one(client: ThriftClient, sql: str):
    """-> (TTypeId of col 1, its fetched/rendered value)."""
    guid = client.execute(sql)
    tid = client.result_schema(guid)[0][1]
    rows = client.fetch(guid, 10)
    client.close_operation(guid)
    return tid, rows[0][0]


def arrow_one(session, sql: str):
    """-> (metadata TTypeId via the session schema, first arrow value)."""
    import pyarrow as pa

    from kyuubi_spark.gateway.thrift import _TYPE_ID, _simple

    op = session.execute_statement(
        sql, conf_overlay={"kyuubi.operation.result.format": "arrow"}
    )
    assert op.exception is None, op.exception
    field = op.get_result_set_schema().fields[0]
    tbl = pa.Table.from_batches(op.get_next_row_set(size=100))
    return _TYPE_ID.get(_simple(field.dataType), 7), tbl.column(0).to_pylist()[0]


# (label, statement, expected TTypeId, thrift-wire value, arrow value);
# ELLIPSIS = skip the value check for that lane
CASES = [
    ("null", "SELECT NULL AS col", T_NULL, None, None),
    ("boolean", "SELECT false AS col", T_BOOL, False, False),
    ("tinyint", "SELECT 1Y AS col", T_I8, 1, 1),
    ("smallint", "SELECT 1S AS col", T_I16, 1, 1),
    ("int", "SELECT 4 AS col", T_I32, 4, 4),
    ("bigint", "SELECT 4L AS col", T_I64, 4, 4),
    ("float", "SELECT CAST(1.2 AS FLOAT) AS col", T_FLOAT,
     pytest.approx(1.2, abs=1e-6), pytest.approx(1.2, abs=1e-6)),
    ("double", "SELECT 4.2D AS col", T_DOUBLE, 4.2, 4.2),
    ("string", "SELECT 'kyuubi' AS col", T_STR, "kyuubi", "kyuubi"),
    ("decimal", "SELECT 1.2BD AS col", T_DEC, "1.2", Decimal("1.2")),
    ("date", "SELECT DATE '2018-11-17' AS col", T_DATE,
     "2018-11-17", datetime.date(2018, 11, 17)),
    ("timestamp", "SELECT TIMESTAMP '2018-11-17 13:33:33' AS col", T_TS,
     "2018-11-17 13:33:33", datetime.datetime(2018, 11, 17, 13, 33, 33)),
    ("timestamp_ntz",
     "SELECT make_timestamp_ntz(2022, 03, 24, 18, 08, 31.8888) AS col",
     T_TS, "2022-03-24 18:08:31.8888",
     datetime.datetime(2022, 3, 24, 18, 8, 31, 888800)),
    ("binary", "SELECT CAST('kyuubi' AS BINARY) AS col", T_BIN,
     b"kyuubi", b"kyuubi"),
    ("daytime_interval", "SELECT INTERVAL 30 SECONDS AS col", T_IDT,
     "0 00:00:30.000000000", datetime.timedelta(seconds=30)),
    ("yearmonth_interval", "SELECT INTERVAL 3 MONTH AS col", T_IYM,
     "0-3", "0-3"),
    ("calendar_interval",
     "SELECT make_interval(0, 0, 0, 0, 1, 2, 3.5) AS col", T_STR,
     "1 hours 2 minutes 3.5 seconds", "1 hours 2 minutes 3.5 seconds"),
    ("variant", "SELECT parse_json('{\"a\":1}') AS col", T_STR,
     '{"a":1}', '{"a":1}'),
    ("array", "SELECT array(1) AS col", T_ARR, "[1]", [1]),
    ("array_null_element", "SELECT array(null) AS col", T_ARR,
     "[null]", [None]),
    ("map", "SELECT map(1, 2, 3, 4) AS col", T_MAP,
     "{1:2,3:4}", [(1, 2), (3, 4)]),
    ("map_null_value", "SELECT map(1, null) AS col", T_MAP,
     "{1:null}", [(1, None)]),
    ("struct", "SELECT named_struct('a', 2, 'b', 4) AS col", T_STRUCT,
     '{"a":2,"b":4}', {"a": 2, "b": 4}),
    ("struct_nulls", "SELECT named_struct('a', null, 'b', null) AS col",
     T_STRUCT, '{"a":null,"b":null}', {"a": None, "b": None}),
]


@pytest.mark.parametrize(
    "label,sql,tid,wire_val,_arrow_val",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_thrift_columnar(wire, label, sql, tid, wire_val, _arrow_val):
    client, _ = wire
    got_tid, got = thrift_one(client, sql)
    assert got_tid == tid
    assert got == wire_val


@pytest.mark.parametrize(
    "label,sql,tid,_wire_val,arrow_val",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_arrow_format(arrow_session, label, sql, tid, _wire_val, arrow_val):
    got_tid, got = arrow_one(arrow_session, sql)
    assert got_tid == tid
    if isinstance(got, datetime.datetime) and got.tzinfo is not None:
        # TIMESTAMP (with local tz) arrives tz-aware in the session zone;
        # the wall clock is the contract (NTZ stays naive)
        got = got.replace(tzinfo=None)
    assert got == arrow_val


def test_daytime_interval_reference_matrix(wire):
    """The full HIVE-style day-time table from SparkDataTypeTests
    .scala:251-277 — signs, carries, and millisecond fractions."""
    client, _ = wire
    for expr, want in {
        "interval 1 day 1 hour -60 minutes 30 seconds": "1 00:00:30.000000000",
        "interval 30 seconds 12345 milliseconds": "0 00:00:42.345000000",
        "-interval 2 day": "-2 00:00:00.000000000",
        "interval 25 hour": "1 01:00:00.000000000",
        "interval 1 hour 62 minutes": "0 02:02:00.000000000",
        "interval 1 day 1 hour -60 minutes": "1 00:00:00.000000000",
        "interval -60 minutes 30 seconds": "-0 00:59:30.000000000",
        "-interval 200 day": "-200 00:00:00.000000000",
        "interval 62 minutes": "0 01:02:00.000000000",
        "interval 1 day 1 hour": "1 01:00:00.000000000",
    }.items():
        tid, got = thrift_one(client, f"SELECT {expr} AS col")
        assert tid == T_IDT
        assert got == want, expr


def test_yearmonth_interval_reference_matrix(wire):
    """SparkDataTypeTests.scala:290-310."""
    client, _ = wire
    for expr, want in {
        "INTERVAL 2022 YEAR": "2022-0",
        "INTERVAL '2021-07' YEAR TO MONTH": "2021-7",
        "INTERVAL 3 MONTH": "0-3",
        "INTERVAL 241 MONTH": "20-1",
        "INTERVAL -1 year -25 MONTH": "-3-1",
        "INTERVAL 3 year -25 MONTH": "0-11",
    }.items():
        tid, got = thrift_one(client, f"SELECT {expr} AS col")
        assert tid == T_IYM
        assert got == want, expr


def test_nested_collections_render(wire):
    """Empty and nested collection forms (SparkDataTypeTests arrays/maps
    tests pin [] / {} / nested quoting)."""
    client, _ = wire
    for sql, want in [
        ("SELECT array() AS col", "[]"),
        ("SELECT map() AS col", "{}"),
        ("SELECT array('x') AS col", '["x"]'),
        ("SELECT struct('1', '2') AS col", '{"col1":"1","col2":"2"}'),
        ("SELECT array(array(1), array()) AS col", "[[1],[]]"),
    ]:
        _, got = thrift_one(client, sql)
        assert got == want, sql


def test_process_arrow_ipc(launched_wire):
    """Arrow results THROUGH a launched engine process: the confOverlay
    selecting arrow format forwards across both hops, the gateway
    re-serves the engine's RecordBatches as arrowBatch IPC payloads,
    and GetResultSetMetadata still reports the ORIGINAL logical schema
    (not the transport column)."""
    import io

    import pyarrow as pa

    client = ThriftClient(launched_wire.host, launched_wire.port)
    client.open_session(user="wire", conf=launched_wire.launch_conf)
    try:
        guid = client.execute(
            "SELECT id AS i, CONCAT('r', id) AS s FROM range(5) ORDER BY id",
            conf_overlay={"kyuubi.operation.result.format": "arrow"},
        )
        schema = client.result_schema(guid)
        assert schema == [("i", T_I64), ("s", T_STR)]
        rows = client.fetch(guid, 100)
        client.close_operation(guid)
        batches = []
        for (payload,) in rows:
            with pa.ipc.open_stream(io.BytesIO(payload)) as rd:
                batches.extend(rd)
        tbl = pa.Table.from_batches(batches)
        assert tbl.column("i").to_pylist() == list(range(5))
        assert tbl.column("s").to_pylist() == [f"r{i}" for i in range(5)]
    finally:
        client.close_session()
        client.close()


@pytest.fixture(scope="module")
def http_wire(spark):
    svc = ThriftFrontendService(Engine(spark=spark), transport="http").start()
    from kyuubi_spark.gateway.thrift import ThriftHttpClient

    client = ThriftHttpClient(svc.host, svc.port)
    client.open_session(user="types_http")
    yield client
    client.close_session()
    client.close()
    svc.stop()


@pytest.mark.parametrize(
    "label,sql,tid,wire_val",
    [(c[0], c[1], c[2], c[3]) for c in CASES
     if c[0] in ("daytime_interval", "yearmonth_interval", "variant",
                 "struct", "map", "decimal", "timestamp_ntz", "binary")],
    ids=lambda v: str(v)[:28],
)
def test_http_transport_types(http_wire, label, sql, tid, wire_val):
    """The HS2 HTTP transport serves the identical TTypeId + rendering
    for the tricky types (intervals, variant, nested, NTZ)."""
    got_tid, got = thrift_one(http_wire, sql)
    assert got_tid == tid
    assert got == wire_val

"""Cross-frontend parity: the same statement through every wire.

A user of the reference reaches the engine over HS2 thrift, REST, or the
Trino protocol; all must agree. This capstone test runs one typed query
through (a) the in-process gateway, (b) REST v1, (c) the thrift binary
frontend, and (d) the Trino protocol, and asserts identical row values.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService
from kyuubi_spark.gateway.trino import TrinoGateway

SQL = (
    "SELECT id AS i, CAST(id AS DOUBLE) / 4 AS d, CONCAT('r', id) AS s, "
    "id % 2 = 0 AS b FROM range(6) ORDER BY id"
)
EXPECT = [[i, i / 4, f"r{i}", i % 2 == 0] for i in range(6)]


@pytest.fixture(scope="module")
def engine(spark):
    from kyuubi_spark.gateway import Engine

    return Engine(spark=spark)


def test_inproc_and_rest_agree(engine):
    from kyuubi_spark.gateway.rest import RestGateway

    s = engine.open_session(user="parity")
    op = s.execute_statement(SQL)
    inproc = [list(r) for r in op.get_next_row_set(size=100)]
    assert inproc == EXPECT
    engine.close_session(s.handle)

    gw = RestGateway(engine).start()
    try:
        url = f"http://127.0.0.1:{gw.port}"

        def call(method, path, body=None):
            data = json.dumps(body).encode() if body is not None else None
            req = urllib.request.Request(url + path, data=data, method=method)
            if data:
                req.add_header("Content-Type", "application/json")
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())

        sid = call("POST", "/api/v1/sessions", {"user": "parity_rest"})["identifier"]
        op = call("POST", f"/api/v1/sessions/{sid}/operations", {"statement": SQL})
        rows = call("GET", f"/api/v1/operations/{op['identifier']}/rowset?maxrows=100")["rows"]
        assert rows == EXPECT
        call("DELETE", f"/api/v1/sessions/{sid}")
    finally:
        gw.shutdown()


def test_thrift_and_trino_agree(engine):
    thrift = ThriftFrontendService(engine).start()
    try:
        c = ThriftClient(thrift.host, thrift.port)
        c.open_session(user="parity_thrift")
        rows = c.fetch(c.execute(SQL), max_rows=100)
        assert rows == EXPECT
        c.close_session()
        c.close()
    finally:
        thrift.stop()

    trino = TrinoGateway(engine).start()
    try:
        req = urllib.request.Request(
            f"http://{trino.host}:{trino.port}/v1/statement",
            data=SQL.encode(),
            headers={"X-Trino-User": "parity_trino"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["data"] == EXPECT
    finally:
        trino.stop()


def test_launched_engine_agrees(launched_wire):
    """The parity statement through the LAUNCHED-ENGINE path (client ->
    gateway thrift frontend -> child engine OS process) returns the same
    typed rows as every in-proc frontend — the reference's shared
    behavior suites run against server AND engines (SURVEY §5)."""
    from kyuubi_spark.gateway.thrift import ThriftClient

    c = ThriftClient(launched_wire.host, launched_wire.port)
    c.open_session(user="wire", conf=launched_wire.launch_conf)
    try:
        rows = c.fetch(c.execute(SQL), max_rows=100)
        assert rows == EXPECT
    finally:
        c.close_session()
        c.close()


def test_launched_engine_log_and_conf_overlay(launched_wire):
    """Through the child process: (a) the operation LOG channel
    (fetchType=1) pipes the engine-side execution log back across both
    hops; (b) a per-statement confOverlay (plan-only mode) is honored by
    the ENGINE, proving TExecuteStatementReq.confOverlay forwarding."""
    from kyuubi_spark.gateway.thrift import ThriftClient

    c = ThriftClient(launched_wire.host, launched_wire.port)
    c.open_session(user="wire", conf=launched_wire.launch_conf)
    try:
        guid = c.execute("SELECT 1 AS one")
        log = c.fetch_log(guid)
        assert log and all(isinstance(ln, str) for ln in log)
        assert any("FINISHED" in ln or "state" in ln for ln in log)
        c.close_operation(guid)

        # plan-only overlay: the engine must return a plan STRING, not run
        guid = c.execute(
            "SELECT 1 AS one",
            conf_overlay={"kyuubi.operation.plan.only.mode": "optimize"},
        )
        rows = c.fetch(guid, 10)
        c.close_operation(guid)
        assert len(rows) == 1
        assert "one" in rows[0][0] or "Project" in rows[0][0]
    finally:
        c.close_session()
        c.close()


def test_binary_and_http_thrift_transports_agree(engine):
    """The two HS2 transport modes serve the identical dispatch table:
    same query, same schema ids, same rows."""
    from kyuubi_spark.gateway.thrift import (
        ThriftClient,
        ThriftFrontendService,
        ThriftHttpClient,
    )

    sql = "SELECT id, id * 2 AS dbl, CAST(id AS STRING) AS s FROM range(5) ORDER BY id"
    binary = ThriftFrontendService(engine).start()
    http = ThriftFrontendService(engine, transport="http").start()
    try:
        c1 = ThriftClient(binary.host, binary.port)
        c1.open_session(user="parity_bin")
        c2 = ThriftHttpClient(http.host, http.port)
        c2.open_session(user="parity_http")
        op1, op2 = c1.execute(sql), c2.execute(sql)
        assert c1.result_schema(op1) == c2.result_schema(op2)
        assert c1.fetch(op1, 100) == c2.fetch(op2, 100)
        c1.close_session(); c1.close()
        c2.close_session(); c2.close()
    finally:
        binary.stop()
        http.stop()


def test_launched_engine_metadata_ops(launched_wire):
    """JDBC metadata operations forwarded THROUGH the launched engine
    process: GetSchemas/GetTables/GetTypeInfo answer from the child and
    page back across both hops (KyuubiSyncThriftClient's verbatim
    metadata forwarding)."""
    from kyuubi_spark.gateway.thrift import ThriftClient

    c = ThriftClient(launched_wire.host, launched_wire.port)
    c.open_session(user="wire", conf=launched_wire.launch_conf)
    try:
        guid = c.metadata_op("GetSchemas")
        schemas = [r[0] for r in c.fetch(guid, 100)]
        assert "default" in schemas
        c.close_operation(guid)

        guid = c.metadata_op("GetTypeInfo")
        types = [r[0] for r in c.fetch(guid, 200)]
        assert "INT" in types and "STRING" in types
        c.close_operation(guid)

        guid = c.metadata_op("GetTables")
        c.fetch(guid, 10)  # shape only — the child has no tables yet
        c.close_operation(guid)
    finally:
        c.close_session()
        c.close()


def test_trino_frontend_through_launched_engine(launched_wire):
    """The Trino wire protocol in front of a LAUNCHED engine process:
    X-Trino-Session carries kyuubi.engine.launch.enabled, so the Trino
    client's query executes in the child and pages back through both
    hops — four frontends, one engine lifecycle."""
    from kyuubi_spark.gateway.trino import TrinoGateway

    trino = TrinoGateway(launched_wire.gateway).start()
    try:
        props = ",".join(
            f"{k}={v}" for k, v in launched_wire.launch_conf.items()
        )
        req = urllib.request.Request(
            f"http://{trino.host}:{trino.port}/v1/statement",
            data=SQL.encode(),
            headers={"X-Trino-User": "wire", "X-Trino-Session": props},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        while "data" not in out and out.get("nextUri"):
            with urllib.request.urlopen(out["nextUri"]) as r:
                out = json.loads(r.read())
        assert out["data"] == EXPECT
    finally:
        trino.stop()


def test_rest_frontend_through_launched_engine(launched_wire):
    """REST v1 in front of a LAUNCHED engine process: the session body's
    conf carries kyuubi.engine.launch.enabled, rows page back across
    both hops."""
    from kyuubi_spark.gateway.rest import RestGateway

    gw = RestGateway(launched_wire.gateway).start()
    try:
        url = f"http://127.0.0.1:{gw.port}"

        def call(method, path, body=None):
            data = json.dumps(body).encode() if body is not None else None
            req = urllib.request.Request(url + path, data=data, method=method)
            if data:
                req.add_header("Content-Type", "application/json")
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())

        sid = call("POST", "/api/v1/sessions", {
            "user": "wire", "conf": launched_wire.launch_conf,
        })["identifier"]
        op = call("POST", f"/api/v1/sessions/{sid}/operations",
                  {"statement": SQL})
        rows = call(
            "GET",
            f"/api/v1/operations/{op['identifier']}/rowset?maxrows=100",
        )["rows"]
        assert rows == EXPECT
        call("DELETE", f"/api/v1/sessions/{sid}")
    finally:
        gw.shutdown()


def test_launched_engine_python_exec(launched_wire):
    """ExecutePython THROUGH the child: the language confOverlay rides
    TExecuteStatementReq across both hops and the child's Python
    interpreter output pages back."""
    from kyuubi_spark.gateway.thrift import ThriftClient

    c = ThriftClient(launched_wire.host, launched_wire.port)
    c.open_session(user="wire", conf=launched_wire.launch_conf)
    try:
        guid = c.execute(
            "print(spark.sql('SELECT 40 + 2').collect()[0][0])",
            conf_overlay={"kyuubi.operation.language": "PYTHON"},
        )
        rows = c.fetch(guid, 10)
        c.close_operation(guid)
        out, status = rows[0]
        assert status == "ok" and out.strip() == "42"
    finally:
        c.close_session()
        c.close()


def test_query_timeout_over_the_wire(spark):
    """TExecuteStatementReq.queryTimeout (field 5, the JDBC
    setQueryTimeout plumbing): a 1s timeout on a heavy statement lands
    the operation in TIMEOUT/ERROR instead of running forever; the
    session stays usable."""
    import time

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

    svc = ThriftFrontendService(Engine(spark=spark)).start()
    c = ThriftClient(svc.host, svc.port)
    c.open_session(user="timeouter")
    try:
        guid = c.execute(
            "SELECT COUNT(*) FROM range(100000000) a CROSS JOIN range(100000) b",
            run_async=True,
            query_timeout=1,
        )
        deadline = time.time() + 60
        state = None
        while time.time() < deadline:
            state = c.operation_state(guid)
            if state in (3, 5, 8):  # CANCELED / ERROR / TIMEOUT
                break
            time.sleep(0.2)
        assert state == 8, f"expected TIMEOUT(8), got {state}"
        c.close_operation(guid)
        guid = c.execute("SELECT 1 AS one")
        assert c.fetch(guid, 5) == [[1]]
    finally:
        c.close_session()
        c.close()
        svc.stop()

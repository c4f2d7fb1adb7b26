"""Event bus + metrics surface (kyuubi-events / kyuubi-metrics parity):
session and operation lifecycle posts, counters/timers, JSON event log,
and the REST /metrics and /events endpoints."""

import json
import os
import sys
import urllib.request

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.gateway import Engine  # noqa: E402
from kyuubi_spark.gateway import metrics as M  # noqa: E402
from kyuubi_spark.gateway.events import EventBus, JsonFileEventLogger, make_event  # noqa: E402
from kyuubi_spark.gateway.metrics import MetricsRegistry  # noqa: E402


# -- unit: bus + registry ---------------------------------------------------
def test_event_bus_post_subscribe_filter():
    bus = EventBus()
    seen, typed = [], []
    bus.subscribe(seen.append)
    bus.subscribe(typed.append, event_type="B")
    bus.post(make_event("A", x=1))
    bus.post(make_event("B", x=2))
    assert [e["eventType"] for e in seen] == ["A", "B"]
    assert [e["eventType"] for e in typed] == ["B"]
    assert [e["eventType"] for e in bus.recent(10)] == ["A", "B"]
    assert [e["x"] for e in bus.recent(10, event_type="A")] == [1]


def test_event_bus_handler_errors_do_not_break_post(capsys):
    bus = EventBus()

    def bad(_):
        raise RuntimeError("boom")

    got = []
    bus.subscribe(bad)
    bus.subscribe(got.append)
    bus.post(make_event("A"))
    assert len(got) == 1  # later handler still ran


def test_json_file_event_logger(tmp_path):
    path = str(tmp_path / "events.jsonl")
    bus = EventBus()
    bus.subscribe(JsonFileEventLogger(path))
    bus.post(make_event("SessionOpened", user="u"))
    bus.post(make_event("SessionClosed", user="u"))
    lines = [json.loads(x) for x in open(path)]
    assert [e["eventType"] for e in lines] == ["SessionOpened", "SessionClosed"]


def test_metrics_registry_counters_and_timers():
    m = MetricsRegistry()
    m.inc("c")
    m.inc("c", 2)
    m.dec("c")
    m.update_timer("t", 0.5)
    m.update_timer("t", 1.5)
    snap = m.snapshot()
    assert snap["counters"]["c"] == 2
    assert snap["timers"]["t"]["count"] == 2
    assert snap["timers"]["t"]["maxSec"] == 1.5
    assert snap["timers"]["t"]["meanSec"] == 1.0


# -- engine lifecycle wiring ------------------------------------------------
@pytest.fixture(scope="module")
def engine(spark):
    yield Engine(spark=spark)


def test_session_lifecycle_events_and_metrics(engine):
    before_total = engine.metrics.count(M.CONN_TOTAL)
    s = engine.open_session(user="ev_user")
    assert engine.metrics.count(M.CONN_OPEN) >= 1
    assert engine.metrics.count(M.CONN_TOTAL) == before_total + 1
    engine.close_session(s.handle)
    events = [e["eventType"] for e in engine.events.recent(50)]
    assert "SessionOpened" in events and "SessionClosed" in events
    opened = [e for e in engine.events.recent(50, "SessionOpened")]
    assert opened[-1]["user"] == "ev_user"


def test_operation_state_events_and_timers(engine):
    s = engine.open_session(user="ev_user2")
    try:
        before = engine.metrics.count(M.OP_TOTAL)
        op = s.execute_statement("SELECT 1 AS x")
        assert engine.metrics.count(M.OP_TOTAL) == before + 1
        trans = [
            (e["fromState"], e["toState"])
            for e in engine.events.recent(100, "OperationStateChanged")
            if e["operationId"] == op.handle.id
        ]
        assert ("INITIALIZED", "PENDING") in trans or ("INITIALIZED", "RUNNING") in trans
        assert any(t[1] == "FINISHED" for t in trans)
        snap = engine.metrics.snapshot()
        assert snap["timers"][M.OP_EXEC_TIME]["count"] >= 1
    finally:
        engine.close_session(s.handle)


def test_failed_operation_counts(engine):
    s = engine.open_session(user="ev_user3")
    try:
        before = engine.metrics.count(M.OP_FAIL)
        s.execute_statement("SELECT * FROM definitely_not_a_table_xyz")
        assert engine.metrics.count(M.OP_FAIL) == before + 1
    finally:
        engine.close_session(s.handle)


def test_event_log_conf_writes_json_lines(spark, tmp_path):
    path = str(tmp_path / "gateway_events.jsonl")
    eng = Engine(
        spark=spark,
        conf={"kyuubi.backend.server.event.json.log.path": path},
    )
    s = eng.open_session(user="logged")
    s.execute_statement("SELECT 1 AS a")
    eng.close_session(s.handle)
    types = [json.loads(x)["eventType"] for x in open(path)]
    assert "SessionOpened" in types
    assert "OperationStateChanged" in types
    assert "SessionClosed" in types


# -- REST surface -----------------------------------------------------------
def test_rest_metrics_and_events_endpoints(spark):
    from kyuubi_spark.gateway.rest import RestGateway

    gw = RestGateway(Engine(spark=spark)).start()
    try:
        base = f"http://127.0.0.1:{gw.port}/api/v1"
        with urllib.request.urlopen(
            urllib.request.Request(f"{base}/sessions", data=b'{"user":"r"}',
                                   method="POST",
                                   headers={"Content-Type": "application/json"})
        ) as resp:
            sid = json.loads(resp.read())["identifier"]
        with urllib.request.urlopen(f"{base}/metrics") as resp:
            snap = json.loads(resp.read())
        assert snap["counters"][M.CONN_OPEN] >= 1
        with urllib.request.urlopen(f"{base}/events?type=SessionOpened") as resp:
            events = json.loads(resp.read())
        assert any(e["sessionId"] == sid for e in events)
    finally:
        gw.shutdown()


def test_prometheus_text_format():
    from kyuubi_spark.gateway.metrics import MetricsRegistry

    m = MetricsRegistry()
    m.inc("kyuubi.connection.total", 3)
    m.update_timer("kyuubi.operation.exec_time", 0.5)
    m.update_timer("kyuubi.operation.exec_time", 1.5)
    text = m.prometheus()
    assert "# TYPE kyuubi_connection_total gauge" in text
    assert "kyuubi_connection_total 3" in text
    assert "kyuubi_operation_exec_time_seconds_count 2" in text
    assert "kyuubi_operation_exec_time_seconds_sum 2.000000" in text
    assert "kyuubi_operation_exec_time_seconds_max 1.500000" in text
    # _max is NOT a legal series of a summary family — it must carry its
    # own TYPE line as a gauge, or strict scrapers reject the whole page
    assert "# TYPE kyuubi_operation_exec_time_seconds summary" in text
    assert "# TYPE kyuubi_operation_exec_time_seconds_max gauge" in text
    assert "kyuubi_uptime_seconds" in text


def test_rest_prometheus_endpoint(spark):
    """Top-level /metrics serves the Prometheus exposition format (the
    reference's PrometheusReporter path); JSON stays at /api/v1/metrics."""
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.rest import RestGateway

    svc = RestGateway(Engine(spark=spark)).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/metrics"
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "kyuubi_uptime_seconds" in text
    finally:
        svc.shutdown()


# -- per-operation accounting (EngineEventsStore + SQLOperationListener
#    shape: wall time, rows fetched, collect mode, transitions) -------------
def test_operation_accounting_store(engine):
    s = engine.open_session(user="acct_user")
    try:
        op = s.execute_statement("SELECT id FROM range(7) ORDER BY id")
        rows = op.get_next_row_set(size=100)
        assert len(rows) == 7
        rec = engine.op_store.get(op.handle.id)
        assert rec is not None
        assert rec["state"] == "FINISHED"
        assert rec["collectMode"] == "collect"
        assert rec["rowsFetched"] == 7
        assert rec["statement"].startswith("SELECT id FROM range")
        states = [t[0] for t in rec["transitions"]]
        assert states[0] == "INITIALIZED" and "RUNNING" in states
        assert states[-1] == "FINISHED"
        assert rec["duration"] >= 0
        # the record OUTLIVES close (the store's whole point)
        s.close_operation(op.handle)
        closed = engine.op_store.get(op.handle.id)
        assert closed["state"] == "CLOSED"
        assert closed["rowsFetched"] == 7
    finally:
        engine.close_session(s.handle)


def test_operation_accounting_collect_modes(engine):
    s = engine.open_session(user="acct_modes")
    try:
        op = s.execute_statement(
            "SELECT id FROM range(5)",
            conf_overlay={"kyuubi.operation.incremental.collect": "true"},
        )
        op.get_next_row_set(size=100)
        assert engine.op_store.get(op.handle.id)["collectMode"] == "incremental"
        op2 = s.execute_statement(
            "SELECT id FROM range(5)",
            conf_overlay={"kyuubi.operation.result.format": "arrow"},
        )
        op2.get_next_row_set(size=100)
        rec2 = engine.op_store.get(op2.handle.id)
        assert rec2["collectMode"] == "arrow"
        assert rec2["rowsFetched"] == 5  # batches count their num_rows
    finally:
        engine.close_session(s.handle)


def test_fetch_rows_metric_and_prometheus_scrape(spark):
    """VERDICT done-signal: execute a statement, then scrape the
    Prometheus text for its counters (exec-time timer + fetched rows)."""
    from kyuubi_spark.gateway.rest import RestGateway

    eng = Engine(spark=spark)
    svc = RestGateway(eng).start()
    try:
        s = eng.open_session(user="prom_user")
        op = s.execute_statement("SELECT id FROM range(42)")
        assert len(op.get_next_row_set(size=100)) == 42
        eng.close_session(s.handle)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/metrics"
        ) as r:
            text = r.read().decode()
        metrics = {}
        for line in text.splitlines():
            if line and not line.startswith("#"):
                name, _, val = line.partition(" ")
                metrics[name] = float(val)
        assert metrics["kyuubi_backend_service_fetch_result_rows_rate"] >= 42
        assert metrics["kyuubi_operation_exec_time_seconds_count"] >= 1
        assert metrics["kyuubi_operation_exec_time_seconds_sum"] > 0
        # REST accounting surface: list + per-id record
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/api/v1/operations"
        ) as r:
            records = json.loads(r.read())
        mine = [r for r in records if r["operationId"] == op.handle.id]
        assert mine and mine[0]["rowsFetched"] == 42
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/api/v1/operations/{op.handle.id}"
        ) as r:
            rec = json.loads(r.read())
        assert rec["collectMode"] == "collect"
    finally:
        svc.shutdown()


def test_operation_store_eviction_terminal_first():
    from kyuubi_spark.gateway.events import OperationEventsStore

    store = OperationEventsStore(max_records=4)
    for i in range(4):
        store.put(
            {"operationId": f"op{i}", "state": "FINISHED", "createTime": i}
        )
    store.put({"operationId": "live", "state": "RUNNING", "createTime": 99})
    assert store.count == 4
    assert store.get("op0") is None  # oldest terminal evicted first
    assert store.get("live") is not None

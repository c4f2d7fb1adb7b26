"""Data-agent operation: event stream, approval handshake, SQL tools."""

from __future__ import annotations

import time

import pytest

from kyuubi_spark.gateway.agent import execute_agent
from kyuubi_spark.gateway.state import OperationState


@pytest.fixture()
def session(spark):
    from kyuubi_spark.gateway import Engine

    engine = Engine(spark=spark)
    s = engine.open_session(user="agent_tester")
    yield s
    engine.close_session(s.handle)


def _wait_for_event(op, name: str, timeout: float = 10.0) -> dict:
    deadline = time.time() + timeout
    while time.time() < deadline:
        for e in op.events():
            if e["event"] == name:
                return e
        time.sleep(0.05)
    raise AssertionError(f"event {name} not emitted; got {op.events()}")


def test_agent_count_task_event_order(session):
    session.spark.range(7).createOrReplaceTempView("agent_t")
    op = execute_agent(session, "count agent_t", run_async=False)
    assert op.state is OperationState.FINISHED
    names = [e["event"] for e in op.events()]
    assert names == ["reasoning_delta", "tool_call", "tool_result", "final_result"]
    call = next(e for e in op.events() if e["event"] == "tool_call")
    assert call["tool"] == "run_sql" and "COUNT(*)" in call["arguments"]["sql"]
    rows = op.get_next_row_set()
    assert rows[0][0] == 7


def test_agent_approval_approve_path(session):
    session.spark.range(5).createOrReplaceTempView("agent_t2")
    op = execute_agent(session, "count agent_t2", require_approval=True)
    req = _wait_for_event(op, "approval_request")
    op.approve_tool_call(req["call_id"], approved=True)
    assert op.wait(20) is OperationState.FINISHED
    assert op.get_next_row_set()[0][0] == 5
    names = [e["event"] for e in op.events()]
    assert names.index("approval_request") < names.index("tool_result")


def test_agent_approval_deny_path(session):
    session.spark.range(5).createOrReplaceTempView("agent_t3")
    op = execute_agent(session, "sql: SELECT * FROM agent_t3", require_approval=True)
    req = _wait_for_event(op, "approval_request")
    op.approve_tool_call(req["call_id"], approved=False)
    assert op.wait(20) is OperationState.ERROR
    assert "denied" in str(op.exception)
    assert any(
        e["event"] == "tool_result" and e["status"] == "denied" for e in op.events()
    )


def test_agent_unplannable_task_errors(session):
    op = execute_agent(session, "make me a sandwich", run_async=False)
    assert op.state is OperationState.ERROR
    assert "cannot handle task" in str(op.exception)


def test_agent_events_mirrored_to_engine_bus(session):
    from kyuubi_spark.gateway.agent import execute_agent

    op = execute_agent(session, "sql: SELECT 1 AS x")
    op.wait(30)
    bus_events = [
        e
        for e in session.engine.events.recent(200)
        if e["eventType"].startswith("Agent")
        and e["operationId"] == op.handle.id
    ]
    kinds = {e["eventType"] for e in bus_events}
    assert {"Agenttool_call", "Agenttool_result", "Agentfinal_result"} <= kinds

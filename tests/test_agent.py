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


# -- deterministic NL planner (agent_planner.py): schema lookup → grounded
#    SQL draft → approval-gated execute → summarize ---------------------------
def test_agent_nl_planner_full_conversation(session):
    """VERDICT done-signal: a full approve-then-execute conversation —
    NL task → describe_table tool call → SQL drafted from the REAL
    schema → approval handshake → run_sql → summary turn."""
    session.spark.sql(
        "SELECT * FROM VALUES (1, 'a', 10.0), (2, 'a', 20.0), (3, 'b', 60.0) "
        "AS t(id, grp, val)"
    ).createOrReplaceTempView("agent_sales")
    op = execute_agent(
        session, "average val in agent_sales by grp", require_approval=True
    )
    # the schema lookup happens BEFORE the approval request (grounding)
    req = _wait_for_event(op, "approval_request")
    events_so_far = [e["event"] for e in op.events()]
    describe = next(e for e in op.events() if e.get("tool") == "describe_table")
    assert {c["name"] for c in
            next(e for e in op.events()
                 if e["event"] == "tool_result" and "columns" in e)["columns"]
            } == {"id", "grp", "val"}
    assert events_so_far.index("tool_result") < events_so_far.index(
        "approval_request"
    )
    assert describe["arguments"] == {"table": "agent_sales"}
    op.approve_tool_call(req["call_id"], approved=True)
    assert op.wait(30) is OperationState.FINISHED
    rows = op.get_next_row_set()
    assert [tuple(r) for r in rows] == [("a", 15.0), ("b", 60.0)]
    # the drafted SQL is grounded in the actual column names
    run = next(e for e in op.events() if e.get("tool") == "run_sql")
    assert "AVG(val)" in run["arguments"]["sql"]
    assert "GROUP BY grp" in run["arguments"]["sql"]
    # the summary turn closes the conversation before final_result
    names = [e["event"] for e in op.events()]
    assert names[-2:] == ["reasoning_delta", "final_result"]
    summary = [e for e in op.events() if e["event"] == "reasoning_delta"][-1]
    assert "2 groups" in summary["text"]


def test_agent_nl_count_and_top_n(session):
    session.spark.range(9).createOrReplaceTempView("agent_nl_t")
    op = execute_agent(
        session, "how many rows are in agent_nl_t?", run_async=False
    )
    assert op.state is OperationState.FINISHED
    assert op.get_next_row_set()[0][0] == 9
    summary = [e for e in op.events() if e["event"] == "reasoning_delta"][-1]
    assert "agent_nl_t has 9 rows" in summary["text"]

    op2 = execute_agent(session, "top 3 agent_nl_t by id", run_async=False)
    assert [r[0] for r in op2.get_next_row_set()] == [8, 7, 6]


def test_agent_nl_unknown_column_fails_with_grounding(session):
    session.spark.range(3).createOrReplaceTempView("agent_nl_t2")
    op = execute_agent(
        session, "average bogus_col in agent_nl_t2", run_async=False
    )
    assert op.state is OperationState.ERROR
    assert "bogus_col" in str(op.exception)
    assert "id" in str(op.exception)  # the REAL columns are named back

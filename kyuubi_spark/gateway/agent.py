"""Data-agent operation: event-streamed agent-over-data with tool approval.

Counterpart: the reference's kyuubi-data-agent-engine (SURVEY §2.I) —
ExecuteStatement streams ReasoningDelta/ToolCall/ToolResult/ApprovalRequest
events through the thrift fetch-log channel and exposes an ApproveToolCall
operation for human-in-the-loop
(externals/kyuubi-data-agent-engine/.../operation/ExecuteStatement.scala:33-140,
operation/ApproveToolCall.scala).

This container ships no LLM, so the PLANNER is a deterministic rule stub
(`_plan`) standing in for the model — swap it for a real completion call in
deployment. Everything around it is real and event-for-event shaped like
the reference: the operation state machine, the JSON event stream over the
operation log (the same channel `FetchResults(fetchType=log)` drains), the
approval handshake blocking the tool call, and SQL tools executing on the
session's SparkSession.
"""

from __future__ import annotations

import json
import re
import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T

from kyuubi_spark.gateway.operations import ArrayFetchIterator, Operation

_COUNT_RE = re.compile(r"^\s*count\s+(\w+)\s*$", re.IGNORECASE)
_SCHEMA_RE = re.compile(r"^\s*schema\s+of\s+(\w+)\s*$", re.IGNORECASE)
_SQL_RE = re.compile(r"^\s*sql:\s*(.+)$", re.IGNORECASE | re.DOTALL)


@dataclass
class _PendingApproval:
    call_id: str
    event: threading.Event = field(default_factory=threading.Event)
    approved: bool | None = None


class AgentDenied(RuntimeError):
    pass


def _plan(task: str) -> tuple[str, str]:
    """STUB planner: deterministic task → (reasoning, sql). A real
    deployment replaces this with an LLM completion; the operation protocol
    around it is unchanged."""
    m = _COUNT_RE.match(task)
    if m:
        return (
            f"The task asks for a row count of '{m.group(1)}'; "
            "I will run a COUNT(*) aggregation.",
            f"SELECT COUNT(*) AS n FROM {m.group(1)}",
        )
    m = _SCHEMA_RE.match(task)
    if m:
        return (
            f"The task asks for the shape of '{m.group(1)}'; "
            "I will DESCRIBE the table.",
            f"DESCRIBE {m.group(1)}",
        )
    m = _SQL_RE.match(task)
    if m:
        return ("The task supplies explicit SQL; I will execute it as-is.",
                m.group(1).strip())
    raise ValueError(f"agent planner cannot handle task: {task!r}")


class AgentOperation(Operation):
    """One agent task: plan → (approval?) → tool call → result rows.

    Events are JSON lines on the operation log, in reference order:
    reasoning_delta → tool_call → [approval_request] → tool_result →
    final_result. `approve_tool_call` is the ApproveToolCall endpoint.
    """

    def __init__(self, session, task: str, require_approval: bool = False,
                 approval_timeout: float = 60.0, **kw):
        super().__init__(session, **kw)
        self.task = task
        self.require_approval = require_approval
        self.approval_timeout = approval_timeout
        self._pending: _PendingApproval | None = None

    def _emit(self, event: str, **payload) -> None:
        self.log(json.dumps({"event": event, **payload}, sort_keys=True))
        # Mirror agent protocol events onto the engine bus so the same
        # audit surface (REST /events, JSON event log) sees tool calls and
        # approvals alongside session/operation lifecycle events.
        engine = getattr(self.session, "engine", None)
        if engine is not None and hasattr(engine, "events"):
            from kyuubi_spark.gateway.events import make_event

            engine.events.post(
                make_event(
                    f"Agent{event}",
                    operationId=self.handle.id,
                    sessionId=self.session.handle.id,
                    **payload,
                )
            )

    # -- ApproveToolCall (operation/ApproveToolCall.scala) ----------------
    def approve_tool_call(self, call_id: str, approved: bool) -> None:
        p = self._pending
        if p is None or p.call_id != call_id:
            raise KeyError(f"no pending tool call {call_id}")
        p.approved = approved
        p.event.set()

    def _run_sql_tool(self, sql: str) -> tuple:
        """One approval-gated run_sql tool call → (df, rows)."""
        call_id = uuid.uuid4().hex[:12]
        self._emit("tool_call", call_id=call_id, tool="run_sql",
                   arguments={"sql": sql})
        if self.require_approval:
            pending = _PendingApproval(call_id)
            self._pending = pending
            self._emit("approval_request", call_id=call_id)
            if not pending.event.wait(self.approval_timeout):
                raise TimeoutError(f"approval for {call_id} timed out")
            if not pending.approved:
                self._emit("tool_result", call_id=call_id, status="denied")
                raise AgentDenied(f"tool call {call_id} denied by user")
        df = self.session.spark.sql(sql)
        rows = df.collect()
        self._emit("tool_result", call_id=call_id, status="ok",
                   rows=len(rows))
        return df, rows

    def _execute(self) -> None:
        from kyuubi_spark.gateway import agent_planner as P

        intent = P.parse_nl(self.task)
        if intent is not None:
            # multi-turn conversation: schema lookup → grounded SQL draft
            # → execute → summarize (the reference agent's turn shape;
            # the planner is deterministic, agent_planner.py)
            self._emit(
                "reasoning_delta",
                text=f"To answer {self.task!r} I first need the schema "
                f"of {intent.table}.",
            )
            call_id = uuid.uuid4().hex[:12]
            self._emit("tool_call", call_id=call_id, tool="describe_table",
                       arguments={"table": intent.table})
            columns = [
                (f.name, f.dataType.simpleString())
                for f in self.session.spark.table(intent.table).schema.fields
            ]
            self._emit("tool_result", call_id=call_id, status="ok",
                       columns=[{"name": n, "type": t} for n, t in columns])
            reasoning, sql = P.draft_sql(intent, columns)
            self._emit("reasoning_delta", text=reasoning)
            df, rows = self._run_sql_tool(sql)
            self._emit("reasoning_delta", text=P.summarize(intent, rows))
        else:
            # direct command forms (count <t> / schema of <t> / sql: ...)
            # stay single-shot: the task already names the exact action
            reasoning, sql = _plan(self.task)
            self._emit("reasoning_delta", text=reasoning)
            df, rows = self._run_sql_tool(sql)
        self._emit("final_result")
        self.result_df = df
        self._schema = df.schema
        self._iter = ArrayFetchIterator(rows)

    def events(self) -> list[dict]:
        """Parsed event stream (what a client reassembles from fetch-log)."""
        out = []
        for line in self._log:
            try:
                rec = json.loads(line)
            except (json.JSONDecodeError, TypeError):
                continue
            if isinstance(rec, dict) and "event" in rec:
                out.append(rec)
        return out


def execute_agent(session, task: str, require_approval: bool = False,
                  run_async: bool = True, **kw) -> AgentOperation:
    """Session entry point (the data-agent engine's ExecuteStatement)."""
    op = AgentOperation(session, task, require_approval=require_approval,
                        should_run_async=run_async, **kw)
    # Route the agent's persisted relations into the owning session's cache
    # registry (same scope Session.execute_statement installs) so
    # Session.close() releases them; Operation.run() copies the context
    # into the async worker thread.
    from kyuubi_spark.caching import cache_scope

    with cache_scope(session._cached):
        op.run()
    if not run_async:
        op.wait()
    return session._register(op)

"""Lifecycle event bus + JSON event logging.

Python counterpart of the reference's event system:
- kyuubi-events/src/main/scala/org/apache/kyuubi/events/EventBus.scala —
  process-local post/subscribe keyed by event type;
- SparkOperation.setState posts state-transition events
  (externals/.../operation/SparkOperation.scala:134-153);
- JsonProtocol-style event serialization written as JSON lines
  (kyuubi-events .../handler/EventHandler implementations).

Events are plain dicts with an ``eventType`` plus payload; handlers are
callables. Posting never raises — a broken handler is logged to stderr and
dropped, as the reference's async event handling does.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from collections import deque
from collections.abc import Callable
from typing import Any

Event = dict[str, Any]
Handler = Callable[[Event], None]


def make_event(event_type: str, **payload: Any) -> Event:
    return {"eventType": event_type, "eventTime": time.time(), **payload}


class EventBus:
    """Process-local pub/sub with a bounded replay buffer.

    ``subscribe(handler, event_type=None)`` — None means all events.
    ``recent(n)`` — last events (for the REST/admin surface and tests).
    """

    def __init__(self, buffer_size: int = 1000):
        self._lock = threading.RLock()
        self._handlers: list[tuple[str | None, Handler]] = []
        self._buffer: deque[Event] = deque(maxlen=buffer_size)

    def subscribe(self, handler: Handler, event_type: str | None = None) -> None:
        with self._lock:
            self._handlers.append((event_type, handler))

    def post(self, event: Event) -> None:
        with self._lock:
            self._buffer.append(event)
            handlers = list(self._handlers)
        for etype, handler in handlers:
            if etype is not None and etype != event.get("eventType"):
                continue
            try:
                handler(event)
            except Exception as e:  # noqa: BLE001 - handlers must not break ops
                print(f"event handler error: {e}", file=sys.stderr)

    def recent(self, n: int = 100, event_type: str | None = None) -> list[Event]:
        with self._lock:
            events = list(self._buffer)
        if event_type is not None:
            events = [e for e in events if e.get("eventType") == event_type]
        return events[-n:]


class JsonFileEventLogger:
    """Append-only JSON-lines event log (the JsonLoggingEventHandler shape)."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

    def __call__(self, event: Event) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(event, default=str) + "\n")


class OperationEventsStore:
    """Bounded per-operation accounting store — the EngineEventsStore
    shape (externals/kyuubi-spark-sql-engine/.../events/EngineEventsStore
    .scala:33-72 over SparkOperationEvent): one summary record per
    operation id, upserted on every state transition and fetch, queryable
    after the operation closes.  Cleanup over the threshold removes
    FINISHED (terminal) records first, then active ones — the reference's
    two-step eviction."""

    _TERMINAL = {"FINISHED", "ERROR", "CANCELED", "CLOSED", "TIMEOUT"}

    def __init__(self, max_records: int = 200):
        self.max_records = max_records
        self._lock = threading.RLock()
        self._records: dict[str, dict] = {}  # insertion-ordered

    def put(self, summary: dict) -> None:
        op_id = summary["operationId"]
        with self._lock:
            self._records[op_id] = summary
            if len(self._records) > self.max_records:
                self._cleanup()

    def _cleanup(self) -> None:
        overflow = len(self._records) - self.max_records
        # pass 1: oldest terminal records
        for op_id in [
            k for k, r in self._records.items()
            if r.get("state") in self._TERMINAL
        ][:overflow]:
            del self._records[op_id]
            overflow -= 1
        # pass 2: oldest records outright (still over: all-active store)
        for op_id in list(self._records)[:max(0, overflow)]:
            del self._records[op_id]

    def get(self, operation_id: str) -> dict | None:
        with self._lock:
            return self._records.get(operation_id)

    def list(self) -> list[dict]:
        """All records ordered by createTime (getStatementList)."""
        with self._lock:
            return sorted(
                self._records.values(),
                key=lambda r: r.get("createTime", 0),
            )

    @property
    def count(self) -> int:
        with self._lock:
            return len(self._records)

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

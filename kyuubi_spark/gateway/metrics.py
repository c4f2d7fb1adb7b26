"""Gateway metrics registry.

Python counterpart of kyuubi-metrics (MetricsSystem + MetricsConstants):
thread-safe counters/gauges/timers with a JSON snapshot, exposed through the
REST frontend (the reference ships console/JSON/Prometheus reporters; the
snapshot here is the JSON-reporter shape).

Metric names follow the reference's MetricsConstants.scala:
  kyuubi.connection.opened / .total (+ per-user variants)
  kyuubi.operation.opened / .total / .failed (+ per-state counters)
  kyuubi.operation.exec_time (timer: count/sum/max)
"""

from __future__ import annotations

import threading
import time
from typing import Any

CONN_OPEN = "kyuubi.connection.opened"
CONN_TOTAL = "kyuubi.connection.total"
OP_OPEN = "kyuubi.operation.opened"
OP_TOTAL = "kyuubi.operation.total"
OP_FAIL = "kyuubi.operation.failed"
OP_STATE_PREFIX = "kyuubi.operation.state."
OP_EXEC_TIME = "kyuubi.operation.exec_time"
# backend-service fetch accounting (MetricsConstants.scala:78-79)
BS_FETCH_RESULT_ROWS = "kyuubi.backend_service.fetch_result_rows_rate"
BS_FETCH_LOG_ROWS = "kyuubi.backend_service.fetch_log_rows_rate"


class MetricsRegistry:
    def __init__(self):
        self._lock = threading.RLock()
        self._counters: dict[str, int] = {}
        self._timers: dict[str, dict[str, float]] = {}
        self._start = time.time()

    # -- counters ----------------------------------------------------------
    def inc(self, name: str, delta: int = 1) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0) + delta

    def dec(self, name: str, delta: int = 1) -> None:
        self.inc(name, -delta)

    def count(self, name: str) -> int:
        with self._lock:
            return self._counters.get(name, 0)

    # -- timers ------------------------------------------------------------
    def update_timer(self, name: str, seconds: float) -> None:
        with self._lock:
            t = self._timers.setdefault(name, {"count": 0, "sum": 0.0, "max": 0.0})
            t["count"] += 1
            t["sum"] += seconds
            t["max"] = max(t["max"], seconds)

    # -- reporting ---------------------------------------------------------
    def prometheus(self) -> str:
        """Prometheus text exposition format (the reference's
        PrometheusReporter, MetricsConf.scala:82-94 — served at the
        /metrics path).  Counter names sanitize dots to underscores;
        timers export a summary (_count/_sum) plus a separate _max gauge
        family — a bare <name>_max series under a summary TYPE is not
        legal exposition format and strict scrapers (promtool check
        metrics) reject the whole page.  Counters here may decrement
        (open-connection style), so they export as gauges."""

        def san(name: str) -> str:
            return "".join(
                c if c.isalnum() or c == "_" else "_" for c in name
            )

        lines: list[str] = []
        with self._lock:
            lines.append("# TYPE kyuubi_uptime_seconds gauge")
            lines.append(
                f"kyuubi_uptime_seconds {time.time() - self._start:.3f}"
            )
            for name, v in sorted(self._counters.items()):
                m = san(name)
                lines.append(f"# TYPE {m} gauge")
                lines.append(f"{m} {v}")
            for name, t in sorted(self._timers.items()):
                m = san(name) + "_seconds"
                lines.append(f"# TYPE {m} summary")
                lines.append(f"{m}_count {int(t['count'])}")
                lines.append(f"{m}_sum {t['sum']:.6f}")
                lines.append(f"# TYPE {m}_max gauge")
                lines.append(f"{m}_max {t['max']:.6f}")
        return "\n".join(lines) + "\n"

    def snapshot(self) -> dict[str, Any]:
        with self._lock:
            return {
                "uptimeSec": round(time.time() - self._start, 3),
                "counters": dict(sorted(self._counters.items())),
                "timers": {
                    k: {
                        "count": int(v["count"]),
                        "sumSec": round(v["sum"], 6),
                        "maxSec": round(v["max"], 6),
                        "meanSec": round(v["sum"] / v["count"], 6) if v["count"] else 0.0,
                    }
                    for k, v in sorted(self._timers.items())
                },
            }

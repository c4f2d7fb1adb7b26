"""Application operations — find/kill submitted Spark apps by their
KYUUBI tag.

The reference manages every submitted application (interactive engines
AND REST batches) through ``ApplicationOperation`` implementations —
YARN (by ``spark.yarn.tags``), Kubernetes (by the ``kyuubi-unique-tag``
driver label), and Jps for local masters
(kyuubi-server/.../engine/ApplicationOperation.scala,
JpsApplicationOperation.scala, KyuubiApplicationManager.scala:114-129):
the tag is stamped into the submit command at assembly time
(gateway/spark_submit.py tag_application), so ANY server — including
one that restarted and lost its process handles — can locate and kill
the app by tag alone.

This module is the local-master analog (JpsApplicationOperation): scan
``/proc/*/cmdline`` for processes carrying ``KYUUBI,<tag>`` in their
``spark.yarn.tags`` conf (or the K8s label form), report their state,
and kill them.  REST ``DELETE /api/v1/batches/{id}`` falls back to this
when the batch is not locally owned — the reference's
``BatchesResource.closeBatchSession`` → ``killApplicationByTag`` path.
"""

from __future__ import annotations

import os
import signal
import time


class ApplicationInfo:
    """ApplicationOperation.scala ApplicationInfo shape (subset)."""

    def __init__(self, id: str | None, state: str, error: str | None = None):
        self.id = id
        self.state = state  # RUNNING | NOT_FOUND | KILLED
        self.error = error

    def to_dict(self) -> dict:
        return {"id": self.id, "state": self.state, "error": self.error}


def _tag_markers(tag: str) -> tuple[str, str]:
    # the two places tag_application() stamps the tag
    return (f"KYUUBI,{tag}", f"kyuubi-unique-tag={tag}")


class LocalApplicationOperation:
    """JpsApplicationOperation analog over /proc cmdlines."""

    def _find_pids(self, tag: str) -> list[int]:
        yarn_m, k8s_m = _tag_markers(tag)
        out = []
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/cmdline", "rb") as f:
                    cmdline = f.read().decode("utf-8", errors="replace")
            except OSError:
                continue  # raced a process exit
            if yarn_m in cmdline or k8s_m in cmdline:
                out.append(int(entry))
        return out

    def get_application_info_by_tag(self, tag: str) -> ApplicationInfo:
        pids = self._find_pids(tag)
        if not pids:
            return ApplicationInfo(None, "NOT_FOUND")
        return ApplicationInfo(f"local-pid-{min(pids)}", "RUNNING")

    def kill_application_by_tag(
        self, tag: str, timeout: float = 10.0
    ) -> tuple[bool, str]:
        """(killed?, message) — the reference's killApplicationByTag
        contract. SIGTERM first (Spark's shutdown hooks run), SIGKILL
        stragglers at the deadline."""
        pids = self._find_pids(tag)
        if not pids:
            return False, f"no local application found with tag {tag}"
        for pid in pids:
            try:
                os.kill(pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
        deadline = time.time() + timeout
        while time.time() < deadline:
            if not self._find_pids(tag):
                return True, f"killed {len(pids)} process(es) tagged {tag}"
            time.sleep(0.1)
        for pid in self._find_pids(tag):
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        return True, (
            f"killed {len(pids)} process(es) tagged {tag} (SIGKILL after "
            f"{timeout}s)"
        )

"""Shared broadcast size-gating helper for iterative graph/set operators.

Checkpointed or cached relations lose their size statistics, so the
planner falls back to sort-merge and shuffles the big side even when the
small side is a few thousand rows (guide §3.1: estimates are wrong after
checkpoints — hint when you KNOW a side is small).  The iterative
operators (k-core peeling, BFS frontiers, rich-club hub sets) therefore
gate an explicit ``F.broadcast`` on a row-count bound times an estimated
row width, compared against the session's configured broadcast budget —
past the budget the gate disappears and the plain keyed joins stand, so
the same code is correct when the set blows up at scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def broadcast_budget(spark: SparkSession) -> int:
    """Session broadcast budget in bytes from
    ``spark.sql.autoBroadcastJoinThreshold`` (suffix forms like ``10MB``
    / ``10485760b`` included); ``-1`` (broadcast disabled) maps to -1 so
    size gates comparing ``estimate <= budget`` never broadcast."""
    try:
        raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        return 10 * 1024 * 1024
    v = raw.strip().lower()
    mult = 1
    for suf, m in (
        ("kb", 1024), ("mb", 1024 ** 2), ("gb", 1024 ** 3),
        ("k", 1024), ("m", 1024 ** 2), ("g", 1024 ** 3), ("b", 1),
    ):
        if v.endswith(suf):
            v, mult = v[: -len(suf)], m
            break
    try:
        return int(float(v)) * mult
    except ValueError:
        return 10 * 1024 * 1024

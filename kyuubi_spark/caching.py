"""Session-scoped cache tracking for persisted intermediate relations.

The dedup/fingerprint operators persist self-joined intermediate relations
(shingle arrays, LSH signatures, winnowing fingerprints) so one expensive
computation feeds both join sides.  The persist is load-bearing for the
plan — but the builders hand back a DataFrame whose action runs later, so
they cannot unpersist themselves.  In a short-lived job that is fine (the
executor exits); in a long-lived gateway session the cached relations
accumulate (kyuubi's engines face the same issue and bound it with engine
TTLs, ``EngineRef.scala``).

Policy here: every operator-internal persist registers through
``persisted()``; whoever drives many queries through one session (bench
harness, gateway session close, registry verify loop) calls
``release_caches()`` after materializing results.  Releasing is safe at
any point — an unpersisted relation recomputes on next use, it never
breaks correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persisted(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist() + register for later release via release_caches()."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked relation; returns how many were released.

    blocking=False: release is a bookkeeping operation, the block manager
    drops the partitions asynchronously.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped or relation GC'd — nothing to free
            pass
    return n

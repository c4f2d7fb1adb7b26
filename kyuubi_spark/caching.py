"""Scoped cache tracking for persisted intermediate relations.

The dedup/fingerprint operators persist self-joined intermediate relations
(shingle arrays, LSH signatures, winnowing fingerprints) so one expensive
computation feeds both join sides.  The persist is load-bearing for the
plan — but the builders hand back a DataFrame whose action runs later, so
they cannot unpersist themselves.  In a short-lived job that is fine (the
executor exits); in a long-lived gateway session the cached relations
accumulate (kyuubi's engines face the same issue and bound it with engine
TTLs, ``EngineRef.scala``).

Registration is SCOPED: ``persisted()`` appends to the registry installed
by the innermost ``cache_scope(...)`` (a plain list), falling back to a
process-global registry when no scope is active.  A gateway ``Session``
owns its own registry and installs it around statement execution, so
``Session.close()`` releases only that session's relations — closing one
session can no longer unpersist relations that are load-bearing for
another still-open session's in-flight dedup plans.  Single-session
drivers (bench harness, registry verify loop, tests) keep calling
``release_caches()`` with no arguments and drain the global registry as
before.

Releasing is safe at any point — an unpersisted relation recomputes on
next use, it never breaks correctness.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Process-global fallback registry (no active scope).
_TRACKED: list[DataFrame] = []

# Innermost active scope; None → fall back to _TRACKED.
_SCOPE: ContextVar[list[DataFrame] | None] = ContextVar(
    "kyuubi_spark_cache_scope", default=None
)


def _current_registry() -> list[DataFrame]:
    scope = _SCOPE.get()
    return scope if scope is not None else _TRACKED


@contextlib.contextmanager
def cache_scope(registry: list[DataFrame] | None = None):
    """Route ``persisted()`` registrations into ``registry`` for the block.

    Pass a session-owned list to give that session exclusive release
    rights over the persists its queries create (the gateway ``Session``
    does exactly this); omit it for an anonymous scope released when
    the caller sees fit.
    """
    reg: list[DataFrame] = registry if registry is not None else []
    token = _SCOPE.set(reg)
    try:
        yield reg
    finally:
        _SCOPE.reset(token)


def persisted(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist() + register in the current scope for later release."""
    out = df.persist(level)
    _current_registry().append(out)
    return out


def release_caches(registry: list[DataFrame] | None = None) -> int:
    """Unpersist every relation tracked in ``registry``; returns how many
    were released.

    With no argument this drains the PROCESS-GLOBAL registry explicitly —
    not the innermost scope — so the single-session drivers (bench,
    tools/verify.py, tests) keep their drain-everything semantics even if
    a future caller ends up nested inside a ``cache_scope`` block.  Scope
    owners hold their own list and pass it (``Session.close()`` does).

    blocking=False: release is a bookkeeping operation, the block manager
    drops the partitions asynchronously.
    """
    reg = registry if registry is not None else _TRACKED
    n = 0
    while reg:
        df = reg.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped or relation GC'd — nothing to free
            pass
    return n

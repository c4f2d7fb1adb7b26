"""Operation lifecycle state machine + handles.

Mirrors the reference's OperationState
(kyuubi-common/.../operation/OperationState.scala:30-57): states
INITIALIZED → PENDING → RUNNING → COMPILED → FINISHED / TIMEOUT / CANCELED /
CLOSED / ERROR with an explicit legal-transition table, enforced on every
setState.
"""

from __future__ import annotations

import enum
import uuid
from dataclasses import dataclass, field


class OperationState(enum.Enum):
    INITIALIZED = "INITIALIZED"
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    COMPILED = "COMPILED"
    FINISHED = "FINISHED"
    TIMEOUT = "TIMEOUT"
    CANCELED = "CANCELED"
    CLOSED = "CLOSED"
    ERROR = "ERROR"

    @property
    def is_terminal(self) -> bool:
        return self in _TERMINAL


_TERMINAL = {
    OperationState.FINISHED,
    OperationState.TIMEOUT,
    OperationState.CANCELED,
    OperationState.CLOSED,
    OperationState.ERROR,
}

# Legal transitions (OperationState.scala:30-57 isTerminal/validate shape).
_LEGAL: dict[OperationState, set[OperationState]] = {
    OperationState.INITIALIZED: {
        OperationState.PENDING,
        OperationState.RUNNING,
        OperationState.TIMEOUT,
        OperationState.CANCELED,
        OperationState.CLOSED,
        OperationState.ERROR,
    },
    OperationState.PENDING: {
        OperationState.RUNNING,
        OperationState.FINISHED,
        OperationState.TIMEOUT,
        OperationState.CANCELED,
        OperationState.CLOSED,
        OperationState.ERROR,
    },
    OperationState.RUNNING: {
        OperationState.COMPILED,
        OperationState.FINISHED,
        OperationState.TIMEOUT,
        OperationState.CANCELED,
        OperationState.CLOSED,
        OperationState.ERROR,
    },
    OperationState.COMPILED: {
        OperationState.FINISHED,
        OperationState.TIMEOUT,
        OperationState.CANCELED,
        OperationState.CLOSED,
        OperationState.ERROR,
    },
    # Terminal states may only move to CLOSED (cursor cleanup).
    OperationState.FINISHED: {OperationState.CLOSED},
    OperationState.TIMEOUT: {OperationState.CLOSED},
    OperationState.CANCELED: {OperationState.CLOSED},
    OperationState.ERROR: {OperationState.CLOSED},
    OperationState.CLOSED: set(),
}


class IllegalStateTransition(RuntimeError):
    pass


def validate_transition(old: OperationState, new: OperationState) -> None:
    if new not in _LEGAL[old]:
        raise IllegalStateTransition(f"illegal transition {old.value} -> {new.value}")


class FetchOrientation(enum.Enum):
    FETCH_NEXT = "FETCH_NEXT"
    FETCH_PRIOR = "FETCH_PRIOR"
    FETCH_FIRST = "FETCH_FIRST"


@dataclass(frozen=True)
class SessionHandle:
    id: str = field(default_factory=lambda: str(uuid.uuid4()))


@dataclass(frozen=True)
class OperationHandle:
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

"""Ephemeral scratch directories for query-path roundtrip harnesses.

Streaming replay harnesses and write/read-back queries create short-lived
scratch trees — source slice files, streaming checkpoints, roundtrip
sinks — that are deleted before the query returns.  Their cost is almost
pure I/O latency: a streaming microbatch commits an offsets log entry, a
commit log entry and per-partition state-store delta files, i.e. dozens
of tiny create+rename operations per batch, multiplied by every batch of
every streaming query.

These files never need to survive the query, let alone a process crash,
so durability buys nothing; place them on a RAM-backed tmpfs when one is
available (``/dev/shm``) instead of the disk-backed default tmp.  A
production always-on stream keeps its checkpoint on durable shared
storage for fault tolerance — the replay harness instead re-runs from
the bounded source on failure, which is why RAM scratch is sound here.
``SPARK_GRAFT_SCRATCH_DIR`` overrides the location (set it to a disk
path to reproduce the durable-checkpoint cost profile).

Not used for gateway result-spill or engine work dirs: those outlive a
single query and are sized to result sets, so they stay on disk.
"""

from __future__ import annotations

import os
import tempfile


def _scratch_root() -> str | None:
    root = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if root:
        os.makedirs(root, exist_ok=True)
        return root
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return None  # tempfile's platform default


def scratch_dir(prefix: str) -> str:
    """mkdtemp on the fastest suitable filesystem (see module doc)."""
    return tempfile.mkdtemp(prefix=prefix, dir=_scratch_root())

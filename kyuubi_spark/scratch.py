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

tmpfs is RAM-backed and typically capped at ~50% of memory, so it is for
METADATA-SCALE scratch only: checkpoint logs, bounded microbatch slices,
result-sized sinks.  Writers whose output scales with the INPUT TABLES
(full-table roundtrips, CTAS of a table projection) must pass
``data_scale=True``, which keeps them on the disk-backed default — at a
big-memory scale factor a table copy on tmpfs competes with executor
memory and risks ENOSPC mid-write (ADVICE r13).  A free-space guard also
skips the tmpfs when less than ~1 GiB is free.

Not used for gateway result-spill or engine work dirs: those outlive a
single query and are sized to result sets, so they stay on disk.
"""

from __future__ import annotations

import os
import tempfile

# Minimum free bytes on the tmpfs before we place even metadata-scale
# scratch there — below this a burst of state-store deltas could fill it.
_SHM_MIN_FREE = 1 << 30


def _scratch_root(data_scale: bool = False) -> str | None:
    root = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if root:
        # explicit override wins for every caller — the operator chose it
        os.makedirs(root, exist_ok=True)
        return root
    if data_scale:
        return None  # input-table-sized writes stay on disk (module doc)
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize < _SHM_MIN_FREE:
                return None
        except OSError:
            return None
        return shm
    return None  # tempfile's platform default


def scratch_dir(prefix: str, data_scale: bool = False) -> str:
    """mkdtemp on the fastest suitable filesystem (see module doc).

    ``data_scale=True`` marks a writer whose bytes scale with the input
    tables rather than with a result set; those never land on tmpfs.
    """
    return tempfile.mkdtemp(prefix=prefix, dir=_scratch_root(data_scale))

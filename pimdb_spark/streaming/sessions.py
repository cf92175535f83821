"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.9 — the reference has no streaming;
this is the beyond-parity continuous form of catalog_temporal.q_sessionize,
whose batch output it must match on a single drained batch — the tests
assert that).

State per user: (last_ts_us, session_id, session_start_us, n_events) —
O(1) per key, carried across micro-batches so a session spanning batches
keeps its id and counts.  Output mode "update": each batch re-emits every
session it touched with refreshed stats.

Scale: state is keyed by user_id and lives in the state store (RocksDB on
a real cluster); each micro-batch shuffles only its own events on user_id.
``idle_timeout_ms`` arms a ProcessingTimeTimeout per key: a user whose
state sees no events for that long is EVICTED at the next trigger — this
is what bounds state size by the active-user set instead of the all-time
user set at 100 TB.  (An evicted user who later returns starts again at
session_id 1 — the documented trade of idle eviction.)  Default is
NoTimeout so the drained-batch equality tests stay deterministic.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, same as the batch twin

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_us", LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int = 0,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if idle_timeout_ms and state.hasTimedOut:
        # idle eviction: drop the key's state, re-emitting the closing
        # snapshot of its last session — the "session finalized" record
        # (same stats update mode already emitted as the session grew, so
        # downstream upserts are unchanged; it also makes eviction
        # observable, which the eviction test polls for)
        if state.exists:
            last_ts, session_id, session_start, n_events = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_id": [session_id],
                    "n_events": [n_events],
                    "duration_us": [last_ts - session_start],
                }
            )
        else:
            state.remove()
        return
    if state.exists:
        last_ts, session_id, session_start, n_events = state.get
    else:
        last_ts, session_id, session_start, n_events = None, 0, 0, 0

    touched: dict[int, list[int]] = {}  # session_id -> [start, end, n]
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts in pdf["ts_us"]:
            ts = int(ts)
            if last_ts is None or ts - last_ts > SESSION_GAP_US:
                session_id += 1
                session_start, n_events = ts, 0
            n_events += 1
            last_ts = ts
            touched[session_id] = [session_start, ts, n_events]

    state.update((last_ts, session_id, session_start, n_events))
    if idle_timeout_ms:
        state.setTimeoutDuration(idle_timeout_ms)
    if touched:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(touched),
                "session_id": list(touched),
                "n_events": [v[2] for v in touched.values()],
                "duration_us": [v[1] - v[0] for v in touched.values()],
            }
        )


def sessionize_stream(events: DataFrame, idle_timeout_ms: int = 0) -> DataFrame:
    """events (user_id, ts_us, event_id, ...) -> per-session stats,
    maintained incrementally across micro-batches.  ``idle_timeout_ms``
    > 0 evicts a user's state after that much processing-time idleness
    (see module docstring for the state-bound rationale).

    Use idle_timeout_ms only with a continuous trigger (processingTime):
    with Trigger.AvailableNow an armed processing-time timeout keeps the
    drain alive firing empty timeout batches instead of terminating."""
    if idle_timeout_ms:
        def fn(key, pdfs, state):
            return _sessionize_group(key, pdfs, state, idle_timeout_ms)

        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        fn = _sessionize_group
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )

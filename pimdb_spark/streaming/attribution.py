"""Stateful streaming last-touch attribution (applyInPandasWithState) —
the continuous twin of operators/analytics.last_touch_attribution, whose
batch output it must match on a single drained batch (the tests assert
that, the house rule for every streaming twin).

State per user: the most recent touch event as (ts_us, event_id,
event_type) — O(1) per key, carried across micro-batches so a touch in
one batch attributes a conversion arriving in a later one.  Events inside
a batch are processed in (ts_us, event_id) order, which reproduces the
batch operator's strictly-preceding frame exactly: a conversion emits
BEFORE a same-timestamp touch with a larger event_id updates the carry,
and a conversion that is itself a touch type updates the carry only
after emitting — so it never attributes to itself but can be the touch
for a later conversion.

Cross-batch exactness holds when micro-batches arrive in event-time
order (the file-source ingest pattern); out-of-order arrival across
batches attributes against the state as of processing — the standard
streaming trade, called out here rather than hidden.

Scale: state is one row per ACTIVE user in the state store (RocksDB on a
real cluster); each micro-batch shuffles only its own events on user_id.
``idle_timeout_ms`` > 0 arms a ProcessingTimeTimeout that evicts idle
users' carried touches, bounding state by the active-user set (an
evicted user's next conversion is unattributed — the idle-eviction
trade, same as streaming/sessions.py)."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("touch_ts_us", LongType()),
        StructField("touch_event_id", LongType()),
        StructField("touch_type", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conversion_id", LongType()),
        StructField("user_id", LongType()),
        StructField("conv_ts_us", LongType()),
        StructField("touch_event_id", LongType()),
        StructField("touch_type", StringType()),
        StructField("age_us", LongType()),
    ]
)


def _attribute_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    conversion_type: str,
    touch_types: frozenset[str],
    horizon_us: int,
    idle_timeout_ms: int = 0,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if idle_timeout_ms and state.hasTimedOut:
        state.remove()
        return
    touch = state.get if state.exists else None  # (ts, id, typ)
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts, eid, typ in zip(pdf["ts_us"], pdf["event_id"], pdf["event_type"]):
            ts, eid, typ = int(ts), int(eid), str(typ)
            if typ == conversion_type:
                if touch is not None and touch[0] >= ts - horizon_us:
                    out.append(
                        (eid, user_id, ts, touch[1], touch[2], ts - touch[0])
                    )
                else:
                    out.append((eid, user_id, ts, None, None, None))
            if typ in touch_types:
                touch = (ts, eid, typ)
    if touch is not None:
        state.update(touch)
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "conversion_id",
                "user_id",
                "conv_ts_us",
                "touch_event_id",
                "touch_type",
                "age_us",
            ],
        )


def attribute_stream(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    horizon_us: int,
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """events (user_id, ts_us, event_id, event_type, ...) -> one
    attribution row per conversion, in append mode (each conversion is
    final the moment it is processed — last-touch needs no retraction).

    Use idle_timeout_ms only with a continuous trigger (processingTime):
    with Trigger.AvailableNow an armed processing-time timeout keeps the
    drain alive firing empty timeout batches instead of terminating."""
    tt = frozenset(touch_types)

    def fn(key, pdfs, state):
        return _attribute_group(
            key, pdfs, state, conversion_type, tt, horizon_us, idle_timeout_ms
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )

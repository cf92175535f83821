"""Stateful streaming LINEAR (multi-touch) attribution
(applyInPandasWithState) — the continuous twin of
operators/analytics.linear_attribution, whose batch output it must match
on a single drained batch (the house rule for every streaming twin; the
tests assert it against catalog q_linear_attribution).

State per user: the list of in-horizon touches as three parallel arrays
(ts_us, event_id, event_type) — bounded by the HORIZON, not the stream:
every touch older than ``newest event ts - horizon_us`` is pruned each
time the state is written, so state size is the per-user touch count
within one horizon window (the same bound the batch operator's
two-bucket probe exploits).  Events inside a batch are processed in
(ts_us, event_id) order, reproducing the batch strictly-preceding frame
exactly: a conversion emits BEFORE a same-timestamp touch with a larger
event_id joins the carry, and a conversion of a touch type joins the
carry only after emitting — it never credits itself (the r9
last-touch-attribution tie rule, analytics.py:114).

Credit: each conversion emits one row per in-horizon touch with
n_touches = count and weight = 1/n (one IEEE division of exact integers,
engine-exact); no in-horizon touch -> one NULL-touch row with
n_touches = 0 and NULL weight, keeping the conversion count auditable.
Append mode is correct because linear credit is final at conversion
time — later events never retract an emitted split (unlike streaming
co-occurrence edges, which need tombstones).

Cross-batch exactness holds when micro-batches arrive in event-time
order (the file-source ingest pattern); out-of-order arrival across
batches attributes against the state as of processing — the standard
streaming trade, called out here rather than hidden.

Scale: state is one horizon's worth of touches per ACTIVE user (RocksDB
state store on a real cluster); each micro-batch shuffles only its own
events on user_id.  ``idle_timeout_ms`` > 0 arms a ProcessingTimeTimeout
that evicts idle users' touch lists, bounding state by the active-user
set — an evicted user's next conversion is unattributed, the same
idle-eviction trade as streaming/sessions.py and attribution.py."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("touch_ts", ArrayType(LongType())),
        StructField("touch_id", ArrayType(LongType())),
        StructField("touch_typ", ArrayType(StringType())),
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
        StructField("n_touches", LongType()),
        StructField("weight", DoubleType()),
    ]
)

_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


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
    if state.exists:
        ts_l, id_l, ty_l = state.get
        touches = list(zip(ts_l, id_l, ty_l))
    else:
        touches = []  # [(ts, eid, typ)] ascending (ts, eid)
    out: list[tuple] = []
    last_ts = touches[-1][0] if touches else None
    # Concat-then-sort across ALL Arrow chunks (see streaming/cohort.py):
    # a per-chunk sort would process a later chunk's earlier event after an
    # earlier chunk's later one — a conversion could miss a touch that
    # precedes it within the same micro-batch.  Chunk splits are an Arrow
    # batching artifact; the in-batch order contract is (ts_us, event_id).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        for ts, eid, typ in zip(pdf["ts_us"], pdf["event_id"], pdf["event_type"]):
            ts, eid, typ = int(ts), int(eid), str(typ)
            if typ == conversion_type:
                hits = [t for t in touches if t[0] >= ts - horizon_us]
                n = len(hits)
                if n:
                    for tts, tid, tty in hits:
                        out.append(
                            (eid, user_id, ts, tid, tty, ts - tts, n, 1.0 / n)
                        )
                else:
                    out.append((eid, user_id, ts, None, None, None, 0, None))
            if typ in touch_types:
                touches.append((ts, eid, typ))
                last_ts = ts
    if touches and last_ts is not None:
        # horizon prune: anything too old to credit ANY future conversion
        # (conversions arrive in event-time order >= last seen ts)
        touches = [t for t in touches if t[0] >= last_ts - horizon_us]
    if touches:
        state.update(
            (
                [t[0] for t in touches],
                [t[1] for t in touches],
                [t[2] for t in touches],
            )
        )
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
    if out:
        yield pd.DataFrame(out, columns=_COLS)


def linear_attribute_stream(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    horizon_us: int,
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """events (user_id, ts_us, event_id, event_type, ...) -> one credit
    row per (conversion, in-horizon touch) plus a NULL row per
    unattributed conversion, in append mode (linear credit is final at
    conversion time).

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

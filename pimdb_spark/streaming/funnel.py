"""Stateful streaming funnel (applyInPandasWithState) — the continuous
twin of operators/analytics.funnel_steps, whose batch output it must
match on a single drained batch (asserted by the tests, the house rule
for streaming twins).

State per user: the step-completion timestamps reached so far
(t_1..t_n) — O(steps) per key.  Events inside a batch process in
(ts_us, event_id) order; because the batch operator's t_k is "minimum
step-k time strictly after t_{k-1}" and events arrive time-ordered,
first-seen-in-order IS that minimum, so the sequential update reproduces
the batch semantics exactly (including same-timestamp ties: ts > t_{k-1}
is strict on both sides).

Cross-batch exactness holds when micro-batches arrive in event-time
order (the file-source ingest pattern); a late-arriving earlier step
cannot retroactively lower an already-set t_k — the standard streaming
trade, stated rather than hidden.

Scale: state is |steps| longs per ACTIVE user; each micro-batch shuffles
only its own events on user_id.  Update output mode: a user's row
re-emits whenever their funnel state may have advanced."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _schemas(n_steps: int) -> tuple[StructType, StructType]:
    state = StructType(
        [StructField(f"t{k}", LongType()) for k in range(1, n_steps + 1)]
    )
    out = StructType(
        [StructField("user_id", LongType())]
        + [StructField(f"t{k}", LongType()) for k in range(1, n_steps + 1)]
        + [StructField("steps_reached", IntegerType())]
    )
    return state, out


def _funnel_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    steps: list[str],
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    ts_reached: list[int | None] = list(state.get) if state.exists else [None] * len(steps)
    saw_events = False
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts, typ in zip(pdf["ts_us"], pdf["event_type"]):
            saw_events = True
            ts, typ = int(ts), str(typ)
            for k, step in enumerate(steps):
                if typ != step or ts_reached[k] is not None:
                    continue
                if k == 0 or (
                    ts_reached[k - 1] is not None and ts > ts_reached[k - 1]
                ):
                    ts_reached[k] = ts
    state.update(tuple(ts_reached))
    if saw_events:
        reached = sum(1 for t in ts_reached if t is not None)
        yield pd.DataFrame(
            [[user_id, *ts_reached, reached]],
            columns=["user_id"]
            + [f"t{k}" for k in range(1, len(steps) + 1)]
            + ["steps_reached"],
        )


def funnel_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """events (user_id, ts_us, event_id, event_type, ...) -> the current
    funnel state per user touched by the batch, update mode (take the
    latest row per user downstream)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    state_schema, out_schema = _schemas(len(steps))

    def fn(key, pdfs, state):
        return _funnel_group(key, pdfs, state, steps)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming cohort-retention increments — the continuous twin of
operators/analytics.cohort_retention: a stateful stage emits one row per
NEW (user, period) first-occurrence, and the retention matrix is a plain
aggregation of those increments (the tests aggregate a drained stream
and assert equality with the batch matrix, catalog q_cohort_retention).

Why increments instead of the matrix itself: the matrix's counts GROW as
the stream progresses, which would force update/complete output mode and
per-trigger rewrites of every cell; the first-occurrence stream is
append-only (each (user, period) fires exactly once), so any downstream
sink — a warehouse table, a live dashboard agg — can maintain the matrix
with `n_active = count(*)` per (cohort_period, period_offset) and
`cohort_size = count(*) where period_offset = 0` per cohort.  Exactly
the batch plan's distinct→min→join chain, incrementalized.

State per user: the cohort period (fixed by the FIRST event processed —
an out-of-order earlier-period arrival in a later batch cannot re-cohort
the user; it emits a NEGATIVE period_offset instead, visible and
auditable downstream rather than silently mis-bucketed — the standard
in-order trade, stated not hidden) plus the set of period offsets
already emitted (one long per ACTIVE period the user ever touched —
bounded by the stream's period span, not its row count).

Scale: one shuffle per micro-batch on user_id; state is O(periods) longs
per user in the state store; the emitted stream is bounded by
distinct (user, period), the same cardinality the batch plan's first
distinct reduces to."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

WEEK_US = 7 * 24 * 3_600_000_000

STATE_SCHEMA = StructType(
    [
        StructField("cohort_period", LongType()),
        StructField("offsets", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_period", LongType()),
        StructField("period_offset", LongType()),
    ]
)


def _cohort_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    period_us: int,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cohort, offsets = state.get
        seen = set(offsets)
    else:
        cohort, seen = None, set()
    out: list[tuple] = []
    # Concatenate ALL Arrow chunks before sorting: a per-chunk sort would
    # let a later chunk's earlier-period event arrive after a later-period
    # one from an earlier chunk and mis-set the cohort — the chunk split is
    # an Arrow batching artifact, not a semantic boundary.  Memory is the
    # group's rows within one micro-batch (the same bound applyInPandas
    # already implies); cross-BATCH order remains the documented trade in
    # the module docstring (negative offsets, visible downstream).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True).sort_values("ts_us")
        for ts in batch["ts_us"]:
            ts = int(ts)
            # floor division (python // floors), exact for negative epochs —
            # the same pmod-floor semantics as the batch operator
            period = ts // period_us
            if cohort is None:
                cohort = period
            off = period - cohort
            if off not in seen:
                seen.add(off)
                out.append((user_id, cohort, off))
    if cohort is not None:
        state.update((cohort, sorted(seen)))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "cohort_period", "period_offset"]
        )


def cohort_increments_stream(
    events: DataFrame, period_us: int = WEEK_US
) -> DataFrame:
    """events (user_id, ts_us, ...) -> append-mode (user_id,
    cohort_period, period_offset) rows, one per first (user, period)
    occurrence.  Aggregate downstream: count(*) per (cohort, offset) is
    n_active; the offset-0 count per cohort is cohort_size."""

    def fn(key, pdfs, state):
        return _cohort_group(key, pdfs, state, period_us)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

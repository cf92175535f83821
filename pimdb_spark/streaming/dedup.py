"""Streaming keep-first dedup — the continuous twin of the S3 keep-first
family (sources/tsv.dedup_keep_first, catalog q_dedup_keep_first): emit
exactly one row per key, the FIRST in (ts_us, event_id) order, carrying
the seen-key set across micro-batches.

Two forms, matching the house pattern of an oracle-exact twin plus the
idiomatic production path:

- ``dedup_stream_keep_first`` (applyInPandasWithState): per-key state is
  a single boolean (seen), O(1) per key; events inside a batch are
  processed in (ts_us, event_id) order so the emitted row is exactly the
  batch operator's row_number()==1 winner — drained-batch equality is
  asserted against catalog q_dedup_keep_first.  Cross-batch, the seen
  flag suppresses later arrivals of a key.  State grows with the
  DISTINCT-key count (unbounded over an unbounded stream — the honest
  cost of exact keep-first; see the watermark form for the bounded
  trade).
- ``dedup_stream_builtin``: Spark's native ``dropDuplicates`` /
  ``dropDuplicatesWithinWatermark``.  The native operator keeps the
  first PROCESSED row per key, which inside a micro-batch is partition
  order, not event-time order — same key SET, possibly different
  representative rows; and the watermark form bounds state by evicting
  keys older than the watermark (a late duplicate beyond the watermark
  is re-emitted — the documented trade, the same shape as
  dropDuplicatesWithinWatermark's own contract).  At 100 TB the
  watermark form is the production default: state is the keys within
  one watermark window, RocksDB-backed, instead of all keys ever.

Scale: one shuffle per micro-batch on the dedup key in both forms; the
stateful twin's per-key state is one boolean; skewed keys are the state
store's problem, not a join explosion."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("seen", BooleanType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _dedup_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        return
    first = None  # (ts_us, event_id, event_type)
    for pdf in pdfs:
        for ts, eid, typ in zip(pdf["ts_us"], pdf["event_id"], pdf["event_type"]):
            cand = (int(ts), int(eid), str(typ))
            if first is None or cand[:2] < first[:2]:
                first = cand
    if first is not None:
        state.update((True,))
        yield pd.DataFrame(
            [(user_id, first[1], first[0], first[2])],
            columns=["user_id", "event_id", "ts_us", "event_type"],
        )


def dedup_stream_keep_first(events: DataFrame) -> DataFrame:
    """events (user_id, ts_us, event_id, event_type) -> the first row per
    user in (ts_us, event_id) order, append mode; exact batch parity on
    in-order streams (the file-source ingest pattern)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream_builtin(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Spark's native streaming dedup: ``dropDuplicates(keys)`` keeps the
    first processed row per key with state = all keys ever seen; with
    ``watermark_col``/``watermark_delay`` set it switches to
    ``dropDuplicatesWithinWatermark`` — state bounded to one watermark
    window, late duplicates beyond it re-emitted.  The representative
    row per key is arrival-order, NOT event-time order: use
    dedup_stream_keep_first when the (ts, id)-min row matters."""
    keys = keys or ["user_id"]
    if watermark_col is not None:
        if watermark_delay is None:
            raise ValueError("watermark_delay required with watermark_col")
        return events.withWatermark(
            watermark_col, watermark_delay
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)

"""Streaming data-quality profiling: per-event-time-window column
statistics maintained continuously over the event stream — the streaming
twin of operators/profile.table_profile (the batch ingest gate).

A 100 TB pipeline does not re-profile the whole table per snapshot; it
profiles each arriving window and alerts on drift (null explosions,
cardinality collapses, range walk-off) as data lands.  This is exactly
the shape Structured Streaming's windowed aggregation state machine is
built for:

- watermark bounds state: closed windows are finalized and evicted, so
  state is O(open windows x groups), never O(stream history);
- every statistic here is an algebraic/partial-aggregatable function
  (count, sum-of-indicator, min, max, approx_count_distinct's HLL merge),
  so the map side combines before the one keyed shuffle per micro-batch;
- append output mode emits each window exactly once, when the watermark
  closes it — the natural feed for a drift-alert sink.

Distinct counts use approx_count_distinct (HLL): mergeable across
partitions AND micro-batches with constant memory, which an exact
count-distinct in streaming state is not (it would buffer every value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_profile(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "20 minutes",
    value_col: str = "value",
    key_col: str = "user_id",
    time_col: str = "event_time",
) -> DataFrame:
    """Per-window profile rows: (window_start, window_end, n_rows,
    n_null_value, n_distinct_keys_approx, min_value, max_value).

    Works on a streaming OR batch DataFrame (the tests run both and
    assert parity on the closed windows — same contract as the other
    streaming twins)."""
    v = F.col(value_col)
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(v.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_value"),
            F.approx_count_distinct(key_col).alias("n_distinct_keys_approx"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_rows",
            "n_null_value",
            "n_distinct_keys_approx",
            "min_value",
            "max_value",
        )
    )

"""Watermarked stream-stream join (SURVEY §2.9 — beyond-parity streaming
surface): correlate two live event streams with a bounded time window, the
continuous form of the batch as-of/range correlation.

Spark requires a time-bound join condition plus watermarks on both sides so
it can evict state: each side buffers only rows younger than
watermark + horizon, giving O(arrival-rate x horizon) state per key range
instead of unbounded buffering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_within_horizon(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    time_col: str = "event_time",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event happened at
    or before the left event and within ``horizon`` of it:
    ``r.time <= l.time <= r.time + horizon``.

    Output: (key, l_event_id, r_event_id, l_time, r_time).
    """
    l = left.withWatermark(time_col, watermark).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col(time_col).alias("l_time"),
    )
    r = right.withWatermark(time_col, watermark).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col(time_col).alias("r_time"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_time") <= F.col("l_time"))
        & (F.col("l_time") <= F.col("r_time") + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l_key").alias(key), "l_event_id", "r_event_id", "l_time", "r_time"
    )

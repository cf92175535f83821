"""Streaming heavy-hitter detection: per-event-time-window keys whose
frequency crosses a threshold — the streaming twin of
operators/profile.heavy_hitters (the batch skew report).

At 100 TB/day the batch skew report is a post-mortem; the streaming form
flags a flooding key (bot traffic, a stuck producer, a hot-partition key)
while its window is still open-adjacent, feeding skew mitigation (salting
the hot key, quarantining the source) before the next batch job inherits
the skew.

Shape notes:
- counts are algebraic: map-side partial aggregation combines before the
  one (window, key) shuffle per micro-batch;
- the watermark closes and evicts windows, so state is O(open windows x
  active keys), never O(stream history);
- the threshold is applied to the FINAL count of a closed window (append
  mode emits exactly once) — a key is reported iff its full-window count
  crosses ``min_count``, identical semantics to the batch twin run on the
  same data (tests assert parity).

Top-k-per-window ranking is deliberately NOT done in the stream: rank is
not an incrementally-mergeable aggregate (it needs the window's full key
census), so it belongs in the sink or a one-line batch post-pass over
the emitted counts — thresholding is the part that streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    window_duration: str = "10 minutes",
    watermark: str = "20 minutes",
    min_count: int = 10,
    time_col: str = "event_time",
) -> DataFrame:
    """Per-window keys with count >= ``min_count``: (window_start,
    window_end, key, n).  Works on a streaming OR batch DataFrame — the
    tests run both and assert the closed windows agree."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n",
        )
    )

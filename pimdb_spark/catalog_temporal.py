"""Event-time operators over the events table: tumbling-window aggregation
and gap-based sessionization — the batch forms of the Structured Streaming
pipeline in pimdb_spark/streaming/ (same logic, same results; the streaming
variant adds watermarks).

All event-time math is integer arithmetic on epoch microseconds (see
catalog.load notes) — exact and timezone-free on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register

HOUR_US = 3_600_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "q_time_window_agg",
    oracle=f"""
    SELECT (epoch_us(ts) - epoch_us(ts) % {HOUR_US}) AS hour_us,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    bench=True,
)
def q_time_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (the batch twin of
    streaming/events.py's windowed agg).  Scale: partial aggregation makes
    the shuffle O(windows x types); a watermark bounds state in the
    streaming variant."""
    ev = load(spark, sf_dir, "events")
    hour = (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us")
    return ev.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT user_id, ts_us, event_id,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, event_id
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id,
             ts_us
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           (max(ts_us) - min(ts_us)) AS duration_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
    bench=True,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag
    → running sum as session id → per-session stats.

    Scale: one shuffle on user_id serves both windows (same partitioning);
    the streaming twin uses applyInPandasWithState/session_window.
    """
    ev = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # Tie-break on event_id too: two events sharing ts_us at a session
    # boundary must get the same session id on every engine/run.
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.withColumn("prev_us", F.lag("ts_us").over(w_order)).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )

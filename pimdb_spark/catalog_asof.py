"""As-of join and range join catalog entries (operators/asof.py), with
DuckDB's native ASOF JOIN / theta join as the oracle — the strongest
possible check for these composed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register
from pimdb_spark.operators.asof import asof_join, interval_join, range_join_pairs

RANGE_RADIUS_US = 12 * 3600 * 1_000_000  # 12 hours


@register(
    "q_asof_join",
    oracle="""
    SELECT l.user_id,
           epoch_us(l.ts) AS ts_us,
           l.event_id,
           r.event_id   AS asof_event_id,
           epoch_us(r.ts) AS asof_time
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    bench=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase is matched to the user's most recent
    signup at or before it (operators/asof.asof_join — union +
    carry-forward, ONE shuffle on user_id; DuckDB's native ASOF JOIN is
    the oracle).  Per-user timestamp ties are broken right-before-left,
    matching ASOF's >= semantics."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts_us", "event_id"
    )
    return asof_join(
        purchases,
        signups,
        on="user_id",
        left_time="ts_us",
        right_time="ts_us",
        right_value_cols=["event_id"],
    )


@register(
    "q_range_join",
    oracle=f"""
    SELECT a.user_id,
           a.event_id AS id_a, b.event_id AS id_b,
           epoch_us(a.ts) AS t_a, epoch_us(b.ts) AS t_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_RADIUS_US}
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: same-user event pairs within 12 hours
    (operators/asof.range_join_pairs — neighbor-bucket explode turns the
    range condition into an equi-join; the oracle is DuckDB's plain theta
    join, which would be a nested-loop at scale)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts_us")
    return range_join_pairs(ev, "user_id", "ts_us", "event_id", RANGE_RADIUS_US)


@register(
    "q_interval_join",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + (event_id % 5 + 1) * 60000000 AS e
      FROM events
    ), l AS (SELECT * FROM iv WHERE event_id % 2 = 0),
       r AS (SELECT * FROM iv WHERE event_id % 2 = 1)
    SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
           l.s AS l_start, r.s AS r_start
    FROM l JOIN r ON l.user_id = r.user_id
                 AND l.s <= r.e AND r.s <= l.e
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join (operators/asof.interval_join): per user,
    every (even-id, odd-id) event pair whose 1-5 minute validity windows
    overlap — the temporal join shape for sessions x promotions or
    observations x outages.  DuckDB's oracle is the direct inequality
    join (its IEJoin evaluates it natively); the Spark plan is the
    grid-cell explode + hash equi-join with exactly-once pair
    attribution, which is the shape that scales (no nested loop).

    Grid = 5 min ≈ the max interval length, so each interval touches
    <= 3 cells."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("s"),
        (F.col("ts_us") + (F.col("event_id") % 5 + 1) * 60000000).alias("e"),
    )
    left = iv.filter(F.col("event_id") % 2 == 0)
    right = (
        iv.filter(F.col("event_id") % 2 == 1)
        .withColumnRenamed("event_id", "r_event_id")
        .withColumnRenamed("s", "r_s")
        .withColumnRenamed("e", "r_e")
    )
    joined = interval_join(
        left, right, "user_id", ("s", "e"), ("r_s", "r_e"), grid=300_000_000
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("l_id"),
        F.col("r_event_id").alias("r_id"),
        F.col("s").alias("l_start"),
        F.col("r_s").alias("r_start"),
    )

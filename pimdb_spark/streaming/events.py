"""Structured Streaming variants of the event-time operators
(SURVEY §2.9 notes the reference has no streaming; this is the
beyond-parity extension for continuous ingestion).

The batch twins live in catalog_temporal.py and produce identical results
— the tests assert that.  Streaming adds:
- a file source (new parquet files under a directory are picked up
  incrementally — the Spark-native form of pimdb's Last-Modified
  re-download loop),
- a watermark bounding state for late data,
- tumbling-window aggregation in update/append mode.

events.ts is an INT64 parquet timestamp (unit has varied across testdata
generations: NANOS early, MICROS now); we read it as a raw long via an
explicit schema (same trick as catalog.load) and convert to a proper
timestamp column for the window/watermark machinery.  By default
``read_event_stream`` sniffs the unit from the parquet footer of the
first file already in the source directory (``catalog.parquet_ts_unit``)
— the same guard that keeps the batch path from misreading a testdata
regeneration by 1000x; pass ``ts_unit`` explicitly only when the
directory starts empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # raw epoch in the file's unit
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


_TO_MICROS = {
    "ns": "ts div 1000",
    "us": "ts",
    "ms": "ts * 1000",
    "s": "ts * 1000000",
}


def event_time_from_raw(ts_unit: str, col: str = "ts") -> F.Column:
    """Raw epoch long in ``ts_unit`` -> proper timestamp column.  Shared by
    the stream reader and the batch twins in tests, so both sides always
    apply the SAME conversion for a given sniffed unit — a unit flip then
    shows up as a test failure, never as a silently-consistent wrong
    interpretation on both sides."""
    return F.timestamp_micros(F.expr(_TO_MICROS[ts_unit].replace("ts", col, 1)))


def read_event_stream(
    spark: SparkSession, source_dir: str, ts_unit: str | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    ``ts_unit=None`` (default) sniffs the epoch unit from the footer of
    the first parquet file present in ``source_dir`` — raises if the
    directory has no file yet or ts carries no timestamp logical type;
    pass 'ns'/'us'/'ms'/'s' explicitly for an initially-empty directory."""
    if ts_unit is None:
        from pimdb_spark.catalog import parquet_ts_unit

        ts_unit = parquet_ts_unit(source_dir)
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    return raw.withColumn("event_time", event_time_from_raw(ts_unit)).drop("ts")


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a watermark
    bounding state.  Scale: partial aggregation per micro-batch; state is
    O(open windows x types) and the watermark closes windows."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key within
    the watermark horizon (dropDuplicatesWithinWatermark) — the streaming
    twin of S3 keep-first dedup and the continuous form of the exact-dedup
    pipeline stage.  Scale: state holds one entry per key only until the
    watermark passes it, so memory is bounded by the duplicate-arrival
    window, not the stream length."""
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain the stream with availableNow (process-everything-then-stop)
    into an in-memory table named query_name."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

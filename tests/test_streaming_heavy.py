"""Streaming heavy-hitter detection (streaming/heavy.py): threshold
semantics on closed windows, streaming-vs-batch parity, and incremental
growth across micro-batches."""

from __future__ import annotations

import shutil


def _rows(df):
    return {(r.window_start, r.window_end, r.key): r.n for r in df.collect()}


def test_streaming_heavy_hitters_matches_batch(spark, tmp_path):
    from pimdb_spark.catalog import parquet_ts_unit
    from pimdb_spark.streaming.events import (
        EVENTS_SCHEMA,
        event_time_from_raw,
        read_event_stream,
        run_to_memory,
    )
    from pimdb_spark.streaming.heavy import windowed_heavy_hitters

    src = tmp_path / "events_heavy"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    stream = windowed_heavy_hitters(
        read_event_stream(spark, str(src)), "user_id", "1 day", "2 days", min_count=4
    )
    run_to_memory(stream, "heavy_stream")
    got = _rows(spark.table("heavy_stream"))

    batch = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(str(src))
        .withColumn("event_time", event_time_from_raw(parquet_ts_unit(str(src))))
    )
    expected = _rows(
        windowed_heavy_hitters(batch, "user_id", "1 day", "2 days", min_count=4)
    )
    assert got == expected
    assert got  # the fixture has flooding keys at this threshold
    assert all(n >= 4 for n in got.values())
    # threshold is load-bearing: the unthresholded census is strictly larger
    census = _rows(
        windowed_heavy_hitters(batch, "user_id", "1 day", "2 days", min_count=1)
    )
    assert len(census) > len(got)


def test_streaming_heavy_hitters_incremental(spark, tmp_path):
    """A key crosses the threshold only once enough events have landed
    across micro-batches."""
    import duckdb

    from pimdb_spark.streaming.events import read_event_stream, run_to_memory
    from pimdb_spark.streaming.heavy import windowed_heavy_hitters

    src = tmp_path / "events_heavy_incr"
    src.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 2 = 0) TO '{src}/a.parquet' (FORMAT PARQUET)"""
    )
    stream = windowed_heavy_hitters(
        read_event_stream(spark, str(src)), "user_id", "1 day", "2 days", min_count=4
    )
    run_to_memory(stream, "heavy_incr")
    n1 = sum(_rows(spark.table("heavy_incr")).values())

    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 2 = 1) TO '{src}/b.parquet' (FORMAT PARQUET)"""
    )
    run_to_memory(stream, "heavy_incr2")
    n2 = sum(_rows(spark.table("heavy_incr2")).values())
    assert n2 > n1  # more mass crossed the threshold once the rest landed

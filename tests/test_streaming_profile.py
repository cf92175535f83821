"""Streaming per-window column profiling (streaming/profile.py): the
continuously-maintained form of the batch ingest-gate profile.  The
windowed stats over a file-source stream must equal the batch twin run
through the SAME windowed_profile function on the same file."""

from __future__ import annotations

import shutil


def _rows(df):
    return {
        (r.window_start, r.window_end): (
            r.n_rows,
            r.n_null_value,
            r.n_distinct_keys_approx,
            r.min_value,
            r.max_value,
        )
        for r in df.collect()
    }


def test_streaming_profile_matches_batch(spark, tmp_path):
    from pimdb_spark.catalog import parquet_ts_unit
    from pimdb_spark.streaming.events import (
        EVENTS_SCHEMA,
        event_time_from_raw,
        read_event_stream,
        run_to_memory,
    )
    from pimdb_spark.streaming.profile import windowed_profile

    src = tmp_path / "events_profile"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    stream = windowed_profile(read_event_stream(spark, str(src)), "1 hour", "2 hours")
    run_to_memory(stream, "win_profile")
    got = _rows(spark.table("win_profile"))

    batch = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(str(src))
        .withColumn("event_time", event_time_from_raw(parquet_ts_unit(str(src))))
    )
    expected = _rows(windowed_profile(batch, "1 hour", "2 hours"))
    assert got == expected
    assert len(got) > 1
    # sanity on the content: every window counted rows and a real range
    for n_rows, n_null, n_keys, lo, hi in got.values():
        assert n_rows > 0 and n_null == 0 and n_keys > 0 and lo <= hi


def test_streaming_profile_incremental_state(spark, tmp_path):
    """Profiles update as new files land — counts grow monotonically for
    the affected windows across micro-batch drains."""
    import duckdb

    from pimdb_spark.streaming.events import read_event_stream, run_to_memory
    from pimdb_spark.streaming.profile import windowed_profile

    src = tmp_path / "events_profile_incr"
    src.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 2 = 0) TO '{src}/a.parquet' (FORMAT PARQUET)"""
    )
    stream = windowed_profile(read_event_stream(spark, str(src)), "1 hour", "2 hours")
    run_to_memory(stream, "prof_incr")
    n1 = spark.table("prof_incr").agg({"n_rows": "sum"}).collect()[0][0]

    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 2 = 1) TO '{src}/b.parquet' (FORMAT PARQUET)"""
    )
    run_to_memory(stream, "prof_incr2")
    n2 = spark.table("prof_incr2").agg({"n_rows": "sum"}).collect()[0][0]
    assert n1 == 500 and n2 == 1000

"""Structured Streaming twin of the batch event pipeline: the windowed
aggregation over a file-source stream must equal the batch result."""

from __future__ import annotations

import shutil


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from pimdb_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        windowed_counts,
    )

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    stream = read_event_stream(spark, str(src))
    assert stream.isStreaming
    run_to_memory(windowed_counts(stream), "win_counts")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("win_counts").collect()
    }

    # batch twin on the same file — conversion derived from the SAME
    # footer sniff the stream reader uses, so a testdata unit flip fails
    # loudly instead of staying silently consistent on both sides
    from pimdb_spark.catalog import parquet_ts_unit
    from pimdb_spark.streaming.events import EVENTS_SCHEMA, event_time_from_raw

    batch = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(str(src))
        .withColumn("event_time", event_time_from_raw(parquet_ts_unit(str(src))))
    )
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.groupBy(
            F.window("event_time", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_streaming_incremental_files(spark, tmp_path):
    """New files are picked up incrementally (the streaming form of the
    reference's Last-Modified re-download loop)."""
    import duckdb

    from pimdb_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        windowed_counts,
    )

    src = tmp_path / "events_incr"
    src.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 2 = 0) TO '{src}/a.parquet' (FORMAT PARQUET)"""
    )
    stream = windowed_counts(read_event_stream(spark, str(src)))
    run_to_memory(stream, "incr_counts")
    n1 = spark.table("incr_counts").agg({"n_events": "sum"}).collect()[0][0]

    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 2 = 1) TO '{src}/b.parquet' (FORMAT PARQUET)"""
    )
    run_to_memory(stream, "incr_counts2")
    n2 = spark.table("incr_counts2").agg({"n_events": "sum"}).collect()[0][0]
    assert n1 == 500
    assert n2 == 1000


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids arriving within the watermark horizon are
    dropped; the drained output equals the batch distinct-by-key count."""
    import duckdb

    from pimdb_spark.streaming.events import (
        dedup_within_watermark,
        read_event_stream,
        run_to_memory,
    )

    src = tmp_path / "events_dup"
    src.mkdir()
    con = duckdb.connect()
    # the source file plus a duplicated 10% slice in a second file
    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet')
        TO '{src}/a.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '/root/testdata/sf0.001/events.parquet'
        WHERE event_id % 10 = 0) TO '{src}/dups.parquet' (FORMAT PARQUET)"""
    )
    stream = dedup_within_watermark(read_event_stream(spark, str(src)))
    run_to_memory(stream, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream").count()
    expected = con.sql(
        "SELECT count(DISTINCT event_id) FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    assert got == expected


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join within a 1-hour horizon equals the
    equivalent batch join on the drained data."""
    import shutil

    from pyspark.sql import functions as F

    from pimdb_spark.streaming.events import read_event_stream, run_to_memory
    from pimdb_spark.streaming.joins import join_within_horizon

    src = tmp_path / "events_ssj"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")

    stream = read_event_stream(spark, str(src))
    purchases = stream.filter(F.col("event_type") == "purchase")
    signups = stream.filter(F.col("event_type") == "signup")
    out = join_within_horizon(purchases, signups, horizon="1 hour")
    run_to_memory(out, "ssj", output_mode="append")
    got = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.table("ssj").collect()
    }

    from pimdb_spark.catalog import parquet_ts_unit
    from pimdb_spark.streaming.events import EVENTS_SCHEMA, event_time_from_raw

    ev = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(str(src))
        .withColumn("event_time", event_time_from_raw(parquet_ts_unit(str(src))))
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("event_time").alias("pt")
    )
    s = ev.filter("event_type = 'signup'").select(
        F.col("user_id").alias("su"), F.col("event_id").alias("sid"), F.col("event_time").alias("st")
    )
    expected = {
        (r.pu, r.pid, r.sid)
        for r in p.join(
            s,
            (F.col("pu") == F.col("su"))
            & (F.col("st") <= F.col("pt"))
            & (F.col("pt") <= F.col("st") + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_sniffs_ts_unit_nanos_and_micros(spark, tmp_path):
    """The stream reader's footer sniff must interpret the SAME logical
    instants identically whether the file stores TIMESTAMP(NANOS) or
    TIMESTAMP(MICROS) — the 1000x skew that broke the batch path in
    round 5 must be impossible in the streaming path too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pimdb_spark.catalog import parquet_ts_unit
    from pimdb_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        windowed_counts,
    )

    base_us = 1_700_000_000_000_000  # epoch micros
    rows = [(i, base_us + i * 900_000_000, i % 3, "click", 1.0, "{}") for i in range(40)]

    def write(unit, path):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * (1000 if unit == "ns" else 1) for r in rows],
                    pa.timestamp(unit),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        )
        pq.write_table(tbl, path)

    results = {}
    for unit in ("ns", "us"):
        src = tmp_path / f"events_{unit}"
        src.mkdir()
        write(unit, str(src / "a.parquet"))
        assert parquet_ts_unit(str(src)) == unit
        stream = read_event_stream(spark, str(src))  # default: sniff
        run_to_memory(windowed_counts(stream), f"sniff_{unit}")
        results[unit] = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.table(f"sniff_{unit}").collect()
        }
    assert results["ns"] == results["us"]
    assert len(results["us"]) > 1


def test_parquet_ts_unit_rejects_non_timestamp(tmp_path):
    """A testdata generation that drops the timestamp logical type must
    fail loudly, not be silently misread as micros."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from pimdb_spark.catalog import parquet_ts_unit

    p = str(tmp_path / "raw.parquet")
    pq.write_table(pa.table({"ts": pa.array([1, 2, 3], pa.int64())}), p)
    with _pytest.raises(ValueError, match="not a parquet timestamp"):
        parquet_ts_unit(p)
    with _pytest.raises(FileNotFoundError):
        parquet_ts_unit(str(tmp_path / "empty_dir_missing"))

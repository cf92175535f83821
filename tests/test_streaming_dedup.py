"""The streaming keep-first dedup must match the batch operator (catalog
q_dedup_keep_first) on a drained stream, suppress re-arrivals of a key
across micro-batches, and the native dropDuplicates form must keep the
same key set."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def _event_stream(spark, src_dir):
    from pimdb_spark.streaming.events import EVENTS_SCHEMA

    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src_dir))
    return raw.select(
        "user_id", F.col("ts").alias("ts_us"), "event_id", "event_type"
    )


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from pimdb_spark.catalog import q_dedup_keep_first
    from pimdb_spark.streaming.dedup import dedup_stream_keep_first
    from pimdb_spark.streaming.events import run_to_memory

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    out = dedup_stream_keep_first(_event_stream(spark, src))
    run_to_memory(out, "dedup_stream", output_mode="append")
    got = {
        r.user_id: (r.event_id, r.ts_us, r.event_type)
        for r in spark.table("dedup_stream").collect()
    }
    expected = {
        r.user_id: (r.event_id, r.ts_us, r.event_type)
        for r in q_dedup_keep_first(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_streaming_dedup_builtin_same_key_set(spark, tmp_path):
    """dropDuplicates keeps the same KEY SET (representative rows are
    arrival-order, so only keys are compared)."""
    from pimdb_spark.catalog import q_dedup_keep_first
    from pimdb_spark.streaming.dedup import dedup_stream_builtin
    from pimdb_spark.streaming.events import run_to_memory

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    out = dedup_stream_builtin(_event_stream(spark, src))
    run_to_memory(out, "dedup_builtin_stream", output_mode="append")
    got = {r.user_id for r in spark.table("dedup_builtin_stream").collect()}
    expected = {
        r.user_id
        for r in q_dedup_keep_first(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expected


def test_streaming_dedup_state_crosses_batches(spark, tmp_path):
    """A key seen in micro-batch 1 is suppressed in micro-batch 2; a new
    key in batch 2 still emits."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pimdb_spark.streaming.dedup import dedup_stream_keep_first

    src = tmp_path / "events_stream"
    src.mkdir()
    chk = tmp_path / "chk"

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pq.write_table(pa.Table.from_pandas(pdf), src / name)

    base = 1_700_000_000 * 1_000_000
    m = 60 * 1_000_000
    # batch 1: user 7 twice (out of id order inside the batch: the (ts,id)
    # winner is event 1, not the row written first)
    write_batch(
        "b1.parquet",
        [
            (2, base + m, 7, "click", 1.0, "{}"),
            (1, base, 7, "view", 1.0, "{}"),
        ],
    )

    rows: list = []

    def drain():
        def sink(batch_df, _epoch):
            rows.extend(
                (r.user_id, r.event_id) for r in batch_df.collect()
            )

        q = (
            dedup_stream_keep_first(_event_stream(spark, src))
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(chk))
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream drain timed out"

    drain()
    assert rows == [(7, 1)]
    # batch 2: user 7 again (suppressed) + new user 8 (emitted)
    write_batch(
        "b2.parquet",
        [
            (3, base + 2 * m, 7, "click", 1.0, "{}"),
            (4, base + 3 * m, 8, "view", 1.0, "{}"),
        ],
    )
    drain()
    assert sorted(rows) == [(7, 1), (8, 4)]

"""The stateful streaming edge extractor must match the batch operator
(distinct (src, dst) set, flood buckets contributing nothing) when the
stream drains in one batch, and must emit only NEW edges plus flood
tombstones across micro-batches."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def _event_stream(spark, src_dir):
    from pimdb_spark.streaming.events import EVENTS_SCHEMA

    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src_dir))
    return raw.select(
        "user_id",
        "event_type",
        (F.col("ts").cast("long") - F.col("ts").cast("long") % HOUR_US).alias(
            "hour_us"
        ),
    )


def test_streaming_edges_match_batch(spark, tmp_path):
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.graph import co_occurrence_edges
    from pimdb_spark.streaming.events import run_to_memory
    from pimdb_spark.streaming.graph import co_occurrence_edges_stream

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    out = co_occurrence_edges_stream(
        _event_stream(spark, src),
        ["event_type", "hour_us"],
        node_col="user_id",
        max_bucket_size=8,
    )
    run_to_memory(out, "edges_stream", output_mode="append")
    rows = spark.table("edges_stream").collect()
    tombstoned = {r.bucket for r in rows if r.flooded}
    got = {
        (r.src, r.dst)
        for r in rows
        if not r.flooded and r.bucket not in tombstoned
    }
    assert all(r.src is None and r.dst is None for r in rows if r.flooded)

    # batch twin over the SAME normalized events (catalog.load handles the
    # parquet timestamp unit; the streaming side derives hour_us from the
    # raw long, so both see identical buckets)
    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "hour_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    expected = {
        (r.src, r.dst)
        for r in co_occurrence_edges(
            ev, ["event_type", "hour_us"], node_col="user_id", max_bucket_size=8
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_streaming_edges_incremental_and_tombstone(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pimdb_spark.streaming.graph import co_occurrence_edges_stream

    src = tmp_path / "events_stream"
    src.mkdir()
    chk = tmp_path / "chk"

    def write_batch(name, users):
        pdf = pd.DataFrame(
            [(i, 1_700_000_000_000_000, u, "x", 1.0, "{}") for i, u in enumerate(users)],
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pq.write_table(pa.Table.from_pandas(pdf), src / name)

    emitted: list = []

    def drain():
        def sink(batch_df, _epoch):
            emitted.extend(batch_df.collect())

        q = (
            co_occurrence_edges_stream(
                _event_stream(spark, src), ["event_type", "hour_us"],
                node_col="user_id", max_bucket_size=3,
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(chk))
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream drain timed out"

    write_batch("b1.parquet", [1, 2])
    drain()
    assert {(r.src, r.dst) for r in emitted} == {(1, 2)}
    # batch 2: user 3 joins the same bucket -> only the NEW edges appear
    write_batch("b2.parquet", [3])
    emitted.clear()
    drain()
    assert {(r.src, r.dst) for r in emitted} == {(1, 3), (2, 3)}
    # batch 3: user 4 pushes membership past the cap -> one tombstone,
    # no edges, and the bucket stays dead afterwards
    write_batch("b3.parquet", [4])
    emitted.clear()
    drain()
    assert [(r.src, r.dst, r.flooded) for r in emitted] == [(None, None, True)]
    write_batch("b4.parquet", [5])
    emitted.clear()
    drain()
    assert emitted == []

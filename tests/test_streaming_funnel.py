"""The stateful streaming funnel must match the batch operator (catalog
q_funnel_steps) when the stream drains in one batch, and must advance
funnel state ACROSS micro-batches when steps arrive split."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

STEPS = ["view", "click", "purchase"]


def _event_stream(spark, src_dir):
    from pimdb_spark.streaming.events import EVENTS_SCHEMA

    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src_dir))
    return raw.select(
        "user_id", F.col("ts").alias("ts_us"), "event_id", "event_type"
    )


def test_streaming_funnel_matches_batch(spark, tmp_path):
    from pimdb_spark.catalog_analytics import q_funnel_steps
    from pimdb_spark.streaming.events import run_to_memory
    from pimdb_spark.streaming.funnel import funnel_stream

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    out = funnel_stream(_event_stream(spark, src), STEPS)
    run_to_memory(out, "funnel_stream", output_mode="update")
    got = {
        r.user_id: (r.t1, r.t2, r.t3, r.steps_reached)
        for r in spark.table("funnel_stream").collect()
    }
    expected = {
        r.user_id: (r.t1, r.t2, r.t3, r.steps_reached)
        for r in q_funnel_steps(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expected
    assert len(got) > 0
    assert any(v[3] == 3 for v in got.values())  # someone completes the funnel


def test_streaming_funnel_state_advances_across_batches(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pimdb_spark.streaming.funnel import funnel_stream

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
    write_batch("b1.parquet", [(1, base, 3, "view", 1.0, "{}")])

    latest: dict = {}

    def drain():
        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                latest[r.user_id] = (r.t1, r.t2, r.t3, r.steps_reached)

        q = (
            funnel_stream(_event_stream(spark, src), STEPS)
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(chk))
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream drain timed out"

    drain()
    assert latest == {3: (base, None, None, 1)}
    # batch 2: click then purchase — both later steps complete against the
    # carried t1 from batch 1
    write_batch(
        "b2.parquet",
        [(2, base + m, 3, "click", 1.0, "{}"), (3, base + 2 * m, 3, "purchase", 1.0, "{}")],
    )
    drain()
    assert latest == {3: (base, base + m, base + 2 * m, 3)}

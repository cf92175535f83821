"""The streaming cohort-increment stage, aggregated, must reproduce the
batch retention matrix (catalog q_cohort_retention) on a drained stream,
and must pin a user's cohort / suppress repeat periods across
micro-batches."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def _event_stream(spark, src_dir):
    from pimdb_spark.streaming.events import EVENTS_SCHEMA

    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src_dir))
    return raw.select("user_id", F.col("ts").alias("ts_us"))


def test_streaming_cohort_matches_batch_matrix(spark, tmp_path):
    from pimdb_spark.catalog_analytics import q_cohort_retention
    from pimdb_spark.streaming.cohort import cohort_increments_stream
    from pimdb_spark.streaming.events import run_to_memory

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "part-0.parquet")

    out = cohort_increments_stream(_event_stream(spark, src))
    run_to_memory(out, "cohort_stream", output_mode="append")
    # localCheckpoint: cells/sizes both derive from inc and their join
    # trips the known self-join conflicting-attributes analyzer issue
    inc = spark.table("cohort_stream").localCheckpoint()
    # each (user, period) fires exactly once -> counts are plain count(*)
    assert inc.groupBy("user_id", "cohort_period", "period_offset").count().filter(
        F.col("count") > 1
    ).count() == 0
    cells = inc.groupBy("cohort_period", "period_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = inc.filter(F.col("period_offset") == 0).groupBy("cohort_period").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    got = {
        (r.cohort_period, r.period_offset): (r.n_active, r.cohort_size, r.retention)
        for r in cells.join(sizes, "cohort_period")
        .withColumn(
            "retention", F.col("n_active").cast("double") / F.col("cohort_size")
        )
        .collect()
    }
    expected = {
        (r.cohort_period, r.period_offset): (r.n_active, r.cohort_size, r.retention)
        for r in q_cohort_retention(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_streaming_cohort_state_crosses_batches(spark, tmp_path):
    """Cohort is pinned by batch 1's first event; batch 2's new period
    emits the right offset and a repeat period emits nothing."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pimdb_spark.streaming.cohort import WEEK_US, cohort_increments_stream

    src = tmp_path / "events_stream"
    src.mkdir()
    chk = tmp_path / "chk"

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pq.write_table(pa.Table.from_pandas(pdf), src / name)

    base = (1_700_000_000 * 1_000_000 // WEEK_US) * WEEK_US  # period boundary
    write_batch(
        "b1.parquet",
        [
            (1, base + 5, 7, "view", 1.0, "{}"),
            (2, base + 9, 7, "click", 1.0, "{}"),  # same period: no new row
        ],
    )

    rows: list = []

    def drain():
        def sink(batch_df, _epoch):
            rows.extend(
                (r.user_id, r.cohort_period, r.period_offset)
                for r in batch_df.collect()
            )

        q = (
            cohort_increments_stream(_event_stream(spark, src))
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(chk))
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream drain timed out"

    drain()
    p0 = base // WEEK_US
    assert rows == [(7, p0, 0)]
    # batch 2: two weeks later (offset 2) + a repeat of week 0 (suppressed)
    write_batch(
        "b2.parquet",
        [
            (3, base + 2 * WEEK_US + 1, 7, "view", 1.0, "{}"),
            (4, base + 11, 7, "view", 1.0, "{}"),
        ],
    )
    drain()
    assert sorted(rows) == [(7, p0, 0), (7, p0, 2)]


def test_streaming_cohort_randomized_splits(spark, tmp_path):
    """Random in-order event stream forced through per-file micro-batches
    (maxFilesPerTrigger=1): the aggregated increments equal the batch
    matrix regardless of where the batch boundaries fall."""
    import random

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pimdb_spark.operators.analytics import cohort_retention
    from pimdb_spark.streaming.cohort import cohort_increments_stream

    rng = random.Random(53)
    period = 10 * 1_000_000
    base = 1_700_000_000 * 1_000_000
    rows = []
    for eid in range(300):
        rows.append(
            (
                eid,
                base + rng.randint(0, 80) * 1_000_000,
                rng.randint(0, 11),
                "view",
                1.0,
                "{}",
            )
        )
    rows.sort(key=lambda r: (r[1], r[0]))  # in-order arrival contract

    src = tmp_path / "events_stream"
    src.mkdir()
    for i in range(3):
        pdf = pd.DataFrame(
            rows[i * 100 : (i + 1) * 100],
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pq.write_table(pa.Table.from_pandas(pdf), src / f"b{i}.parquet")

    from pimdb_spark.streaming.events import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select("user_id", F.col("ts").alias("ts_us"))
    )
    inc_rows: list = []

    def sink(batch_df, _epoch):
        inc_rows.extend(
            (r.user_id, r.cohort_period, r.period_offset)
            for r in batch_df.collect()
        )

    q = (
        cohort_increments_stream(stream, period_us=period)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    # assert the drain COMPLETED — a silent timeout under machine load
    # would otherwise surface as a confusing partial-results mismatch
    assert q.awaitTermination(300), "stream drain timed out"

    assert len(inc_rows) == len(set(inc_rows))  # each fires exactly once
    cells: dict = {}
    sizes: dict = {}
    for _u, cp, off in inc_rows:
        cells[(cp, off)] = cells.get((cp, off), 0) + 1
        if off == 0:
            sizes[cp] = sizes.get(cp, 0) + 1
    got = {
        key: (n, sizes[key[0]], n / sizes[key[0]])
        for key, n in cells.items()
    }

    batch_df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        "event_id bigint, ts_us bigint, user_id bigint",
    )
    expected = {
        (r.cohort_period, r.period_offset): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(batch_df, period_us=period).collect()
    }
    assert got == expected
    assert len(got) > 4


def test_cohort_group_sorts_across_arrow_chunks():
    """The stateful fn must order a micro-batch's events across ALL Arrow
    chunks before fixing the cohort: a later chunk carrying the user's
    EARLIEST event still defines the cohort (a per-chunk sort would
    mis-cohort to the first chunk's minimum and emit a negative offset)."""
    import pandas as pd

    from pimdb_spark.streaming.cohort import WEEK_US, _cohort_group

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    # chunk order: the 2-weeks-in event arrives in chunk 0, the true
    # first event (week 0) in chunk 1 — an Arrow batching artifact
    chunk0 = pd.DataFrame({"ts_us": [2 * WEEK_US + 5]})
    chunk1 = pd.DataFrame({"ts_us": [5, WEEK_US + 5]})
    state = _FakeState()
    out = pd.concat(
        list(_cohort_group((7,), [chunk0, chunk1], state, WEEK_US)),
        ignore_index=True,
    )
    rows = {(r.cohort_period, r.period_offset) for r in out.itertuples()}
    assert rows == {(0, 0), (0, 1), (0, 2)}  # cohort = week 0, no negatives
    assert state.get[0] == 0

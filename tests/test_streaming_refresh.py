"""Streaming incremental refresh (streaming/refresh.py): snapshot files
arriving over time upsert-merge into a maintained parquet table, with
within-batch dedup making replayed files idempotent."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("version", LongType()),
    ]
)


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_refresh_merges_snapshots(spark, tmp_path):
    from pimdb_spark.streaming.refresh import incremental_refresh

    table = str(tmp_path / "table")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], SCHEMA
    ).write.parquet(table)

    # snapshot 1: update k=2, insert k=4 — plus a same-batch replay of k=2
    # at a lower version that must lose
    _write(spark, [(2, "b1", 2), (2, "b_stale", 1), (4, "d", 1)], snaps)

    q = incremental_refresh(
        spark, snaps, table, SCHEMA, ["k"], "version", ckpt
    )
    q.awaitTermination(120)

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b1", 3: "c", 4: "d"}

    # snapshot 2 arrives later: delete-free update of k=1
    _write(spark, [(1, "a2", 3)], snaps)
    q2 = incremental_refresh(
        spark, snaps, table, SCHEMA, ["k"], "version", ckpt
    )
    q2.awaitTermination(120)

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: "a2", 2: "b1", 3: "c", 4: "d"}


def test_latest_per_key_deterministic(spark):
    from pimdb_spark.streaming.refresh import latest_per_key

    df = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 5), (1, "z", 3), (2, "q", 1)], SCHEMA
    )
    got = {r.k: r.v for r in latest_per_key(df, ["k"], "version").collect()}
    assert got == {1: "y", 2: "q"}

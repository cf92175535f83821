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
    assert q.awaitTermination(300), "stream drain timed out"

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b1", 3: "c", 4: "d"}

    # snapshot 2 arrives later: delete-free update of k=1
    _write(spark, [(1, "a2", 3)], snaps)
    q2 = incremental_refresh(
        spark, snaps, table, SCHEMA, ["k"], "version", ckpt
    )
    assert q2.awaitTermination(300), "stream drain timed out"

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: "a2", 2: "b1", 3: "c", 4: "d"}


def test_latest_per_key_deterministic(spark):
    from pimdb_spark.streaming.refresh import latest_per_key

    df = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 5), (1, "z", 3), (2, "q", 1)], SCHEMA
    )
    got = {r.k: r.v for r in latest_per_key(df, ["k"], "version").collect()}
    assert got == {1: "y", 2: "q"}


def test_merge_batch_survives_cache_loss(spark, tmp_path):
    """The merge must not depend on cached blocks staying resident: the
    merged result is fully written to a temp dir while the old table is
    intact, then swapped in.  Clearing every cache mid-merge (the old
    read-then-overwrite implementation corrupted the table when eviction
    or executor loss forced recomputation from deleted files) must leave
    the table complete."""
    from pyspark import StorageLevel

    from pimdb_spark.streaming.refresh import merge_batch

    table = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k int, v string, ver int"
    ).write.parquet(table)
    updates = spark.createDataFrame(
        [(2, "b2", 2), (3, "c", 2)], "k int, v string, ver int"
    )
    spark.catalog.clearCache()  # adversarial: nothing may rely on caching
    merge_batch(spark, updates, table, ["k"], "ver")
    spark.catalog.clearCache()
    got = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}


def test_swap_recovery_roll_back_and_forward(spark, tmp_path):
    """A crash in the rename gap leaves <path>.swap.old — recover_swap
    restores the table (roll back) or finishes the cleanup (roll
    forward); merge_batch runs it before every merge."""
    import os
    import shutil

    from pimdb_spark.plans.store import recover_swap, swap_directory

    table = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(table)

    # crash between the two renames: old moved aside, new never arrived
    os.rename(table, table + ".swap.old")
    assert recover_swap(table) is True
    assert {r.k for r in spark.read.parquet(table).collect()} == {1}

    # crash after the new table landed but before cleanup
    shutil.copytree(table, table + ".swap.old")
    assert recover_swap(table) is True
    assert not os.path.exists(table + ".swap.old")
    assert recover_swap(table) is False  # nothing to repair

    # normal swap path replaces contents wholesale
    tmp2 = str(tmp_path / "t2")
    spark.createDataFrame([(9, "z")], "k int, v string").write.parquet(tmp2)
    swap_directory(table, tmp2)
    assert {r.k for r in spark.read.parquet(table).collect()} == {9}

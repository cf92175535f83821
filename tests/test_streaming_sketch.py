"""Streaming CMS maintenance (streaming/sketch.py) must equal the batch
sketch exactly when items arrive split across micro-batches, with the
d x w-bounded group count, and the live sketch must estimate correctly."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
W, D = 64, 3


def test_streaming_cms_matches_batch_exactly(spark, tmp_path):
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.sketch import cms_build, cms_estimate
    from pimdb_spark.streaming.sketch import cms_stream

    docs = load(spark, SF, "documents").select("doc_id", "text")

    src = tmp_path / "items_stream"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        docs.filter(F.col("doc_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    def toks_of(df):
        return df.select(F.explode(F.split("text", " ")).alias("item"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        cms_stream(toks_of(stream), "item", W, D)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_stream")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "expected the halves in separate micro-batches"

    got = {
        (r.row, r.col): r.cnt
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    want = {
        (r.row, r.col): r.cnt
        for r in cms_build(toks_of(docs), "item", W, D).collect()
    }
    assert got == want  # exact integers, across micro-batch splits
    assert len(got) <= W * D  # hard-bounded state/output

    # the live sketch estimates correctly: never undercounts true counts
    cms_df = spark.createDataFrame(
        [(r, c, n) for (r, c), n in got.items()], ["row", "col", "cnt"]
    )
    truth = {
        r.item: r.cnt
        for r in toks_of(docs).groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    est = {
        r.item: r.est
        for r in cms_estimate(
            toks_of(docs).distinct(), cms_df, "item", W, D
        ).collect()
    }
    assert all(est[i] >= truth[i] for i in truth)


def test_streaming_hll_matches_batch_exactly(spark, tmp_path):
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.sketch import hll_estimate, hll_registers
    from pimdb_spark.streaming.sketch import hll_registers_stream

    docs = load(spark, SF, "documents").select("doc_id", "text")

    src = tmp_path / "hll_stream"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        docs.filter(F.col("doc_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    def toks_of(df):
        return df.select(F.explode(F.split("text", " ")).alias("item"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        hll_registers_stream(toks_of(stream), "item")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_stream")
        .option("checkpointLocation", str(tmp_path / "chk_hll"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "expected the halves in separate micro-batches"

    got = {
        r.bucket: r.register
        for r in spark.sql("SELECT * FROM hll_stream").collect()
    }
    want = {
        r.bucket: r.register
        for r in hll_registers(toks_of(docs), "item").collect()
    }
    assert got == want  # exact registers, across micro-batch splits
    assert len(got) <= 64

    # the live registers give the bit-identical estimate the batch gives
    live = spark.createDataFrame(
        list(got.items()), ["bucket", "register"]
    )
    e1 = hll_estimate(live).collect()[0].raw_estimate
    e2 = hll_estimate(
        hll_registers(toks_of(docs), "item")
    ).collect()[0].raw_estimate
    assert e1 == e2


def test_streaming_eh_matches_batch_exactly(spark, tmp_path):
    """EH bucket counts over a 2-micro-batch stream equal the batch
    sketch cell for cell (SUM state — the cms_stream exactly-once
    contract), and stay hard-bounded."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.sketch import eh_buckets
    from pimdb_spark.streaming.sketch import eh_stream

    docs = load(spark, SF, "documents").select("doc_id", "n_chars")

    src = tmp_path / "eh_stream_src"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"eh_stage_{name}"
        docs.filter(F.col("doc_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        eh_stream(stream.select(F.col("n_chars").alias("v")), "v")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("eh_stream_q")
        .option("checkpointLocation", str(tmp_path / "eh_chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "expected the halves in separate micro-batches"

    got = {
        (r.bkey, r.lo): r.cnt
        for r in spark.sql("SELECT * FROM eh_stream_q").collect()
    }
    want = {
        (r.bkey, r.lo): r.cnt
        for r in eh_buckets(
            docs.select(F.col("n_chars").alias("v")), "v"
        ).collect()
    }
    assert got == want
    assert len(got) <= 64 * 16

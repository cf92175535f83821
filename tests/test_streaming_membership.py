"""Streaming bloom maintenance (streaming/membership.py) must produce
bit-for-bit the batch bitmap when items arrive split across micro-batches,
with bounded state, and the refreshed bloom must serve a correct probe."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
M_BITS, K = 4096, 3


def _stage_two_files(spark, docs, tmp_path):
    src = tmp_path / "grams_stream"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        docs.filter(F.col("doc_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")
    return src


def test_streaming_bloom_matches_batch_bitmap(spark, tmp_path):
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.membership import bloom_build, bloom_probe
    from pimdb_spark.streaming.membership import bloom_words_stream

    docs = load(spark, SF, "documents").select("doc_id", "text")
    src = _stage_two_files(spark, docs, tmp_path)

    from pimdb_spark.operators.corpus import ngrams

    def grams_of(df):
        return df.select(F.explode(ngrams("text", 5)).alias("gram"))

    # one file per trigger (reader option) => the two halves arrive in
    # separate micro-batches, so the equality below really crosses a
    # batch boundary
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        bloom_words_stream(grams_of(stream), "gram", M_BITS, K)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("bloom_stream")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "expected the halves in separate micro-batches"

    got = {
        r.word_idx: r.word
        for r in spark.sql("SELECT * FROM bloom_stream").collect()
    }
    want = {
        r.word_idx: r.word
        for r in bloom_build(grams_of(docs), "gram", M_BITS, K).collect()
    }
    assert got == want  # bit-for-bit, across micro-batch splits
    assert len(got) <= M_BITS // 32  # bounded state/output by construction

    # the continuously-built bloom serves a correct probe: every gram that
    # arrived probes positive (no false negatives through streaming)
    bloom_df = spark.createDataFrame(
        list(got.items()), ["word_idx", "word"]
    )
    probed = bloom_probe(
        grams_of(docs).distinct(), "gram", bloom_df, M_BITS, K
    )
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_streaming_bloom_idempotent_under_replay(spark, tmp_path):
    """Replaying the same items (duplicate arrivals) cannot change the
    bitmap — bit_or idempotence is the no-dedup-state claim."""
    from pimdb_spark.operators.membership import bloom_build

    items = spark.createDataFrame(
        [(f"item{i % 40}",) for i in range(400)], ["item"]
    )
    once = {
        r.word_idx: r.word
        for r in bloom_build(
            items.distinct(), "item", M_BITS, K
        ).collect()
    }
    replayed = {
        r.word_idx: r.word
        for r in bloom_build(
            items.union(items), "item", M_BITS, K, distinct_items=False
        ).collect()
    }
    assert once == replayed

"""Streaming Gram maintenance (streaming/linalg.py) must equal the batch
matrix exactly when vectors arrive split across micro-batches, with the
dim-bounded group count."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
DIM = 64


def test_streaming_gram_matches_batch_exactly(spark, tmp_path):
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.linalg import gram_matrix_int8
    from pimdb_spark.streaming.linalg import gram_matrix_stream

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")

    src = tmp_path / "vec_stream"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        emb.filter(F.col("vec_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        gram_matrix_stream(stream, dim=DIM)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("gram_stream")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "expected the halves in separate micro-batches"

    got = {
        (r.i, r.j): r.gram
        for r in spark.sql("SELECT * FROM gram_stream").collect()
    }
    want = {
        (r.i, r.j): r.gram for r in gram_matrix_int8(emb, dim=DIM).collect()
    }
    assert got == want  # exact integers, across micro-batch splits
    assert len(got) == DIM * (DIM + 1) // 2  # hard-bounded group count

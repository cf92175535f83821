"""Streaming decontamination (foreachBatch + static eval side) must
produce exactly the batch operator's verdicts when the corpus arrives
split across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_decontam_matches_batch_across_splits(spark, tmp_path):
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.corpus import ngram_decontaminate
    from pimdb_spark.streaming.decontam import decontaminate_stream

    docs = load(spark, SF, "documents").select("doc_id", "text", "lang")
    eval_docs = docs.filter(F.col("doc_id") % 11 == 0)

    # corpus arrives in two flat files -> two micro-batch groups
    import glob
    import shutil

    src = tmp_path / "docs_stream"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        docs.filter(F.col("doc_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    out_path = str(tmp_path / "verdicts")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = decontaminate_stream(
        stream, eval_docs, out_path, str(tmp_path / "chk"), n=5, threshold=3
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {
        r.doc_id: (r.n_shared_ngrams, r.keep)
        for r in spark.read.parquet(out_path).collect()
    }
    expected = {
        r.doc_id: (r.n_shared_ngrams, r.keep)
        for r in ngram_decontaminate(docs, eval_docs, n=5, threshold=3).collect()
    }
    assert got == expected
    assert len(got) == docs.count()
    assert any(not v[1] for v in got.values())  # some contaminated
    assert any(v[1] for v in got.values())  # some clean

"""Streaming perplexity gate (streaming/quality.py): drained-batch parity
with the shared batch apply path, and threshold semantics against the
exact bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    from pimdb_spark.catalog import load

    return load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )


def test_gate_thresholds_match_exact_bucketing(spark):
    from pimdb_spark.operators.lm import (
        perplexity_buckets,
        perplexity_gate_thresholds,
    )

    docs = _docs(spark)
    ref = docs.filter(F.col("lang") == "en")
    buckets = perplexity_buckets(docs, ref).collect()
    thr = {
        r.lang: r.thr
        for r in perplexity_gate_thresholds(docs, ref).collect()
    }
    by_lang: dict[str, list] = {}
    for r in buckets:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        kept = [r.lm_score for r in rows if r.bucket <= 2 and r.lm_score is not None]
        assert thr[lang] == min(kept)
        # every exact-keep doc clears the bar; threshold-keeps may only ADD
        # boundary-tied docs (the stated ntile-tie edge)
        for r in rows:
            if r.bucket <= 2 and r.lm_score is not None:
                assert r.lm_score >= thr[lang]
            if r.lm_score is not None and r.lm_score > thr[lang]:
                assert r.bucket <= 2


def test_gate_stream_matches_batch_across_splits(spark, tmp_path):
    """The corpus arrives in two micro-batch files; drained per-doc
    verdicts must equal the batch perplexity_gate_apply over the whole
    corpus, with keeps and drops both present."""
    import glob
    import shutil

    from pimdb_spark.operators.lm import (
        perplexity_gate_apply,
        perplexity_gate_thresholds,
    )
    from pimdb_spark.streaming.quality import perplexity_gate_stream

    docs = _docs(spark)
    ref = docs.filter(F.col("lang") == "en")
    thresholds = perplexity_gate_thresholds(docs, ref)

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
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = perplexity_gate_stream(
        stream, ref, thresholds, out_path, str(tmp_path / "chk")
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {
        r.doc_id: (r.lang, r.n_bigrams, r.lm_score, r.keep)
        for r in spark.read.parquet(out_path).collect()
    }
    expected = {
        r.doc_id: (r.lang, r.n_bigrams, r.lm_score, r.keep)
        for r in perplexity_gate_apply(docs, ref, thresholds).collect()
    }
    assert got == expected
    assert len(got) == docs.count()
    keeps = {v[3] for v in got.values()}
    assert keeps == {0, 1}  # both verdicts occur


def test_gate_drops_unseen_group_and_unscorable(spark):
    from pimdb_spark.operators.lm import perplexity_gate_apply

    rows = [
        (0, "a b c a b c", "en"),
        (1, "a", "en"),  # unscorable: < 2 tokens
        (2, "a b c a b c", "xx"),  # group missing from thresholds
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ref = docs.filter(F.col("doc_id") == 0)
    thr = spark.createDataFrame([("en", 0.0)], ["lang", "thr"])
    got = {r.doc_id: r.keep for r in perplexity_gate_apply(docs, ref, thr).collect()}
    assert got[0] == 1
    assert got[1] == 0  # NULL score -> conservative drop
    assert got[2] == 0  # uncalibrated group -> conservative drop

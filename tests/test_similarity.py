"""Similarity operators: the Arrow/numpy cosine fast path must agree with
the exact fold-based cosine to float tolerance, and the approximate
percentile sketch must respect its error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pandas_cosine_matches_fold(spark):
    from pimdb_spark.operators.similarity import cosine, cosine_pandas

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") == F.col("ib") - 1)
    both = pairs.select(
        "ia",
        cosine(F.col("va"), F.col("vb")).alias("cos_fold"),
        cosine_pandas("va", "vb").alias("cos_np"),
    ).collect()
    assert len(both) > 100
    for r in both:
        assert abs(r.cos_fold - r.cos_np) < 1e-9


def test_approx_percentile_error_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    r = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(r.approx - r.exact) / r.exact < 0.01

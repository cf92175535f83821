"""Measure the perplexity-bucket PRODUCTION variants against the exact
per-language ntile (the q_perplexity_buckets form):

1. sampled thresholds — calibrate per-lang head/middle cut scores on a
   deterministic 1-in-3 doc_id sample (the dedup_recall contract), apply
   as a broadcast range filter;
2. EH-sketch thresholds — per-lang q33/q67 from the constant-size
   exponential-histogram sketch over integer-scaled scores
   (operators/sketch.eh_group_buckets / eh_group_quantiles, 12.5%
   relative value error at the default 3 sub-bits).

Prints one JSON line per variant: bucket agreement vs exact, keep-set
(head+middle) agreement, and disagreement counts — the numbers behind
SCALE.md's "sampled or EH-sketch thresholds" production claim.

Usage: python scripts/quality_gate_eval.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pimdb_spark.session import get_spark  # noqa: E402

SCALE = 1_000_000_000


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("quality-gate-eval")
    spark.sparkContext.setLogLevel("ERROR")

    from pimdb_spark.catalog import load
    from pimdb_spark.operators.lm import ngram_lm_score, perplexity_buckets
    from pimdb_spark.operators.sketch import eh_group_buckets, eh_group_quantiles

    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ref = docs.filter(F.col("lang") == "en")

    exact = perplexity_buckets(docs, ref).select(
        "doc_id", "lang", "lm_score", F.col("bucket").alias("b_exact")
    ).persist()
    n_docs = exact.count()

    def agree(assigned, label: str) -> None:
        j = exact.join(assigned, "doc_id")
        row = j.agg(
            F.sum((F.col("b_exact") == F.col("b_var")).cast("int")).alias("same"),
            F.sum(
                ((F.col("b_exact") <= 2) == (F.col("b_var") <= 2)).cast("int")
            ).alias("keep_same"),
        ).first()
        print(json.dumps({
            "variant": label,
            "n": n_docs,
            "bucket_agreement": round(row.same / n_docs, 4),
            "keep_agreement": round(row.keep_same / n_docs, 4),
        }))

    # -- variant 1: sampled thresholds (1-in-3 doc_id sample) --------------
    sample = docs.filter(F.col("doc_id") % 3 == 0)
    sb = perplexity_buckets(sample, ref).filter(F.col("lm_score").isNotNull())
    thr = sb.groupBy("lang").agg(
        F.min(F.when(F.col("bucket") == 1, F.col("lm_score"))).alias("t_head"),
        F.min(F.when(F.col("bucket") <= 2, F.col("lm_score"))).alias("t_mid"),
    )
    scored = ngram_lm_score(docs, ref).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    sampled = scored.join(F.broadcast(thr), "lang", "left").select(
        "doc_id",
        F.when(F.col("lm_score").isNull(), 3)
        .when(F.col("lm_score") >= F.col("t_head"), 1)
        .when(F.col("lm_score") >= F.col("t_mid"), 2)
        .otherwise(3)
        .alias("b_var"),
    )
    agree(sampled, "sampled_1in3_thresholds")

    # -- variant 2: EH-sketch thresholds ------------------------------------
    ints = scored.filter(F.col("lm_score").isNotNull()).select(
        "lang", (F.col("lm_score") * SCALE).cast("bigint").alias("v")
    )
    qs = eh_group_quantiles(
        eh_group_buckets(ints, "lang", "v"), [3334, 6667]
    )
    # scores sort DESC into buckets: top third = score above the 67th
    # percentile VALUE, so q67 is the head cut and q33 the middle cut
    tq = qs.groupBy("grp").pivot("q_bp", [3334, 6667]).agg(F.min("est"))
    sketch = scored.join(
        F.broadcast(tq.select(F.col("grp").alias("lang"), "3334", "6667")),
        "lang",
        "left",
    ).select(
        "doc_id",
        F.when(F.col("lm_score").isNull(), 3)
        .when((F.col("lm_score") * SCALE).cast("bigint") >= F.col("6667"), 1)
        .when((F.col("lm_score") * SCALE).cast("bigint") >= F.col("3334"), 2)
        .otherwise(3)
        .alias("b_var"),
    )
    agree(sketch, "eh_sketch_thresholds")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Measure the PQ codebook-training recall lift: recall@k of the
training-free pq_topk vs the k-means-trained pq_topk_trained against the
exact squared-L2 brute-force top-k (PQ's ADC approximates L2, so L2 — not
cosine — is the honest ground truth).  Prints one JSON line per variant —
the source of the trained-PQ rows in SCALE.md's ANN ladder and the
operator docstrings.

Usage: python scripts/pq_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pimdb_spark.catalog import load  # noqa: E402
from pimdb_spark.operators import similarity as S  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def exact_l2_topk(queries, candidates, k: int):
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).localCheckpoint(eager=False)
    c = candidates.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(S.sqdist(F.col("q_vec"), F.col("c_vec")), 4).alias("d"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id")
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("pq-recall")
    spark.sparkContext.setLogLevel("ERROR")

    def emb():
        return load(spark, sf, "embeddings").select("vec_id", "embedding")

    def qs():
        return emb().filter(F.col("vec_id") < n_q)

    exact = exact_l2_topk(qs(), emb(), k)
    variants = {
        "pq_training_free": S.pq_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            m=8, dim=64, n_centroids=16, k=k,
        ),
        "pq_trained_2iter": S.pq_topk_trained(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            m=8, dim=64, n_centroids=16, k=k, n_iter=2,
        ),
        "pq_trained_3iter": S.pq_topk_trained(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            m=8, dim=64, n_centroids=16, k=k, n_iter=3,
        ),
        "ivf_pq_training_free": S.ivf_pq_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16, k=k,
        ),
        "ivf_pq_trained_2iter": S.ivf_pq_topk_trained(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16, k=k, n_iter=2,
        ),
        "ivf_pq_residual": S.ivf_pq_residual_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16, k=k,
        ),
        "ivf_pq_residual_trained_2iter": S.ivf_pq_residual_topk_trained(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16, k=k, n_iter=2,
        ),
        "ivf_pq_residual_trained_3iter": S.ivf_pq_residual_topk_trained(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16, k=k, n_iter=3,
        ),
        "ivf_pq_residual_trained_4iter": S.ivf_pq_residual_topk_trained(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16, k=k, n_iter=4,
        ),
    }
    for name, approx in variants.items():
        r = (
            S.ann_recall(approx, exact, "q_id", "c_id", k=k)
            .agg(F.avg("recall").alias("r"))
            .first()[0]
        )
        print(json.dumps({"variant": name, "sf": sf, "n_queries": n_q,
                          "k": k, "mean_recall": round(r, 4)}))


if __name__ == "__main__":
    main()

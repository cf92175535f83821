"""Plan evidence for the r18 train_pq_codebooks fusion: the trained-PQ
catalog entries localCheckpoint the books row, so their committed query
plans never show the training subtree.  This script explains the TRAINING
subplan itself, before (the pre-r18 per-subspace loop, reproduced
verbatim from the unchanged clustering-module primitives it called) and
after (the shipped fused trainer), into plans/r18/pq_train_books_*.txt.

Usage: python scripts/capture_pq_train_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from pimdb_spark.catalog import load  # noqa: E402
from pimdb_spark.operators.similarity import train_pq_codebooks  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def _old_train(candidates, cand_id, vec_col, m, dim, n_centroids, n_iter):
    """The pre-r18 trainer, verbatim: m independent per-subspace chains
    over the unchanged clustering-module machinery."""
    from pimdb_spark.operators.clustering import (
        assign_clusters,
        init_centroids,
        update_centroids_exact,
    )

    sub = dim // m
    tagged = None
    for s in range(m):
        sliced = candidates.select(
            F.col(cand_id).alias("vec_id"),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("embedding"),
        )
        cents = init_centroids(sliced, n_centroids)
        for _ in range(n_iter - 1):
            assigned = assign_clusters(sliced, cents)
            cents = update_centroids_exact(assigned, sliced, cents, sub)
        t = cents.select(F.lit(s).alias("s"), "cid", "cvec")
        tagged = t if tagged is None else tagged.unionByName(t)
    flat = tagged.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("s"), F.col("cid"), F.col("cvec")))
        ).alias("_flat")
    )
    return flat.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda si: F.transform(
                F.slice(F.col("_flat"), si * n_centroids + 1, n_centroids),
                lambda r: r["cvec"],
            ),
        ).alias("books")
    )


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> int:
    spark = get_spark("pq-train-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, "/root/testdata/sf0.1", "embeddings")
    out = os.path.join(REPO, "plans", "r18")
    os.makedirs(out, exist_ok=True)
    before = _old_train(emb, "vec_id", "embedding", 8, 64, 16, 2)
    after = train_pq_codebooks(emb, "vec_id", "embedding", m=8, dim=64, n_centroids=16, n_iter=2)
    for tag, df in (("before", before), ("after", after)):
        plan = _explain(df)
        path = os.path.join(out, f"pq_train_books_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"wrote {path}: {plan.count('Exchange')} Exchange refs, "
            f"{plan.count('Scan parquet')} parquet scans"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Plan evidence for the r19 projection-form PQ-training assignment: the
trained-PQ catalog entries localCheckpoint the books row, so their
committed query plans never show the training subtree.  This script
explains the TRAINING subplan itself, before (the r18 fused trainer,
reproduced verbatim: broadcast equi-join on s + per-(s, vec) groupBy
argmin + members join-back) and after (the shipped projection-form
assignment), into plans/r19/pq_train_books_*.txt.

Usage: python scripts/capture_pq_train_plans_r19.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pimdb_spark.catalog import load  # noqa: E402
from pimdb_spark.operators.similarity import sqdist, train_pq_codebooks  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def _r18_train(candidates, cand_id, vec_col, m, dim, n_centroids, n_iter):
    """The r18 fused trainer, verbatim: one chain over (s, vec_id,
    sub-vector) rows, but with the aggregate-form assignment (broadcast
    equi-join on s + groupBy(s, vec_id) min(struct) + members join-back
    before the update groupBy)."""
    sub = dim // m
    sliced = candidates.select(
        F.col(cand_id).alias("vec_id"),
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)])
        ).alias("s", "embedding"),
    )
    w = Window.orderBy("vec_id")
    head = (
        candidates.select(F.col(cand_id).alias("vec_id"), F.col(vec_col).alias("_v"))
        .orderBy("vec_id")
        .limit(n_centroids)
        .select((F.row_number().over(w) - 1).alias("cid"), "_v")
    )
    cents = head.select(
        "cid",
        F.posexplode(
            F.array(
                *[
                    F.transform(
                        F.slice(F.col("_v"), s * sub + 1, sub),
                        lambda x: x.cast("double"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("s", "cvec"),
    ).select("s", "cid", "cvec")
    for _ in range(n_iter - 1):
        d = sqdist(F.col("embedding"), F.col("cvec"))
        assigned = (
            sliced.join(F.broadcast(cents), "s")
            .groupBy("s", "vec_id")
            .agg(F.min(F.struct(d.alias("_d"), F.col("cid"))).alias("_m"))
            .select("s", "vec_id", F.col("_m.cid").alias("cid"))
        )
        members = assigned.join(sliced, ["s", "vec_id"])
        lst = F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("vec_id").alias("_sid"),
                    F.transform(
                        F.col("embedding"), lambda x: x.cast("double")
                    ).alias("_sv"),
                )
            )
        )
        summed = F.aggregate(
            lst,
            F.array_repeat(F.lit(0.0), sub),
            lambda acc, sv: F.zip_with(acc, sv["_sv"], lambda a, x: a + x),
        )
        upd = (
            members.groupBy("s", "cid")
            .agg(F.count(F.lit(1)).alias("_n"), summed.alias("_sum"))
            .select(
                "s",
                "cid",
                F.transform(F.col("_sum"), lambda x: x / F.col("_n")).alias("_new"),
            )
        )
        cents = cents.join(upd, ["s", "cid"], "left").select(
            "s", "cid", F.coalesce(F.col("_new"), F.col("cvec")).alias("cvec")
        )
    flat = cents.agg(
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
    spark = get_spark("pq-train-plan-capture-r19")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, "/root/testdata/sf0.1", "embeddings")
    out = os.path.join(REPO, "plans", "r19")
    os.makedirs(out, exist_ok=True)
    before = _r18_train(emb, "vec_id", "embedding", 8, 64, 16, 2)
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

"""Measure the PQ codebook-training recall lift: recall@k of the
training-free pq_topk vs the k-means-trained pq_topk_trained against the
exact squared-L2 brute-force top-k (PQ's ADC approximates L2, so L2 — not
cosine — is the honest ground truth).  Prints one JSON line per variant —
the source of the trained-PQ rows in SCALE.md's ANN ladder and the
operator docstrings.

Usage: python scripts/pq_recall.py [--clustered] [sf_dir] [n_queries] [k]

--clustered swaps the corpus for a deterministic 3-level mixture derived
from the same vec_ids: 8 well-separated integer coarse centers (vec_id %
8), +-1.2 sub-offsets ((vec_id // 8) % 4), and +-0.3 per-subspace
patterns (xxhash64-keyed, 4 per subspace) — built so each 8-dim RESIDUAL
subvector takes exactly 16 = n_centroids distinct values while the raw
subvector takes 128, the regime where the residual layout can show when
it pays (see clustered_embeddings below for the full construction).  The testdata's embeddings are
unstructured (coarse cells explain ~no variance), which is why raw
trained IVF-PQ beat both residual variants there (the two honest
negatives in SCALE.md); this mode is the discriminating experiment the
r13 verdict ordered (item 5).  Note vec_id % 8 makes the training-free
lowest-id coarse seeds (vec_ids 0..7) land one per true cluster.
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


def clustered_embeddings(base, dim: int = 64, n_clusters: int = 8):
    """Deterministic clustered fixture over the SAME vec_ids, built so the
    residual layout CAN pay: three discrete levels, every one of them
    integer-derived (reproducible, no RNG).

    - coarse: cluster c = vec_id % 8, integer centers in [-6, 6] varied
      per (c, dim) — separation ~sqrt(1800), dwarfs everything below, so
      true neighbors share c and the training-free lowest-id coarse seeds
      (vec_ids 0..7, one per c) assign cells correctly;
    - sub-offset: s = (vec_id // 8) % 4, amplitude +-1.2 — the signal
      exact L2 ranks on within a cell;
    - per-subspace pattern: p = xxhash64(vec_id, subspace) % 4,
      amplitude +-0.3 — the fine-ranking signal.

    The point: per 8-dim subspace the RESIDUAL takes exactly 4 x 4 = 16
    distinct values — precisely n_centroids, so trained per-cell-free
    residual codebooks can represent the within-cell signal EXACTLY —
    while the RAW subvector takes 8 x 4 x 4 = 128 distinct values, 8x the
    codebook, forcing collisions for any raw-vector PQ.  On the testdata's
    unstructured embeddings the opposite holds (residuals are noise,
    coarse explains nothing) — which is why trained raw IVF-PQ won there
    (SCALE.md's two honest negatives)."""
    c = F.col("vec_id") % n_clusters
    s = (F.col("vec_id") / n_clusters).cast("long") % 4
    js = F.sequence(F.lit(0), F.lit(dim - 1))

    def coord(j):
        center = ((c * 37 + j * 11 + (c * j) % 7) % 13 - 6).cast("double")
        off = (((s * 23 + j * 7) % 5 - 2) * 0.6).cast("double")
        p = F.pmod(
            F.xxhash64(F.col("vec_id"), (j / 8).cast("long"), F.lit("pqpat")),
            F.lit(4),
        )
        pat = (((p * 19 + j * 13) % 7 - 3) * 0.1).cast("double")
        return (center + off + pat).cast("float")

    return base.select(
        "vec_id", F.transform(js, coord).alias("embedding")
    )


def main() -> None:
    args = list(sys.argv[1:])
    clustered = "--clustered" in args
    if clustered:
        args.remove("--clustered")
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    n_q = int(args[1]) if len(args) > 1 else 16
    k = int(args[2]) if len(args) > 2 else 3
    spark = get_spark("pq-recall")
    spark.sparkContext.setLogLevel("ERROR")

    def emb():
        base = load(spark, sf, "embeddings").select("vec_id", "embedding")
        if clustered:
            return clustered_embeddings(base)
        return base

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
        # two-stage shortlist -> exact re-rank (metric=l2: re-rank in the
        # ground-truth metric, so recall@k = the shortlist's hit rate on
        # the true top-k — what re-ranking recovers over raw ADC order)
        "pq_rerank_s6_l2": S.pq_adc_rerank_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            m=8, dim=64, n_centroids=16, shortlist=6, k=k, metric="l2",
        ),
        "pq_rerank_s12_l2": S.pq_adc_rerank_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            m=8, dim=64, n_centroids=16, shortlist=12, k=k, metric="l2",
        ),
        "pq_rerank_s24_l2": S.pq_adc_rerank_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            m=8, dim=64, n_centroids=16, shortlist=24, k=k, metric="l2",
        ),
        # the full stack: IVF prune -> ADC shortlist -> exact re-rank
        # (recall here is additionally bounded by probe coverage)
        "ivf_pq_rerank_s12_l2": S.ivf_pq_rerank_topk(
            qs(), emb(), "vec_id", "vec_id", "embedding",
            n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16,
            shortlist=12, k=k, metric="l2",
        ),
        # trained fine codebooks feeding the same re-rank stage (the
        # composition SCALE.md's reading recommends: training improves
        # shortlist MEMBERSHIP, re-rank fixes ORDER)
        "ivf_pq_trained_rerank_s12_l2": S.exact_rerank(
            S.ivf_pq_topk_trained(
                qs(), emb(), "vec_id", "vec_id", "embedding",
                n_cells=8, nprobe=2, m=8, dim=64, n_centroids=16,
                k=12, n_iter=2,
            ).select("q_id", "c_id"),
            qs(), emb(), "vec_id", "vec_id", "embedding", k=k, metric="l2",
        ),
    }
    for name, approx in variants.items():
        r = (
            S.ann_recall(approx, exact, "q_id", "c_id", k=k)
            .agg(F.avg("recall").alias("r"))
            .first()[0]
        )
        print(json.dumps({"variant": name, "sf": sf, "n_queries": n_q,
                          "k": k, "clustered": clustered,
                          "mean_recall": round(r, 4)}))


if __name__ == "__main__":
    main()

"""Linear quality-classifier training over hashed bag-of-words features —
the fastText / CCNet modality (Joulin et al. 2016; Wenzek et al. 2020):
large-scale curation pipelines gate documents with a cheap linear model
over hashed n-gram features.  This module trains one INSIDE the engine
as a batch perceptron: every quantity is an integer (hashed feature
counts, weights, scores, epoch-batched updates), so training is
deterministic, order-free, and bit-reproducible across engines — the
property that lets a DuckDB oracle replay it epoch for epoch.

Batch (not online) perceptron on purpose: the classic per-sample update
is order-dependent and inherently sequential, which distributes badly
and can never be oracle-exact.  The batch variant sums the updates of
every misclassified doc per epoch (margin y * score <= 0 counts as
misclassified, so the zero-weight first epoch updates on ALL docs) —
a pure map-side-combinable aggregation.

Scale: the feature frame is corpus-sized; per epoch the engine runs one
broadcast join against the (n_features + 1)-row weight frame, one
per-doc score groupBy, one label join, and one per-feature delta
groupBy — all map-side combined, no corpus-global shuffle beyond the
doc/feature keys.  Epochs are driver-sequenced with localCheckpoint
per round (the house bpe_train/kmeans pattern) so plan depth stays
constant.  The bias is folded in as a constant feature (index
``n_features``, count 1 per doc) — no special case anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_token_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
) -> DataFrame:
    """Hashed bag-of-words features: one (id, feat, cnt) row per distinct
    hashed token per doc, plus the bias row (feat = ``n_features``,
    cnt = 1).  Feature index = first-8-hex-chars-of-md5 mod n_features —
    the repo's engine-portable 32-bit hash, non-negative, so plain ``%``
    agrees across engines without pmod gymnastics."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    feat = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("bigint")
        % n_features
    )
    counts = (
        tok.select("_id", feat.alias("feat"))
        .groupBy("_id", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bias = docs.select(
        F.col(id_col).alias("_id"),
        F.lit(n_features).cast("bigint").alias("feat"),
        F.lit(1).cast("bigint").alias("cnt"),
    )
    return counts.select(
        "_id", "feat", F.col("cnt").cast("bigint").alias("cnt")
    ).unionByName(bias)


def _scores(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """Integer dot product per doc against the broadcast weight frame."""
    return (
        feats.join(F.broadcast(weights), "feat", "left")
        .groupBy("_id")
        .agg(
            F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))).alias(
                "score"
            )
        )
    )


def train_perceptron(
    feats: DataFrame,
    labels: DataFrame,
    epochs: int = 3,
) -> DataFrame:
    """Batch-perceptron training: ``feats`` from hashed_token_features,
    ``labels`` = (_id, y) with y in {+1, -1}.  Returns the (feat, w)
    weight frame after ``epochs`` rounds.  Margin y * score <= 0 is
    misclassified (ties update — the zero-weight epoch 1 updates on
    every doc, giving the summed-label initialization).  Every update
    is a SUM over misclassified docs, so the result is independent of
    row order and partitioning — bit-reproducible."""
    spark = feats.sparkSession
    w = spark.createDataFrame([], "feat bigint, w bigint")
    labels = labels.select(F.col(labels.columns[0]).alias("_id"), "y")
    for epoch in range(epochs):
        if epoch == 0:
            # w is identically zero, so every doc's score is exactly 0
            # and the margin filter y * 0 <= 0 passes EVERY doc: the
            # misclassified set IS the label frame.  Skipping the scoring
            # pass is value-identical by construction (the oracle's
            # epoch-1 CTE takes the same shortcut) and saves one full
            # corpus-sized broadcast-join + per-doc groupBy job.
            mis = labels
        else:
            mis = (
                _scores(feats, w)
                .join(labels, "_id")
                .filter(F.col("y") * F.col("score") <= 0)
                .select("_id", "y")
            )
        deltas = (
            feats.join(mis, "_id")
            .groupBy("feat")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("d"))
        )
        w = (
            w.join(deltas, "feat", "full")
            .select(
                "feat",
                (
                    F.coalesce(F.col("w"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                ).alias("w"),
            )
            .localCheckpoint(eager=False)
        )
    return w


def perceptron_score(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc against a trained weight frame: (id, score, pred,
    label, correct).  pred = sign with the same tie rule as training
    (score <= 0 predicts the negative class), all integers."""
    labels = labels.select(F.col(labels.columns[0]).alias("_id"), "y")
    pred = F.when(F.col("score") > 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        _scores(feats, weights)
        .join(labels, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.col("score").cast("bigint").alias("score"),
            pred.cast("int").alias("pred"),
            F.col("y").cast("int").alias("label"),
            F.when(pred == F.col("y"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("correct"),
        )
    )

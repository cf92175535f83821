"""Batch-perceptron quality classifier (operators/classify.py): exact
python-model training parity, convergence on a separable corpus, and
partitioning-independence of the all-integer updates."""

from __future__ import annotations

from collections import Counter
from hashlib import md5

from pyspark.sql import Row
from pyspark.sql import functions as F

from pimdb_spark.operators.classify import (
    hashed_token_features,
    perceptron_score,
    train_perceptron,
)


def _feat(tok: str, n: int) -> int:
    return int(md5(tok.encode()).hexdigest()[:8], 16) % n


def _py_train(docs, n_features, epochs):
    """Reference batch perceptron: dict weights, summed updates."""
    feats = {}
    for i, text, _y in docs:
        c = Counter(_feat(t, n_features) for t in text.split(" "))
        c[n_features] += 1  # bias feature
        feats[i] = c
    y = {i: yy for i, _t, yy in docs}
    w: Counter = Counter()
    for _ in range(epochs):
        mis = [
            i
            for i in feats
            if y[i] * sum(cnt * w[f] for f, cnt in feats[i].items()) <= 0
        ]
        upd: Counter = Counter()
        for i in mis:
            for f, cnt in feats[i].items():
                upd[f] += y[i] * cnt
        w.update(upd)
    scores = {
        i: sum(cnt * w[f] for f, cnt in feats[i].items()) for i in feats
    }
    return dict(w), scores


def _corpus():
    # separable by vocabulary: "good" docs use g-words, "bad" use b-words,
    # with one shared stopword to keep it non-trivial
    return [
        (1, "good clean prose the", 1),
        (2, "clean good good text the", 1),
        (3, "prose text clean the good", 1),
        (4, "spam junk the spam", -1),
        (5, "junk spam junk noise the", -1),
        (6, "noise the junk noise spam", -1),
    ]


def test_perceptron_matches_python_model(spark):
    docs = _corpus()
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t, _y in docs]
    )
    labels = spark.createDataFrame(
        [Row(doc_id=i, y=y) for i, _t, y in docs]
    )
    n, epochs = 16, 3
    feats = hashed_token_features(df, n_features=n)
    w = train_perceptron(feats, labels, epochs=epochs)
    got_w = {r.feat: r.w for r in w.collect() if r.w != 0}
    exp_w, exp_scores = _py_train(docs, n, epochs)
    assert got_w == {f: v for f, v in exp_w.items() if v != 0}

    out = {
        r.doc_id: (r.score, r.pred, r.label, r.correct)
        for r in perceptron_score(feats, labels, w).collect()
    }
    for i, _t, y in docs:
        s = exp_scores[i]
        pred = 1 if s > 0 else -1
        assert out[i] == (s, pred, y, int(pred == y)), i


def test_perceptron_converges_on_separable_corpus(spark):
    """The synthetic-testdata catalog entry sits near base rate because
    its labels are text-independent; HERE the vocabulary separates the
    classes and training must reach 100% within a few epochs."""
    docs = _corpus()
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t, _y in docs]
    )
    labels = spark.createDataFrame(
        [Row(doc_id=i, y=y) for i, _t, y in docs]
    )
    feats = hashed_token_features(df, n_features=32)
    w = train_perceptron(feats, labels, epochs=5)
    out = perceptron_score(feats, labels, w)
    assert out.agg(F.sum("correct")).collect()[0][0] == len(docs)


def test_perceptron_partitioning_independent(spark):
    """All-integer batch updates: identical weights whatever the input
    partitioning (the property per-sample perceptrons lack)."""
    docs = _corpus()
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t, _y in docs]
    )
    labels = spark.createDataFrame(
        [Row(doc_id=i, y=y) for i, _t, y in docs]
    )
    a = train_perceptron(
        hashed_token_features(df, n_features=16), labels, epochs=3
    )
    b = train_perceptron(
        hashed_token_features(df.repartition(7), n_features=16),
        labels.repartition(3),
        epochs=3,
    )
    assert sorted((r.feat, r.w) for r in a.collect()) == sorted(
        (r.feat, r.w) for r in b.collect()
    )


def test_hashed_features_bias_row(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a a b")])
    rows = hashed_token_features(df, n_features=8).collect()
    bias = [r for r in rows if r.feat == 8]
    assert len(bias) == 1 and bias[0].cnt == 1
    token_rows = {r.feat: r.cnt for r in rows if r.feat != 8}
    assert sum(token_rows.values()) == 3  # counts, not presence
    assert all(0 <= f < 8 for f in token_rows)


def test_epoch_one_weights_are_summed_labels(spark):
    """Epoch 1's shortcut contract (builder r19): with w0 = 0 every
    margin is 0 <= 0, so the misclassified set is ALL docs and the
    epoch-1 weights are exactly sum(y * cnt) per feature — the training
    loop skips the provably-all-zero scoring pass."""
    docs = _corpus()
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t, _y in docs])
    labels = spark.createDataFrame([Row(doc_id=i, y=y) for i, _t, y in docs])
    feats = hashed_token_features(df, n_features=16)
    w1 = {r.feat: r.w for r in train_perceptron(feats, labels, epochs=1).collect()}
    direct = {
        r.feat: r.d
        for r in feats.join(
            labels.select(F.col("doc_id").alias("_id"), "y"), "_id"
        )
        .groupBy("feat")
        .agg(F.sum(F.col("y") * F.col("cnt")).alias("d"))
        .collect()
    }
    assert w1 == direct

"""N-gram LM quality scoring (operators/lm.py) against an independent
pure-Python bigram-LM model."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

SCALE = 1_000_000_000


def _py_scores(docs: dict[int, str], ref_ids: set[int]):
    bi: Counter = Counter()
    vocab: set[str] = set()
    for i in ref_ids:
        toks = docs[i].split(" ")
        vocab.update(toks)
        bi.update(zip(toks, toks[1:]))
    ctx: Counter = Counter()
    for (w1, _), c in bi.items():
        ctx[w1] += c
    v = len(vocab)
    out = {}
    for i, text in docs.items():
        toks = text.split(" ")
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[i] = (0, None)
            continue
        s = sum((bi[p] + 1) * SCALE // (ctx[p[0]] + v) for p in pairs)
        out[i] = (len(pairs), s / (len(pairs) * SCALE))
    return out


def test_ngram_lm_score_matches_python_model(spark):
    from pimdb_spark.operators.lm import ngram_lm_score

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for i in range(150)
    }
    ref_ids = {i for i in docs if i % 3 == 0}

    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    ref = df.filter(F.col("doc_id") % 3 == 0)
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in ngram_lm_score(df, ref).collect()
    }
    want = _py_scores(docs, ref_ids)
    assert set(got) == set(want)
    for i in docs:
        assert got[i][0] == want[i][0]
        if want[i][1] is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == want[i][1]  # integer-exact: bit equality

    # the reference slice itself must outscore out-of-domain text: a doc
    # of never-seen tokens scores at the smoothing floor
    alien = spark.createDataFrame([(999, "z1 z2 z3 z4")], ["doc_id", "text"])
    alien_score = ngram_lm_score(alien, ref).collect()[0].lm_score
    ref_mean = sum(
        want[i][1] for i in ref_ids if want[i][1] is not None
    ) / len(ref_ids)
    assert alien_score < ref_mean


def test_interpolated_lm_matches_python_model(spark):
    from pimdb_spark.operators.lm import ngram_lm_score_interpolated

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(25)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for i in range(120)
    }
    ref_ids = {i for i in docs if i % 4 == 0}

    bi: Counter = Counter()
    uni: Counter = Counter()
    vocab_set: set[str] = set()
    for i in ref_ids:
        toks = docs[i].split(" ")
        vocab_set.update(toks)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    ctx: Counter = Counter()
    for (w1, _), c in bi.items():
        ctx[w1] += c
    v, t = len(vocab_set), sum(uni.values())

    def score(text):
        pairs = list(zip(text.split(" "), text.split(" ")[1:]))
        if not pairs:
            return (0, None)
        s = sum(
            (3 * (bi[p] + 1) * SCALE) // (4 * (ctx[p[0]] + v))
            + (1 * (uni[p[1]] + 1) * SCALE) // (4 * (t + v))
            for p in pairs
        )
        return (len(pairs), s / (len(pairs) * SCALE))

    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    ref = df.filter(F.col("doc_id") % 4 == 0)
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in ngram_lm_score_interpolated(df, ref).collect()
    }
    for i, text in docs.items():
        n, sc = score(text)
        assert got[i][0] == n
        if sc is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == sc  # integer-exact bit equality

    # interpolation must soften the unseen-bigram penalty: a doc of seen
    # words in an unseen ORDER outscores a doc of never-seen words
    seen_words = " ".join(sorted(vocab_set)[:5])
    got2 = {
        r.doc_id: r.lm_score
        for r in ngram_lm_score_interpolated(
            spark.createDataFrame(
                [(1, seen_words), (2, "zz1 zz2 zz3 zz4 zz5")],
                ["doc_id", "text"],
            ),
            ref,
        ).collect()
    }
    assert got2[1] > got2[2]


def test_dsir_importance_matches_python_model(spark):
    """dsir_importance vs a direct python model: hashed-bigram counts,
    add-one surrogate log-probs over B buckets, target-minus-raw
    weight — every doc's BIGINT weight exact, short docs at 0."""
    from hashlib import md5 as _md5

    from pyspark.sql import Row

    from pimdb_spark.operators.lm import SCALE, dsir_importance

    rng = random.Random(7)
    tvocab = ["clean", "prose", "text", "the", "good"]
    rvocab = ["spam", "junk", "the", "noise", "good"]
    docs = []
    for i in range(12):
        v = tvocab if i % 2 == 0 else rvocab
        docs.append((i, " ".join(rng.choice(v) for _ in range(rng.randint(2, 15))), "en" if i % 2 == 0 else "xx"))
    docs.append((99, "solo", "xx"))  # 1 token: no bigrams, weight 0

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, t, lang in docs]
    )
    target = df.filter(F.col("lang") == "en")
    B = 64
    got = {
        r.doc_id: (r.n_bigrams, r.weight)
        for r in dsir_importance(df, target, n_buckets=B).collect()
    }

    def feats(text):
        t = text.split(" ")
        return Counter(
            int(_md5((t[i] + " " + t[i + 1]).encode()).hexdigest()[:8], 16)
            % B
            for i in range(len(t) - 1)
        )

    tgt: Counter = Counter()
    nt = 0
    for i, t, lang in docs:
        if lang == "en":
            f = feats(t)
            tgt.update(f)
            nt += sum(f.values())
    raw: Counter = Counter()
    nr = 0
    for i, t, lang in docs:
        f = feats(t)
        raw.update(f)
        nr += sum(f.values())

    for i, t, lang in docs:
        f = feats(t)
        w = sum(
            c
            * (
                (tgt[k] + 1) * SCALE // (nt + B)
                - (raw[k] + 1) * SCALE // (nr + B)
            )
            for k, c in f.items()
        )
        assert got[i] == (sum(f.values()), w), i
    assert got[99] == (0, 0)

    # the selection property DSIR exists for: target-domain docs
    # outrank raw-domain docs on mean weight
    en_w = [got[i][1] for i, _t, lang in docs if lang == "en"]
    xx_w = [got[i][1] for i, _t, lang in docs if lang == "xx" and i != 99]
    assert sum(en_w) / len(en_w) > sum(xx_w) / len(xx_w)

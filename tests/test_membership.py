"""Bloom-filter membership sketch (operators/membership.py): no false
negatives ever, false positives bounded and audited, and the
decontamination verdict identical to the exact-join form."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _py_positions(item: str, k: int, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"{item}:{j}".encode()).hexdigest()[:8], 16) % m
        for j in range(k)
    ]


def test_bloom_no_false_negatives_and_python_model_parity(spark):
    from pimdb_spark.operators.membership import bloom_build, bloom_probe

    rng = random.Random(11)
    members = [f"m{rng.randint(0, 10_000)}" for _ in range(300)]
    others = [f"x{rng.randint(0, 10_000)}" for _ in range(300)]
    m_bits, k = 4096, 3

    items = spark.createDataFrame([(s,) for s in members], ["item"])
    bloom = bloom_build(items, "item", m_bits, k)

    # python bitmap model built from the same md5 positions
    bits = set()
    for s in set(members):
        bits.update(_py_positions(s, k, m_bits))
    words = {}
    for p in bits:
        words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    got_words = {r.word_idx: r.word for r in bloom.collect()}
    assert got_words == words

    probes = spark.createDataFrame(
        [(s,) for s in set(members) | set(others)], ["item"]
    )
    got = {
        r.item: r.bloom_hit
        for r in bloom_probe(probes, "item", bloom, m_bits, k).collect()
    }
    member_set = set(members)
    for s in member_set:
        assert got[s], "bloom false negative"
    for s in set(others) - member_set:
        want = all(p in bits for p in _py_positions(s, k, m_bits))
        assert got[s] == want  # FP iff all k positions collide


def test_bloom_decontaminate_matches_exact_join_verdict(spark):
    from pimdb_spark.operators.corpus import ngram_decontaminate
    from pimdb_spark.operators.membership import bloom_decontaminate

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
            for i in range(120)
        ],
        ["doc_id", "text"],
    )
    eval_docs = docs.filter(F.col("doc_id") % 13 == 0)

    blm = bloom_decontaminate(
        docs, eval_docs, n=5, m_bits=65536, k_hashes=3, threshold=3
    )
    exact = ngram_decontaminate(docs, eval_docs, n=5, threshold=3)

    b = {r.doc_id: r for r in blm.collect()}
    e = {r.doc_id: (r.n_shared_ngrams, r.keep) for r in exact.collect()}
    assert set(b) == set(e)
    for doc_id, row in b.items():
        n_shared, keep = e[doc_id]
        assert row.exact_hits == n_shared  # bloom FPs never reach exact_hits
        assert row.keep == keep
        assert row.bloom_hits >= row.exact_hits  # FPs only ever add
        assert row.n_grams >= row.bloom_hits


def test_rotating_bloom_slices_and_expiry(spark):
    from pimdb_spark.operators.membership import (
        bloom_build,
        bloom_build_sliced,
        bloom_probe,
        bloom_union_live,
    )

    m_bits, k = 4096, 3
    rng = random.Random(3)
    rows = [
        (f"s{i % 3}", f"item{rng.randint(0, 500)}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["day", "item"])
    sliced = bloom_build_sliced(df, "item", "day", m_bits, k)

    # each slice's bitmap equals an independent bloom over its items
    for day in ("s0", "s1", "s2"):
        want = {
            r.word_idx: r.word
            for r in bloom_build(
                df.filter(F.col("day") == day), "item", m_bits, k
            ).collect()
        }
        got = {
            r.word_idx: r.word
            for r in sliced.filter(F.col("slice") == day)
            .select("word_idx", "word")
            .collect()
        }
        assert got == want

    # the live union bloom == a bloom over the union of live items
    live = bloom_union_live(sliced, ["s0", "s1"])
    want_union = {
        r.word_idx: r.word
        for r in bloom_build(
            df.filter(F.col("day").isin("s0", "s1")), "item", m_bits, k
        ).collect()
    }
    assert {r.word_idx: r.word for r in live.collect()} == want_union

    # expiry: an item ONLY in the dropped slice probes negative against
    # the live union unless all its bits collide with live bits
    s2_only = (
        df.filter(F.col("day") == "s2")
        .select("item")
        .subtract(df.filter(F.col("day").isin("s0", "s1")).select("item"))
    )
    probed = bloom_probe(s2_only, "item", live, m_bits, k)
    # the load factor is low enough that most retired items really expire
    n = probed.count()
    n_expired = probed.filter(~F.col("bloom_hit")).count()
    assert n > 0 and n_expired > n * 0.5
    # and nothing live ever expires (no false negatives through rotation)
    live_items = df.filter(F.col("day").isin("s0", "s1")).select("item").distinct()
    assert (
        bloom_probe(live_items, "item", live, m_bits, k)
        .filter(~F.col("bloom_hit"))
        .count()
        == 0
    )


import pytest  # noqa: E402


@pytest.mark.parametrize("seed", range(6))
def test_bloom_randomized_matches_python_model(spark, seed):
    """Randomized layouts vs the python bitmap model: arbitrary m
    (multiple of 32, including the minimal single-word bloom), k, member
    multisets with duplicates, and an EMPTY member set (every probe must
    be definitely-not-member against a zero-row bloom)."""
    from pimdb_spark.operators.membership import bloom_build, bloom_probe

    rng = random.Random(seed)
    m_bits = 32 * rng.choice([1, 2, 8, 64, 128])
    k = rng.randint(1, 4)
    n_members = rng.choice([0, 1, rng.randint(2, 120)])
    members = [f"v{rng.randint(0, 200)}" for _ in range(n_members)]
    probes = list({f"v{rng.randint(0, 400)}" for _ in range(80)} | set(members))

    items = spark.createDataFrame(
        [(s,) for s in members] or [("_none_",)], ["item"]
    )
    if not members:
        items = items.filter("item <> '_none_'")  # genuinely empty frame
    bloom = bloom_build(items, "item", m_bits, k)

    bits = set()
    for s in set(members):
        bits.update(_py_positions(s, k, m_bits))
    got = {
        r.item: r.bloom_hit
        for r in bloom_probe(
            spark.createDataFrame([(s,) for s in probes], ["item"]),
            "item",
            bloom,
            m_bits,
            k,
        ).collect()
    }
    for s in probes:
        want = all(p in bits for p in _py_positions(s, k, m_bits))
        assert got[s] == want, (s, m_bits, k)
    for s in set(members):
        assert got[s]  # no false negative, ever

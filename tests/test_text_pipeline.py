"""Round-15 text-pipeline operators (operators/text.py, operators/lm.py):
PII detection/redaction, CCNet text normalization, and CCNet perplexity
bucketing — semantics pinned against hand-computed cases and an
independent pure-Python ranking model.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_pii_counts_and_redact(spark):
    from pimdb_spark.operators.text import pii_counts, pii_redact

    rows = [
        (0, "mail me at a.b+c@sub.example.org or x9@y.io thanks"),
        (1, "server 10.0.255.3 then 192.168.1.17 end"),
        (2, "dial +1-555-0199 now"),
        (3, "plain text with no identifiers at all"),
        (4, "mix bob@corp.com from 8.8.8.8 call +1-555-7777"),
        (5, "1.2.3.4"),  # bare IP, boundaries at string edges
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = pii_counts("text")
    got = {
        r.doc_id: (r.n_email, r.n_ip, r.n_phone, r.clean)
        for r in df.select(
            "doc_id",
            c["n_email"].alias("n_email"),
            c["n_ip"].alias("n_ip"),
            c["n_phone"].alias("n_phone"),
            pii_redact("text").alias("clean"),
        ).collect()
    }
    assert got[0] == (2, 0, 0, "mail me at <EMAIL> or <EMAIL> thanks")
    assert got[1] == (0, 2, 0, "server <IP> then <IP> end")
    assert got[2] == (0, 0, 1, "dial <PHONE> now")
    assert got[3] == (0, 0, 0, "plain text with no identifiers at all")
    assert got[4] == (1, 1, 1, "mix <EMAIL> from <IP> call <PHONE>")
    assert got[5] == (0, 1, 0, "<IP>")


def test_normalize_text_cases_and_idempotence(spark):
    from pimdb_spark.operators.text import normalize_text

    rows = [
        (0, "  A,b!! 123 c   d "),
        (1, "already normal text"),
        (2, "UPPER    CASE"),
        (3, "tabs\tand?punct;everywhere"),
        (4, "digits42mixed7in8words"),
    ]
    want = {
        0: "a b 0 c d",
        1: "already normal text",
        2: "upper case",
        3: "tabs and punct everywhere",
        4: "digits0mixed0in0words",
    }
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = df.select(
        "doc_id",
        normalize_text("text").alias("n1"),
        normalize_text(normalize_text("text")).alias("n2"),
    )
    for r in out.collect():
        assert r.n1 == want[r.doc_id], r.doc_id
        assert r.n2 == r.n1  # idempotent: normalizing a normal form is a no-op


def test_perplexity_buckets_ranking_model(spark):
    """Bucket assignment must equal the pure-Python rank model: within
    each lang, docs sorted by (score DESC NULLS LAST, doc_id) and cut
    into 3 SQL-ntile buckets (first n%3 buckets one larger)."""
    from pimdb_spark.operators.lm import ngram_lm_score, perplexity_buckets

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(90):
        lang = ["en", "es", "de"][i % 3]
        n = 0 if i == 77 else rng.randint(1, 25)  # one unscorable doc
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(max(n, 1))) if n else "x", lang))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ref = df.filter(F.col("lang") == "en")

    scores = {
        r.doc_id: r.lm_score for r in ngram_lm_score(df, ref).collect()
    }
    got = {
        r.doc_id: (r.bucket, r.bucket_label)
        for r in perplexity_buckets(df, ref, n_buckets=3).collect()
    }

    langs = {i: r for i, _, r in [(a, b, c) for a, b, c in rows]}
    for lang in ("en", "es", "de"):
        ids = [i for i in langs if langs[i] == lang]
        # unscorable docs take the tail bucket DIRECTLY; the ntile runs
        # over scored docs only (the enforced contract)
        null_ids = [i for i in ids if scores[i] is None]
        ids = sorted(
            (i for i in ids if scores[i] is not None),
            key=lambda i: (-scores[i], i),
        )
        n = len(ids)
        base, extra = divmod(n, 3)
        want_bucket = {i: 3 for i in null_ids}
        pos = 0
        for b in range(1, 4):
            size = base + (1 if b <= extra else 0)
            for i in ids[pos : pos + size]:
                want_bucket[i] = b
            pos += size
        for i in ids + null_ids:
            assert got[i][0] == want_bucket[i], (lang, i)
            assert got[i][1] == ["head", "middle", "tail"][want_bucket[i] - 1]


def test_perplexity_buckets_labels_generic(spark):
    from pimdb_spark.operators.lm import perplexity_buckets

    rows = [(i, "a b c a b", "en") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(df, df, n_buckets=4).collect()
    assert {r.bucket_label for r in out} == {"b1", "b2", "b3", "b4"}


def test_perplexity_buckets_null_majority_stays_tail(spark):
    """Regression (r15 self-review): when unscorable docs OUTNUMBER the
    tail bucket's capacity, plain ntile would rank some of them
    head/middle; the enforced contract pins every NULL-score doc to the
    tail and runs the equal-frequency split over scored docs only."""
    from pyspark.sql import functions as F

    from pimdb_spark.operators.lm import perplexity_buckets

    rows = [
        (0, "a b c a b c a", "en"),  # the only scorable doc
        (1, "x", "en"),
        (2, "y", "en"),
        (3, "z", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r.doc_id: (r.bucket, r.bucket_label)
        for r in perplexity_buckets(df, df.filter(F.col("doc_id") == 0)).collect()
    }
    assert got[0] == (1, "head")
    for i in (1, 2, 3):
        assert got[i] == (3, "tail"), i


def test_pii_nested_identifiers_priority(spark):
    """Pinned overlap semantics (r15 self-review): an IP-shaped domain
    nests an IP match inside the email match.  Counts report BOTH types
    (independent per-pattern signals); redaction applies email FIRST so
    the widest identifier wins and nothing leaks half-masked."""
    from pimdb_spark.operators.text import pii_counts, pii_redact

    rows = [(0, "ping a@1.2.3.4.co now"), (1, "x +1-555-1234@y.co end")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = pii_counts("text")
    got = {
        r.doc_id: (r.e, r.i, r.p, r.clean)
        for r in df.select(
            "doc_id",
            c["n_email"].alias("e"),
            c["n_ip"].alias("i"),
            c["n_phone"].alias("p"),
            pii_redact("text").alias("clean"),
        ).collect()
    }
    assert got[0] == (1, 1, 0, "ping <EMAIL> now")
    assert got[1] == (1, 0, 1, "x <EMAIL> end")


def test_tokenizer_fertility_hand_case(spark):
    """Fertility/bytes-per-token against hand counts: 'ab1 cd' has 2
    whitespace words, 3 bpe-ish tokens (ab|1, cd), 6 bytes; empty-word
    runs are excluded from the word count; an all-empty slice yields
    NULL ratios instead of a division error."""
    from pimdb_spark import entrypoints  # noqa: F401 — loads the catalog
    # promoted to the driver registry in builder r20 — fetch from the
    # registry, not _EXTRA_BENCH (where it lived while bench-only)
    from pimdb_spark.catalog import _REGISTRY

    rows = [
        (0, "ab1 cd", "xx", "s1"),
        (1, "a  b", "xx", "s1"),     # double space: 2 nonempty words
        (2, "", "yy", "s2"),          # empty doc: 0 words, 0 tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            (r.lang, r.source): r
            for r in _REGISTRY["q_tokenizer_fertility"].fn(spark, d).collect()
        }
    r1 = out[("xx", "s1")]
    assert (r1.n_docs, r1.total_words, r1.total_bpe_tokens) == (2, 4, 5)
    assert r1.total_bytes == 6 + 4
    assert abs(r1.fertility - 5 / 4) < 1e-15
    assert abs(r1.bytes_per_token - 10 / 5) < 1e-15
    r2 = out[("yy", "s2")]
    assert (r2.total_words, r2.total_bpe_tokens) == (0, 0)
    assert r2.fertility is None and r2.bytes_per_token is None

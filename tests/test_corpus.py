"""Corpus operators (operators/corpus.py): semantics on tiny frames plus
the plan shapes that matter at 100 TB — broadcast anti-join for
decontamination, partial aggregation under doc-frequency, top-k without a
global sort."""

from __future__ import annotations

from pyspark.sql import Row

from pimdb_spark.operators import corpus as C
from tests.test_plans import SF, count_op, plan_of, tree_nodes


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a", source="s2"),
            Row(doc_id=2, text="a b a", source="s1"),  # dup of 1, better source
            Row(doc_id=3, text="b c", source="s1"),
            Row(doc_id=4, text="x", source="s3"),
        ]
    )


def test_doc_frequency_counts_docs_not_occurrences(spark):
    got = {r["token"]: r["df"] for r in C.doc_frequency(_docs(spark)).collect()}
    assert got == {"a": 2, "b": 3, "c": 1, "x": 1}  # 'a' twice in doc1 counts once


def test_ngrams_and_short_docs(spark):
    df = _docs(spark).select("doc_id", C.ngrams("text", 2).alias("g"))
    got = {r["doc_id"]: r["g"] for r in df.collect()}
    assert got[1] == ["a b", "b a"]
    assert got[3] == ["b c"]
    assert got[4] == []  # fewer tokens than n -> empty, not null/error


def test_decontaminate_drops_exact_text_matches(spark):
    docs = _docs(spark)
    eval_docs = docs.filter("doc_id = 1")  # text 'a b a'
    kept = sorted(r["doc_id"] for r in C.decontaminate(docs, eval_docs).collect())
    assert kept == [3, 4]  # doc 2 shares doc 1's text and is dropped too


def test_priority_dedup_keeps_best_source(spark):
    kept = {
        r["doc_id"]: r["source"]
        for r in C.priority_dedup(_docs(spark), ["source", "doc_id"]).collect()
    }
    assert kept == {2: "s1", 3: "s1", 4: "s3"}  # doc 1 loses to doc 2 (s2 > s1)


def test_repetition_ratio_bounds(spark):
    df = _docs(spark).select("doc_id", C.repetition_ratio("text").alias("r"))
    got = {r["doc_id"]: r["r"] for r in df.collect()}
    assert got[1] == 1.0 - 2.0 / 3.0
    assert got[4] == 0.0


def test_redact(spark):
    df = spark.createDataFrame([Row(t="call 555 or mail a1@b.com now")])
    assert df.select(C.redact("t").alias("r")).first()["r"] == (
        "call <NUM> or mail <EMAIL> now"
    )


def test_decontaminate_broadcasts_eval_side(spark):
    from pimdb_spark.catalog import load

    docs = load(spark, SF, "documents")
    eval_docs = docs.filter("doc_id % 13 = 0")
    plan = plan_of(C.decontaminate(docs, eval_docs))
    nodes = tree_nodes(plan)
    assert any("BroadcastHashJoin" in n for n in nodes)
    assert not any("SortMergeJoin" in n for n in nodes)


def test_doc_frequency_partial_aggregates(spark):
    from pimdb_spark.catalog import load

    plan = plan_of(C.doc_frequency(load(spark, SF, "documents")))
    # map-side combine before the single shuffle: HashAggregate twice
    assert count_op(plan, "HashAggregate") >= 2
    assert count_op(plan, "Exchange") == 1


def test_top_ngrams_plans_take_ordered(spark):
    from pimdb_spark.catalog import load

    plan = plan_of(C.top_ngrams(load(spark, SF, "documents"), n=2, k=20))
    assert "TakeOrderedAndProject" in plan


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest")], ["doc_id", "text"]
    )
    from pimdb_spark.operators.corpus import bpe_pair_counts

    got = {(r.lhs, r.rhs): r.cnt for r in bpe_pair_counts(docs).collect()}
    # "low" x3, "lower" x1 -> (l,o) and (o,w) appear 4x; "w </w>" only in low x3
    assert got[("l", "o")] == 4
    assert got[("o", "w")] == 4
    assert got[("w", "</w>")] == 3
    assert got[("t", "</w>")] == 1  # newest


def test_bpe_train_steps_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest")], ["doc_id", "text"]
    )
    from pimdb_spark.operators.corpus import bpe_train_steps

    steps = sorted(bpe_train_steps(docs, 3).collect(), key=lambda r: r.merge_rank)
    # round 1: (l,o) and (o,w) tie at 4; lexicographic tie-break picks (l,o)
    assert (steps[0].lhs, steps[0].rhs, steps[0].cnt) == ("l", "o", 4)
    # round 2: merged symbol "lo" now pairs with w 4x
    assert (steps[1].lhs, steps[1].rhs, steps[1].cnt) == ("lo", "w", 4)
    # round 3: "low </w>" 3x beats the rest
    assert (steps[2].lhs, steps[2].rhs, steps[2].cnt) == ("low", "</w>", 3)


def test_bpe_merge_handles_back_to_back_occurrences(spark):
    # word "abab": symbols a b a b </w>; merging (a,b) must produce
    # ab ab </w> — the second occurrence shares the boundary space the
    # first replace consumed (the double-replace rule)
    docs = spark.createDataFrame([(1, "abab abab")], ["doc_id", "text"])
    from pimdb_spark.operators.corpus import bpe_train_steps

    steps = sorted(bpe_train_steps(docs, 2).collect(), key=lambda r: r.merge_rank)
    assert (steps[0].lhs, steps[0].rhs, steps[0].cnt) == ("a", "b", 4)
    # after the merge the word is "ab ab </w>": pairs (ab,ab) and (ab,</w>)
    # tie at 2, and '<' sorts before 'a' so (ab,</w>) wins the tie-break.
    # Count 2 itself proves BOTH back-to-back occurrences merged: a failed
    # second merge would leave "ab a b </w>" with no (ab,</w>) pair at all.
    assert (steps[1].lhs, steps[1].rhs, steps[1].cnt) == ("ab", "</w>", 2)


def test_bpe_apply_counts_post_merge_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest")], ["doc_id", "text"]
    )
    from pimdb_spark.operators.corpus import bpe_apply, bpe_train_steps

    merges = bpe_train_steps(docs, 3)  # (l,o) -> (lo,w) -> (low,</w>)
    got = {r.doc_id: r.n_tokens for r in bpe_apply(docs, merges, 3).collect()}
    # doc 1: "low"x2 -> ["low</w>"] = 1 token each; "lower" ->
    # [low, e, r, </w>] = 4  => 1+1+4 = 6
    # doc 2: "low" -> 1; "newest" -> n e w e s t </w> = 7 => 8
    assert got == {1: 6, 2: 8}

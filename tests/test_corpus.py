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


def test_bpe_apply_short_merge_list_raises(spark):
    """A merge list that doesn't cover every rank in [1, n_merges] must
    fail LOUDLY (ValueError) instead of silently under-applying or — the
    pre-r10 failure mode — emptying the whole output via a crossJoin with
    a zero-row rank filter."""
    import pytest

    docs = spark.createDataFrame([(1, "low low lower")], ["doc_id", "text"])
    from pimdb_spark.operators.corpus import bpe_apply, bpe_train_steps

    merges = bpe_train_steps(docs, 2)
    with pytest.raises(ValueError, match="covers 2 of the 5"):
        bpe_apply(docs, merges, 5)


def test_bpe_apply_plan_depth_constant_in_merge_count(spark):
    """bpe_apply attaches the WHOLE merge list as one broadcast array and
    applies it with a single fold: the physical plan must contain exactly
    ONE join regardless of n_merges (the pre-r10 shape chained one
    broadcast join per merge — infeasible at production ~30k merges)."""
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest")], ["doc_id", "text"]
    )
    from pimdb_spark.operators.corpus import bpe_apply, bpe_train_steps

    merges = bpe_train_steps(docs, 3).localCheckpoint()
    plan = plan_of(bpe_apply(docs, merges, 3))
    joins = sum(
        1
        for n in tree_nodes(plan)
        if "Join" in n or "CartesianProduct" in n
    )
    assert joins == 1, plan


def test_bpe_encode_lengths_matches_bpe_apply(spark):
    """The Arrow-batched rank-dict encoder (production twin) returns the
    same per-doc token counts as the replace-chain bpe_apply on a normal
    corpus (no same-symbol runs — the documented divergence case), and
    raises on a short merge list."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest"), (3, "widest new low")],
        ["doc_id", "text"],
    )
    from pimdb_spark.operators.corpus import (
        bpe_apply,
        bpe_encode_lengths,
        bpe_train_steps,
    )

    merges = bpe_train_steps(docs, 4).localCheckpoint()
    want = {r.doc_id: r.n_tokens for r in bpe_apply(docs, merges, 4).collect()}
    got = {r.doc_id: r.n_tokens for r in bpe_encode_lengths(docs, merges, 4).collect()}
    assert got == want
    with pytest.raises(ValueError, match="covers 4 of the 9"):
        bpe_encode_lengths(docs, merges, 9)


def test_bpe_train_batched_accepts_non_conflicting_top_pairs(spark):
    # corpus engineered so round 1's pool has a conflict: pairs (l,o) 4x,
    # (o,w) 4x, (w,</w>) 3x ... — (o,w) conflicts with (l,o) (shares o),
    # (w,</w>) conflicts with (o,w) via w even though (o,w) was dropped
    # (the conflict test is pool-position-based, not acceptance-based)
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest")], ["doc_id", "text"]
    )
    from pimdb_spark.operators.corpus import bpe_train_batched

    out = sorted(
        bpe_train_batched(docs, n_rounds=1, batch_size=4).collect(),
        key=lambda r: r.merge_rank,
    )
    # pool order: (e,r)? counts: l-o 4, o-w 4, w-</w> 3, e-w 2 (lower,newest?)
    # accepted must start with (l,o); (o,w) dropped (shares o with pool[0])
    assert (out[0].lhs, out[0].rhs, out[0].cnt) == ("l", "o", 4)
    assert out[0].merge_rank == 1 and out[0].batch_no == 1
    accepted = {(r.lhs, r.rhs) for r in out}
    assert ("o", "w") not in accepted
    # every accepted pair is disjoint in symbols+outputs from every other
    seen: set = set()
    for r in out:
        syms = {r.lhs, r.rhs, r.lhs + r.rhs}
        assert not (syms & seen), (r, seen)
        seen |= syms


def test_bpe_train_batched_feeds_bpe_apply(spark):
    """Batched trainer output plugs straight into bpe_apply (dense
    merge_rank), and with batch_size=1 the batched trainer degenerates to
    EXACTLY bpe_train_steps."""
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low newest")], ["doc_id", "text"]
    )
    from pimdb_spark.operators.corpus import (
        bpe_apply,
        bpe_train_batched,
        bpe_train_steps,
    )

    batched = sorted(
        bpe_train_batched(docs, n_rounds=3, batch_size=1).collect(),
        key=lambda r: r.merge_rank,
    )
    classic = sorted(bpe_train_steps(docs, 3).collect(), key=lambda r: r.merge_rank)
    assert [(r.merge_rank, r.lhs, r.rhs, r.cnt) for r in batched] == [
        (r.merge_rank, r.lhs, r.rhs, r.cnt) for r in classic
    ]

    merges = bpe_train_batched(docs, n_rounds=2, batch_size=4).localCheckpoint()
    n = merges.count()
    assert n >= 2
    got = {r.doc_id: r.n_tokens for r in bpe_apply(docs, merges, n).collect()}
    assert set(got) == {1, 2} and all(v > 0 for v in got.values())


def test_dup_span_excise_matches_python_model(spark):
    """dup_span_excise vs a direct python model on a corpus with known
    boilerplate: a shared 6-token header (covered in every doc), a
    WITHIN-doc repeated 5-token phrase (corpus-global counts include
    self-repetition — the Lee et al. semantics), and unique tails that
    must survive excision in order."""
    from pyspark.sql import Row

    from pimdb_spark.operators.dedup import dup_span_excise

    header = "alpha beta gamma delta epsilon zeta"
    docs = [
        (0, header + " one two three four five six"),
        (1, header + " seven eight nine ten eleven"),
        (2, "p q r s t p q r s t unique tail words here"),
        (3, "totally unique content with no repeats at all"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.clean_text)
        for r in dup_span_excise(df, n=5, min_count=2).collect()
    }

    # python model: same 5-gram corpus-global counting + coverage union
    n = 5
    toks = {i: t.split(" ") for i, t in docs}
    from collections import Counter

    counts = Counter()
    for i, ts in toks.items():
        for s in range(len(ts) - n + 1):
            counts[" ".join(ts[s : s + n])] += 1
    for i, ts in toks.items():
        covered = set()
        for s in range(len(ts) - n + 1):
            if counts[" ".join(ts[s : s + n])] >= 2:
                covered.update(range(s, s + n))
        clean = " ".join(t for p, t in enumerate(ts) if p not in covered)
        assert got[i] == (len(ts), len(covered), clean), i

    # the shared header is excised from both docs; unique tails survive
    assert got[0][2].startswith("one") or "one" in got[0][2]
    assert got[3] == (8, 0, docs[3][1])   # untouched doc
    assert got[4] == (2, 0, "tiny doc")   # shorter than n -> no grams


def test_gopher_repetition_matches_python_model(spark):
    """gopher_repetition vs a direct python model on a corpus that
    exercises every signal: machine-gun token repetition (top-2-gram
    char frac past 1.0 via overlap counting), a repeated 5-token phrase
    (coverage union, no double count on overlap), a tie on the top
    bigram (lexicographic break), and a doc shorter than the largest n
    (NULL gram / zero-count contract)."""
    from collections import Counter

    from pyspark.sql import Row

    from pimdb_spark.operators.dedup import gopher_repetition

    docs = [
        (0, "spam spam spam spam spam spam eggs"),
        (1, "p q r s t x p q r s t y unique tail words"),
        (2, "b a b a c d c d"),          # ties: "a b"/"b a"/"c d" all x2?
        (3, "one two three"),            # shorter than n=4, 5, 8
        (4, "totally unique content with no repeats at all present"),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r.doc_id: r.asDict() for r in gopher_repetition(df).collect()}

    for i, t in docs:
        ts = t.split(" ")
        me = got[i]
        assert me["n_tokens"] == len(ts) and me["n_chars"] == len(t)
        for n in (2, 3, 4):
            c = Counter(
                " ".join(ts[s : s + n]) for s in range(len(ts) - n + 1)
            )
            if not c:
                assert me[f"top{n}_gram"] is None
                assert me[f"top{n}_count"] == 0
                assert me[f"top{n}_char_frac"] == 0.0
                continue
            gram, cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            assert me[f"top{n}_gram"] == gram, (i, n)
            assert me[f"top{n}_count"] == cnt
            assert me[f"top{n}_char_frac"] == cnt * len(gram) / len(t)
        for n in (5, 8):
            c = Counter(
                " ".join(ts[s : s + n]) for s in range(len(ts) - n + 1)
            )
            cov: set[int] = set()
            for s in range(len(ts) - n + 1):
                if c[" ".join(ts[s : s + n])] >= 2:
                    cov.update(range(s, s + n))
            assert me[f"dup{n}_cov_tokens"] == len(cov), (i, n)
            assert me[f"dup{n}_token_frac"] == (
                len(cov) / len(ts) if ts else 0.0
            )

    # spot checks the model already verified, stated explicitly:
    # overlap counting pushes the spam doc's top-2-gram frac past 1.0
    assert got[0]["top2_gram"] == "spam spam" and got[0]["top2_count"] == 5
    assert got[0]["top2_char_frac"] > 1.0
    # repeated 5-token phrase covers both occurrences, union not sum
    assert got[1]["dup5_cov_tokens"] == 10
    # clean doc: zero coverage everywhere
    assert got[4]["dup5_cov_tokens"] == 0 and got[4]["dup5_token_frac"] == 0.0


def test_boilerplate_strip_group_scoped_frequency(spark):
    """A segment repeated across >= min_df docs of the SAME source is
    stripped from every doc; the identical segment in a DIFFERENT source
    (below that source's df threshold) survives — and unlike
    paragraph_dedup, no occurrence of a template is kept."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            # source s1: 'foot er' is a 2-doc template; content differs
            Row(doc_id=1, text="alpha beta foot er", source="s1"),
            Row(doc_id=2, text="gamma delta foot er", source="s1"),
            # source s2: same 'foot er' segment but only ONE doc has it
            Row(doc_id=3, text="other text foot er", source="s2"),
            # all-template doc collapses to empty, row preserved
            Row(doc_id=4, text="foot er", source="s1"),
        ]
    )
    got = {
        r.doc_id: (r.text, r.n_segments, r.n_boiler)
        for r in C.boilerplate_strip(docs, block=2, min_df=2).collect()
    }
    assert got[1] == ("alpha beta", 2, 1)
    assert got[2] == ("gamma delta", 2, 1)
    assert got[3] == ("other text foot er", 2, 0)  # other group: kept
    assert got[4] == ("", 1, 1)  # empty string, not a missing row


def test_boilerplate_strip_order_preserved(spark):
    """Survivor segments re-assemble in original position order even when
    a template sits between them."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two tpl tpl three four", source="s"),
            Row(doc_id=2, text="five six tpl tpl seven eight", source="s"),
        ]
    )
    got = {
        r.doc_id: r.text
        for r in C.boilerplate_strip(docs, block=2, min_df=2).collect()
    }
    assert got[1] == "one two three four"
    assert got[2] == "five six seven eight"


def test_eval_span_excise_strips_exactly_the_leaked_span(spark):
    """Cross-corpus span excision: a train doc quoting an eval 5-span
    loses exactly those positions (clean text = its own words, order
    kept); overlapping leaked spans union their coverage; an untouched
    doc passes through with eval_frac 0; eval-side-internal duplication
    does not excise anything by itself."""
    from pyspark.sql import Row

    from pimdb_spark.operators.dedup import eval_span_excise

    ev = spark.createDataFrame(
        [
            Row(doc_id=100, text="the exam question is this one here"),
            Row(doc_id=101, text="the exam question is this one here"),
        ]
    )
    train = spark.createDataFrame(
        [
            # quotes eval tokens 1-6 -> two overlapping 5-spans, union = 6 positions
            Row(doc_id=1, text="intro words the exam question is this one outro"),
            Row(doc_id=2, text="completely original content with no leak at all"),
            # shorter than n -> zero spans, passes through
            Row(doc_id=3, text="tiny doc"),
        ]
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_eval_tokens, r.clean_text)
        for r in eval_span_excise(train, ev, n=5).collect()
    }
    assert got[1] == (9, 6, "intro words outro")
    assert got[2] == (8, 0, "completely original content with no leak at all")
    assert got[3] == (2, 0, "tiny doc")


def test_eval_leak_report_semantics(spark):
    """Hand corpus: one eval doc fully quoted in training (leak_frac 1,
    worst df = carrier count), one partially, one clean, one too short."""
    from pimdb_spark.operators.dedup import eval_leak_report

    ev = spark.createDataFrame(
        [
            (0, "a b c d e f"),        # spans: abcde, bcdef
            (1, "p q r s t u v"),      # spans: pqrst, qrstu, rstuv
            (2, "x y z w k l"),        # clean
            (3, "tiny doc"),           # < 5 tokens: no spans
        ],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (100, "zz a b c d e f zz"),    # carries BOTH doc-0 spans
            (101, "a b c d e yy"),         # carries abcde again (df=2)
            (102, "mm p q r s t mm"),      # carries pqrst only
            (103, "nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in eval_leak_report(train, ev, n=5).collect()}
    assert got[0].n_spans == 2 and got[0].n_leaked == 2
    assert got[0].leak_frac == 1.0 and got[0].worst_span_df == 2
    assert got[1].n_spans == 3 and got[1].n_leaked == 1
    assert abs(got[1].leak_frac - 1 / 3) < 1e-12 and got[1].worst_span_df == 1
    assert got[2].n_leaked == 0 and got[2].worst_span_df is None
    assert got[3].n_spans == 0 and got[3].leak_frac is None

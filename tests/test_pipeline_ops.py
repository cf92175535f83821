"""Pipeline-hygiene operators (catalog_pipeline.py families): paragraph
dedup, n-gram decontamination, chunking, budget mixture, heavy hitters,
histograms, robust outliers, inverted index — semantics on tiny frames
where every expected value is hand-checkable."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pimdb_spark.operators import corpus as C
from pimdb_spark.operators import curation as CU
from pimdb_spark.operators import profile as P
from pimdb_spark.operators import retrieval as R


def test_paragraph_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),  # segments (block=2): "a b", "c d"
            Row(doc_id=2, text="c d x y"),  # "c d" already seen in doc 1
            Row(doc_id=3, text="a b"),      # fully duplicate -> empty text
        ]
    )
    got = {
        r["doc_id"]: r for r in C.paragraph_dedup(docs, block=2).collect()
    }
    assert got[1]["text"] == "a b c d" and got[1]["n_kept"] == 2
    assert got[2]["text"] == "x y" and got[2]["n_segments"] == 2
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0  # row survives


def test_paragraph_dedup_preserves_segment_order(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="z z a a z z b b")]  # blocks: "z z","a a","z z","b b"
    )
    row = C.paragraph_dedup(docs, block=2).collect()[0]
    # second "z z" is a within-doc dup; survivors keep document order
    assert row["text"] == "z z a a b b"
    assert row["n_segments"] == 4 and row["n_kept"] == 3


def test_ngram_decontaminate_threshold(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),          # eval doc
            Row(doc_id=2, text="x a b c d e y"),      # contains both eval 4-grams
            Row(doc_id=3, text="a b c x y z"),        # no full 4-gram overlap
        ]
    )
    got = {
        r["doc_id"]: r
        for r in C.ngram_decontaminate(
            docs, docs.filter("doc_id = 1"), n=4, threshold=2
        ).collect()
    }
    # doc 2 shares "a b c d" and "b c d e" -> 2 >= threshold -> drop
    assert got[2]["n_shared_ngrams"] == 2 and not got[2]["keep"]
    assert got[3]["n_shared_ngrams"] == 0 and got[3]["keep"]
    assert not got[1]["keep"]  # the eval doc itself is flagged


def test_chunk_documents_overlap_and_short_docs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abcdefghij"), Row(doc_id=2, text="xy")]
    )
    rows = CU.chunk_documents(
        docs, chunk_chars=4, overlap_chars=1
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    # stride 3: starts 1,4,7 (stop at len-overlap=9) -> abcd, defg, ghij
    chunks1 = sorted(by_doc[1])
    assert chunks1 == [(0, "abcd"), (1, "defg"), (2, "ghij")]
    # consecutive chunks share exactly overlap_chars characters
    assert chunks1[0][1][-1] == chunks1[1][1][0]
    assert sorted(by_doc[2]) == [(0, "xy")]  # shorter than one chunk


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="abc")])
    try:
        CU.chunk_documents(docs, chunk_chars=4, overlap_chars=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_budget_take_respects_per_group_budget(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, src="g1" if i < 10 else "g2", toks=10) for i in range(20)]
    )
    kept = CU.budget_take(
        docs, "src", "doc_id", "toks", budgets={"g1": 35}, default_budget=15
    ).collect()
    by_group = {}
    for r in kept:
        by_group.setdefault(r["src"], []).append(r)
    # budget 35 / 10-token docs: rows starting at cum 0,10,20,30 -> 4 kept
    assert len(by_group["g1"]) == 4
    assert max(r["cum_tokens"] for r in by_group["g1"]) == 40
    assert len(by_group["g2"]) == 2  # default budget 15 -> starts 0,10
    # deterministic: a rerun picks the identical prefix
    again = CU.budget_take(
        docs, "src", "doc_id", "toks", budgets={"g1": 35}, default_budget=15
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in again)


def test_heavy_hitters_counts_and_share(spark):
    df = spark.createDataFrame(
        [Row(k="a")] * 6 + [Row(k="b")] * 3 + [Row(k="c")] * 1
    )
    rows = P.heavy_hitters(df, "k", k=2).collect()
    assert [(r["key"], r["cnt"], r["rank"]) for r in rows] == [
        ("a", 6, 1),
        ("b", 3, 2),
    ]
    assert abs(rows[0]["share"] - 0.6) < 1e-12


def test_numeric_histogram_clamps_and_fills(spark):
    df = spark.createDataFrame(
        [Row(v=-5.0), Row(v=0.0), Row(v=9.9), Row(v=10.0), Row(v=99.0), Row(v=1000.0)]
    )
    rows = {r["bin"]: r for r in P.numeric_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert len(rows) == 10  # empty bins emitted
    assert rows[0]["cnt"] == 3  # -5 clamped in, 0.0, 9.9
    assert rows[1]["cnt"] == 1  # 10.0
    assert rows[9]["cnt"] == 2  # 99.0 and the clamped 1000.0
    assert rows[3]["cnt"] == 0
    assert rows[2]["bin_lo"] == 20.0 and rows[2]["bin_hi"] == 30.0
    assert sum(r["cnt"] for r in rows.values()) == 6  # every row counted


def test_robust_outliers_median_mad(spark):
    # group g: values 1..5 plus an outlier 100 -> n=6, lower median = 3
    # deviations |x-3|: 0,1,1,2,2,97 -> lower median (3rd) = 1 -> fence 3.0
    df = spark.createDataFrame(
        [Row(g="g", v=float(x)) for x in [1, 2, 3, 4, 5, 100]]
    )
    r = P.robust_outliers(df, "g", "v", n_mads=3.0).collect()[0]
    assert r["n"] == 6 and r["median"] == 3.0 and r["mad"] == 1.0
    # outliers: |x-3| > 3 -> 100 only
    assert r["n_outliers"] == 1


def test_robust_outliers_even_group_uses_lower_median(spark):
    df = spark.createDataFrame([Row(g="g", v=float(x)) for x in [1, 2, 3, 4]])
    r = P.robust_outliers(df, "g", "v").collect()[0]
    assert r["median"] == 2.0  # lower median, an actual data value


def test_inverted_index_postings_ordered(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=2, text="b a b"),
            Row(doc_id=1, text="a b"),
            Row(doc_id=3, text="b"),
        ]
    )
    rows = {r["token"]: r for r in R.inverted_index(docs).collect()}
    assert rows["a"]["df"] == 2 and rows["a"]["cf"] == 2
    assert rows["a"]["postings"] == "1:1,2:1"  # id-ordered
    assert rows["b"]["df"] == 3 and rows["b"]["cf"] == 4
    assert rows["b"]["postings"] == "1:1,2:2,3:1"


def test_inverted_index_max_df_drops_head_tokens(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the a"),
            Row(doc_id=2, text="the b"),
            Row(doc_id=3, text="the the a"),
        ]
    )
    rows = {r["token"]: r for r in R.inverted_index(docs, max_df=2).collect()}
    # "the" has df=3 > cap: dropped entirely, no postings built for it
    assert set(rows) == {"a", "b"}
    assert rows["a"]["postings"] == "1:1,3:1"
    # cap equal to df keeps the token
    with_cap3 = {r["token"] for r in R.inverted_index(docs, max_df=3).collect()}
    assert with_cap3 == {"a", "b", "the"}


def test_paragraph_dedup_plan_no_text_in_first_shuffle(spark):
    """The keep-first window partitions on md5(seg) — segments move, whole
    documents never do; and there is no cartesian/BNLJ anywhere."""
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d")])
    plan = C.paragraph_dedup(docs, block=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validate_constraints_counts_violations(spark):
    from pyspark.sql import functions as F

    from pimdb_spark.operators.profile import validate_constraints

    rows = [(1, 5.0, "a"), (2, -1.0, "a"), (3, None, "b"), (4, -2.0, "zz")]
    df = spark.createDataFrame(rows, ["id", "v", "t"])
    out = {
        r.rule_id: (r.n_violations, r.passed)
        for r in validate_constraints(
            df,
            [
                ("v_not_null", F.col("v").isNull(), "v present"),
                ("v_nonneg", F.col("v") < 0, "v >= 0"),
                ("t_known", ~F.col("t").isin(["a", "b"]), "t in set"),
                ("id_pos", F.col("id") <= 0, "id > 0"),
            ],
        ).collect()
    }
    assert out == {
        "v_not_null": (1, False),
        "v_nonneg": (2, False),
        "t_known": (1, False),
        "id_pos": (0, True),
    }


def test_mixture_plan_binding_source(spark):
    """The scarcest source relative to its weight caps the mix; its own
    allocation equals its inventory (utilization 1.0) and every
    allocation honors the exact weight ratios."""
    from pimdb_spark.operators.curation import mixture_plan

    rows = (
        [("a", 1000)] * 1   # plentiful
        + [("b", 90)] * 1   # scarce: 90 tokens at weight 3 -> ratio 30
        + [("c", 500)] * 1
    )
    df = spark.createDataFrame(rows, ["src", "tokens"])
    out = {r.source: r for r in mixture_plan(df, "src", "tokens",
                                             {"a": 5, "b": 3, "c": 2}).collect()}
    # binding source is b (90/3=30 < 1000/5=200, 500/2=250)
    assert out["b"].allocation == 90 and out["b"].utilization == 1.0
    assert out["a"].allocation == 150   # 90*5 DIV 3
    assert out["c"].allocation == 60    # 90*2 DIV 3
    for r in out.values():
        assert r.allocation <= r.available


def test_sparse_doc_similarity_semantics(spark):
    """Identical docs reach cos 1.0; docs sharing no under-cap gram are
    never candidates; a stop-gram above max_df is excluded from scoring."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="alpha beta gamma"),   # exact twin of 1
            Row(doc_id=3, text="delta epsilon zeta"),  # disjoint from 1/2
            Row(doc_id=4, text="alpha beta other"),    # shares "alpha beta"
        ]
    )
    from pimdb_spark.operators.retrieval import sparse_doc_similarity

    out = {(r.doc_a, r.doc_b): r.cos
           for r in sparse_doc_similarity(docs, max_df=10, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out  # no shared gram: no pair
    assert 0.0 < out[(1, 4)] < 1.0
    # cap = 2: "alpha beta" (df 3) now dropped -> 1-4 lose their only
    # shared gram; 1-2 still pair on "beta gamma" (df 2)
    capped = {(r.doc_a, r.doc_b)
              for r in sparse_doc_similarity(docs, max_df=2, threshold=0.0).collect()}
    assert (1, 2) in capped and (1, 4) not in capped


def test_group_auc_exact_values(spark):
    """Perfect separation -> 1.0; reversed -> 0.0; a tie between one pos
    and one neg -> the half-win convention; one-class groups -> NULL."""
    rows = [
        # g=perfect: pos scores all above neg
        ("perfect", True, 0.9), ("perfect", True, 0.8),
        ("perfect", False, 0.2), ("perfect", False, 0.1),
        # g=reversed
        ("rev", True, 0.1), ("rev", False, 0.9),
        # g=tied: one pos and one neg share the score -> AUC 0.5
        ("tied", True, 0.5), ("tied", False, 0.5),
        # g=onecls: no negatives
        ("onecls", True, 0.7), ("onecls", True, 0.3),
    ]
    df = spark.createDataFrame(rows, "g string, pos boolean, s double")
    from pimdb_spark.operators.profile import group_auc

    out = {r.g: (r.n_pos, r.n_neg, r.auc) for r in group_auc(df, "g", "pos", "s").collect()}
    assert out["perfect"] == (2, 2, 1.0)
    assert out["rev"] == (1, 1, 0.0)
    assert out["tied"] == (1, 1, 0.5)
    assert out["onecls"] == (2, 0, None)


def test_calibration_bins_dense_grid_and_rates(spark):
    rows = [(True, 0.05), (False, 0.05), (True, 0.96), (True, 2.0), (False, -1.0)]
    df = spark.createDataFrame(rows, "pos boolean, s double")
    bins = {r.bin: r for r in
            P.calibration_bins(df, "pos", "s", lo=0.0, hi=1.0, n_bins=4).collect()}
    assert len(bins) == 4  # empty bins emitted
    # bin 0: the two 0.05 scores plus the clamped -1.0 -> 3 rows, 1 positive
    assert (bins[0].n, bins[0].n_pos) == (3, 1)
    assert bins[0].pos_rate == 1.0 / 3.0
    # 0.96 and the clamped 2.0 land in the top bin
    assert (bins[3].n, bins[3].n_pos, bins[3].pos_rate) == (2, 2, 1.0)
    assert bins[1].n == 0 and bins[1].pos_rate is None
    assert bins[0].bin_lo == 0.0 and bins[0].bin_hi == 0.25


def test_ngram_weights_relative_cap_and_required_cap(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"shared next u{i} v{i}") for i in range(4)]
    )
    # "shared next" appears in all 4 docs; frac 0.5 -> cap floor(2) drops it
    caps = {r.gram for r in R.ngram_weights(docs, max_df_frac=0.5).collect()}
    assert "shared next" not in caps and any(g.startswith("next ") for g in caps)
    # absolute cap still works and the two compose (tightest wins)
    both = {r.gram for r in R.ngram_weights(docs, max_df=1, max_df_frac=0.9).collect()}
    assert all(g not in ("shared next",) for g in both)
    with _pytest.raises(ValueError, match="cap"):
        R.ngram_weights(docs)


def test_mixture_plan_temperature_upsamples_tail(spark):
    """alpha = 1/2 weights: weight_i = floor(sqrt(T_i)); the tail source's
    sampling probability exceeds its proportional share while the head's
    shrinks; allocations keep mixture_plan's exact integer arithmetic
    off the binding row; sample probabilities sum to 1 exactly when the
    weight sum divides cleanly (checked via the integer weights)."""
    from math import isqrt

    from pimdb_spark.operators.curation import mixture_plan_temperature

    rows = [("head", 10000), ("mid", 2500), ("tail", 100)]
    df = spark.createDataFrame(rows, ["src", "tokens"])
    out = {
        r.source: r
        for r in mixture_plan_temperature(df, "src", "tokens").collect()
    }
    # weights are integer sqrt of the inventory
    for src, t in rows:
        assert out[src].weight == isqrt(t)
    wsum = sum(isqrt(t) for _, t in rows)  # 100 + 50 + 10 = 160
    total = sum(t for _, t in rows)
    for src, t in rows:
        assert out[src].sample_prob == isqrt(t) / wsum
    # temperature flattens: tail gets > proportional share, head gets less
    assert out["tail"].sample_prob > 100 / total
    assert out["head"].sample_prob < 10000 / total
    # binding source: argmin T/w = argmin ~sqrt(T) -> tail (100/10 = 10)
    assert out["tail"].allocation == 100 and out["tail"].utilization == 1.0
    assert out["head"].allocation == (100 * 100) // 10   # b_avail*w DIV b_w
    assert out["mid"].allocation == (100 * 50) // 10
    for r in out.values():
        assert r.allocation <= r.available

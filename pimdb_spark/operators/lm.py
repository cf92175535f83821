"""N-gram language-model quality scoring — the CCNet-style corpus
quality filter (Wenzek et al. 2020 train a KenLM on a reference corpus
and rank documents by per-token perplexity; low-quality and
out-of-domain/out-of-language text scores poorly).

Numeric-parity design: perplexity is exp(-mean log P) and ``log``/``exp``
are not bit-identical across engines (see catalog.py's numeric-parity
policy), so the score is the RATIONAL SURROGATE — the mean add-one-
smoothed conditional bigram probability, with each term computed in
EXACT integer arithmetic:

    term(w1 w2) = floor((c2 + 1) * SCALE / (c1 + V))

where c2 = reference count of the bigram, c1 = reference count of w1 as
a bigram context (sum of c2 over its continuations), V = reference
vocabulary size, SCALE = 10^9.  Scaled terms are BIGINTs, so the per-doc
sum is exact and order-free (no ordered-fold discipline needed), and the
final ``sum / (n * SCALE)`` is a single IEEE double division — correctly
rounded, engine-identical.  The surrogate ranks documents the same way
mean probability does (monotone in each term); it is not comparable to a
log-domain perplexity number and is documented as such.

Range bound: (c2 + 1) * SCALE must fit a signed 64-bit integer, i.e.
c2 < ~9.2e9 occurrences of one bigram in the reference corpus — a
documented precondition, not a runtime check (the session runs non-ANSI,
where overflow would wrap).  A reference corpus is curated and orders of
magnitude smaller than the corpus being scored, so the bound holds by
construction; lower SCALE if a reference corpus ever approaches it.

Reference behavior target: pimdb has no LM scoring; this extends the
quality family (operators/text.text_stats, operators/curation
.quality_funnel) with the published reference-LM signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def bigram_counts(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Reference bigram table: (gram, w1, c2) with c2 the bigram count.
    One explode + one groupBy (map-side combined).  r18 optimization:
    the gram pass is the codegen'd exploded_ngram_rows form (the
    interpreted ngrams() transform dominated every LM entry's model
    build)."""
    from pimdb_spark.operators.corpus import exploded_ngram_rows

    return (
        exploded_ngram_rows(ref_docs, (), text_col, 2, out="gram")
        .groupBy("gram")
        .agg(F.count("*").alias("c2"))
        .withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
    )


def ngram_lm_score(
    docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every document by the mean add-one-smoothed conditional
    bigram probability under a reference-corpus bigram LM (see module
    docstring for the integer-exact formulation).

    Output: (id, *extra_cols, n_bigrams, lm_score DOUBLE) — one row per
    distinct id (ids are expected unique, the table contract of every
    caller); documents with fewer than 2 tokens keep n_bigrams = 0 and
    a NULL score.  ``extra_cols`` ride the scoring pass and must be
    functionally dependent on the id (they join the grouping key, so a
    non-dependent column would split a document — the doc_shingle_sets
    contract); callers like perplexity_buckets use this to carry the
    group column instead of re-joining the corpus for it.

    Scale: the model is two count tables — bigram counts (shuffled once
    on gram) and context counts (derived from them, shuffled on w1) —
    both proportional to the REFERENCE corpus, not the scored one; V is
    a one-row aggregate.  Scoring joins gram -> c2 and w1 -> c1; for a
    curated reference (<< corpus) both model tables broadcast, making
    the scoring pass shuffle-free until the final per-doc groupBy on the
    id column.  Short documents enter that same groupBy as one NULL-term
    stub row each (count/sum ignore the NULL, so values are identical) —
    the corpus-wide join-back the pre-r19 form paid to restore them is
    gone.  Terms sum as exact BIGINTs, so partial aggregation combines
    freely with no float-order concern."""
    from pimdb_spark.operators.corpus import exploded_ngram_rows

    bi = bigram_counts(ref_docs, text_col)
    ctx = bi.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        ref_docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    doc_grams = exploded_ngram_rows(
        docs, (id_col, *extra_cols), text_col, 2, out="gram"
    ).withColumn("w1", F.split(F.col("gram"), " ").getItem(0))

    scored = (
        doc_grams.join(F.broadcast(bi.select("gram", "c2")), "gram", "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            *extra_cols,
            F.expr(
                f"(coalesce(c2, 0L) + 1L) * {SCALE}L div (coalesce(c1, 0L) + v)"
            ).alias("term_scaled"),
        )
    )
    stubs = docs.select(
        id_col, *extra_cols, F.lit(None).cast("bigint").alias("term_scaled")
    )
    per_doc = scored.unionByName(stubs).groupBy(id_col, *extra_cols).agg(
        F.count("term_scaled").alias("n_bigrams"),
        F.sum("term_scaled").alias("_sum_scaled"),
    )
    return per_doc.select(
        id_col,
        *extra_cols,
        F.col("n_bigrams"),
        (
            F.col("_sum_scaled").cast("double")
            / (F.col("n_bigrams") * F.lit(SCALE)).cast("double")
        ).alias("lm_score"),
    )


def ngram_lm_score_interpolated(
    docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambda_num: int = 3,
    lambda_den: int = 4,
) -> DataFrame:
    """Jelinek-Mercer interpolated bigram/unigram scoring — the standard
    fix for pure add-one smoothing (which over-penalizes unseen bigrams
    of common words):

        P(w2|w1) = λ * (c2+1)/(c1+V)  +  (1-λ) * (c1(w2)+1)/(T+V)

    with λ = ``lambda_num/lambda_den`` (default 3/4 — keep it a small
    exact rational).  Both terms stay integer-exact:

        t = (λn*(c2+1)*SCALE) div (λd*(c1+V))
          + ((λd-λn)*(cu+1)*SCALE) div (λd*(T+V))

    where cu = unigram count of w2 and T = reference token count; each
    floor division is exact BIGINT arithmetic, so the per-doc sum stays
    order-free and engine-identical exactly like ngram_lm_score (the two
    floors differ from the real-valued interpolation by < 2/SCALE per
    term — a documented quantization, not float noise).

    Range bound: lambda_num * (c2+1) * SCALE must fit int64 — c2 below
    ~3e9 at the defaults; same curated-reference argument as the base
    scorer.

    Scale: identical plan shape to ngram_lm_score plus one more
    broadcast (unigram counts) and a second one-row attach (T)."""
    from pimdb_spark.operators.corpus import exploded_ngram_rows

    lam_rest = lambda_den - lambda_num
    bi = bigram_counts(ref_docs, text_col)
    ctx = bi.groupBy("w1").agg(F.sum("c2").alias("c1"))
    uni = (
        ref_docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w2"))
        .groupBy("w2")
        .agg(F.count("*").alias("cu"))
    )
    totals = (
        ref_docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .agg(
            F.count("*").alias("t"),
            F.count_distinct("w").alias("v"),
        )
    )

    doc_grams = (
        exploded_ngram_rows(docs, (id_col,), text_col, 2, out="gram")
        .withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("gram"), " ").getItem(1))
    )
    scored = (
        doc_grams.join(F.broadcast(bi.select("gram", "c2")), "gram", "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(uni), "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.expr(
                f"({lambda_num}L * (coalesce(c2, 0L) + 1L) * {SCALE}L)"
                f" div ({lambda_den}L * (coalesce(c1, 0L) + v))"
                f" + ({lam_rest}L * (coalesce(cu, 0L) + 1L) * {SCALE}L)"
                f" div ({lambda_den}L * (t + v))"
            ).alias("term_scaled"),
        )
    )
    # short docs enter the per-doc groupBy as NULL-term stubs — no
    # corpus-wide join-back (see ngram_lm_score)
    stubs = docs.select(
        id_col, F.lit(None).cast("bigint").alias("term_scaled")
    )
    per_doc = scored.unionByName(stubs).groupBy(id_col).agg(
        F.count("term_scaled").alias("n_bigrams"),
        F.sum("term_scaled").alias("_sum_scaled"),
    )
    return per_doc.select(
        id_col,
        F.col("n_bigrams"),
        (
            F.col("_sum_scaled").cast("double")
            / (F.col("n_bigrams") * F.lit(SCALE)).cast("double")
        ).alias("lm_score"),
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-bigram bag is under a
    TARGET-domain model than under the RAW-corpus model — the published
    recipe for selecting pretraining data that matches a target
    distribution.  DSIR's weight is log p_target(x) − log p_raw(x) over
    hashed n-gram features; this implementation keeps the repo's
    numeric-parity discipline by replacing each per-feature log-prob
    with the integer rational surrogate used by ngram_lm_score:

        L_model(f) = floor((c_model(f) + 1) * SCALE / (N_model + B))

    (add-one smoothing over B hash buckets), so a doc's weight
    Σ_f cnt(f) * (L_target(f) − L_raw(f)) is an exact BIGINT — order-
    free, partition-free, bit-identical across engines.  The surrogate
    is monotone per feature in the model probability, so it ranks docs
    the way the probability-ratio does (documented deviation: linear-
    not log-domain, same convention as ngram_lm_score).

    Returns one row per doc: (id, n_bigrams, weight).  Docs with fewer
    than 2 tokens carry weight 0 (no features).  Top-m SELECTION
    deliberately composes downstream (curation.budget_take /
    weighted_sample) instead of embedding a global-ordering window
    here.

    Range bound: (c+1) * SCALE must fit int64 — same precondition as
    ngram_lm_score, and the doc-weight sum adds a further factor of
    n_bigrams * SCALE ≈ 1e12 per doc, far inside int64.

    Scale: two reference-model builds (map-side-combined feature
    groupBys capped at B rows out), two one-row totals, then ONE pass
    over the corpus features with two broadcast joins (B-row tables) —
    no corpus-global shuffle beyond the per-doc feature groupBy."""
    toks = F.split(F.col(text_col), " ")

    def feats(frame: DataFrame) -> DataFrame:
        bg = (
            frame.select(
                "_id",
                "toks",
                F.explode(
                    F.when(
                        F.size("toks") >= 2,
                        F.sequence(F.lit(1), F.size("toks") - 1),
                    ).otherwise(F.array().cast("array<int>"))
                ).alias("i"),
            )
            .select(
                "_id",
                F.concat_ws(
                    " ",
                    F.element_at("toks", F.col("i")),
                    F.element_at("toks", F.col("i") + 1),
                ).alias("b"),
            )
        )
        feat = (
            F.conv(F.substring(F.md5("b"), 1, 8), 16, 10).cast("bigint")
            % n_buckets
        )
        return (
            bg.select("_id", feat.alias("feat"))
            .groupBy("_id", "feat")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    base = docs.select(F.col(id_col).alias("_id"), toks.alias("toks"))
    tbase = target.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("toks")
    )
    doc_f = feats(base)
    tgt_f = feats(tbase)

    tgt_model = tgt_f.groupBy("feat").agg(F.sum("cnt").alias("ct"))
    raw_model = doc_f.groupBy("feat").agg(F.sum("cnt").alias("cr"))
    tgt_total = tgt_f.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("nt"))
    raw_total = doc_f.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("nr"))

    term = F.expr(
        f"cnt * ((coalesce(ct, 0L) + 1L) * {SCALE}L div (nt + {n_buckets}L)"
        f" - (coalesce(cr, 0L) + 1L) * {SCALE}L div (nr + {n_buckets}L))"
    )
    # short docs (no features) enter the same groupBy as one NULL stub
    # row each — the corpus-wide join-back the pre-r19 form paid to
    # restore them is gone (sum ignores the NULLs; the coalesce below
    # supplies the 0s exactly as before)
    stubs = docs.select(
        F.col(id_col).alias("_id"),
        F.lit(None).cast("bigint").alias("cnt"),
        F.lit(None).cast("bigint").alias("term"),
    )
    weights = (
        doc_f.join(F.broadcast(tgt_model), "feat", "left")
        .join(F.broadcast(raw_model), "feat", "left")
        .crossJoin(F.broadcast(tgt_total))
        .crossJoin(F.broadcast(raw_total))
        .select("_id", "cnt", term.alias("term"))
        .unionByName(stubs)
        .groupBy("_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum("term").cast("bigint").alias("weight"),
        )
    )
    return weights.select(
        F.col("_id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("weight", F.lit(0)).cast("bigint").alias("weight"),
    )


def perplexity_buckets(
    docs: DataFrame,
    ref_docs: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al.
    2020, §4.3): score every document with the reference bigram LM
    (ngram_lm_score — the integer-exact rational surrogate for
    perplexity) and split each language's population into `n_buckets`
    equal-frequency buckets by score rank, best scores first.  Bucket 1
    is "head" (closest to the reference distribution), bucket
    `n_buckets` is "tail"; CCNet trains on head+middle and drops or
    down-weights tail.

    Output: (id, group, n_bigrams, lm_score, bucket INT, bucket_label)
    for every input document.  Unscorable documents (< 2 tokens, NULL
    score) are assigned the tail bucket DIRECTLY and the equal-frequency
    rank runs over scored documents only — the conservative CCNet
    disposition, ENFORCED (ntile over the mixed population merely sorts
    NULLs last, so a group where unscorable docs outnumber the tail
    bucket's capacity would rank some of them head/middle; r15
    self-review finding).

    Scale: scoring is ngram_lm_score's broadcast-model projection; the
    ONLY added shuffle is one hash exchange on the group column feeding
    the per-group rank (ntile) — a per-language sort, the exact form.
    At production, a dominant language makes that sort the skew
    bottleneck; the production variant computes per-group score
    THRESHOLDS on a sample and broadcasts them as a range filter,
    trading exact equal-frequency splits for a shuffle-free scoring
    pass — the same calibrate-on-a-sample contract as dedup_recall, and
    MEASURED: 0.977 bucket / 0.989 keep-set agreement vs this exact
    form at sf0.1 on a 1-in-3 sample (scripts/quality_gate_eval.py).
    The constant-size EH quantile sketch is NOT a substitute here —
    measured 0.416 agreement, because its 12.5% multiplicative value
    resolution cannot separate tercile cuts that differ by 1.2% on this
    near-degenerate score band (SCALE.md "Curation family").  This
    operator is the exact/oracle form the variants are judged
    against."""
    from pyspark.sql import Window

    # the group column rides the scoring pass (extra_cols) — no corpus
    # re-join for the metadata (r19; values identical, the column is
    # functionally dependent on the id)
    scored = ngram_lm_score(
        docs, ref_docs, id_col, text_col, extra_cols=(group_col,)
    )
    # NULL-ness rides in the PARTITION key, so scored docs ntile among
    # themselves (partition (group, false)) in ONE window pass — a
    # filter+union split would evaluate the scoring chain once per
    # branch (measured +1.3 s on the pipeline entry); the CASE pins the
    # NULL partition's rows to the tail without reading its ntile.
    w = (
        Window.partitionBy(group_col, F.col("lm_score").isNull())
        .orderBy(F.col("lm_score").desc(), F.col(id_col))
    )
    labels = ["head", "middle", "tail"] if n_buckets == 3 else [
        f"b{i + 1}" for i in range(n_buckets)
    ]
    label_arr = F.array(*[F.lit(s) for s in labels])
    bucket = (
        F.when(F.col("lm_score").isNull(), F.lit(n_buckets))
        .otherwise(F.ntile(n_buckets).over(w))
        .cast("int")
    )
    return (
        scored.select(
            id_col,
            group_col,
            "n_bigrams",
            "lm_score",
            bucket.alias("bucket"),
        )
        .withColumn("bucket_label", F.element_at(label_arr, F.col("bucket")))
    )


def perplexity_gate_thresholds(
    docs: DataFrame,
    ref_docs: DataFrame,
    n_buckets: int = 3,
    keep_buckets: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """The curation-cycle batch product behind the streaming quality
    gate: per-group LM-score thresholds at the keep/drop boundary,
    derived from the exact bucketing — min lm_score over buckets
    1..keep_buckets (CCNet keeps head+middle).  Output: (group,
    thr DOUBLE), |groups| rows — broadcast-sized by construction.

    Boundary contract (stated, not hidden): ntile splits equal scores
    at the boundary by doc_id, so applying `score >= thr` keeps EVERY
    doc tied at the boundary score while the exact bucketing tails
    some of them — the threshold form trades that edge for a
    shuffle-free gate.  On continuous scores the two agree exactly."""
    b = perplexity_buckets(
        docs, ref_docs, n_buckets, id_col, text_col, group_col
    )
    return (
        b.filter(
            (F.col("bucket") <= keep_buckets) & F.col("lm_score").isNotNull()
        )
        .groupBy(group_col)
        .agg(F.min("lm_score").alias("thr"))
    )


def perplexity_gate_apply(
    docs: DataFrame,
    ref_docs: DataFrame,
    thresholds: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Apply precomputed per-group thresholds to a document set: score
    with the reference LM, broadcast-join the |groups|-row threshold
    table, keep iff the score clears the group's bar.  Unscorable docs
    (NULL score) and groups unseen at calibration (NULL thr) are
    DROPPED — the conservative disposition, stated.  Shuffle-free past
    the scoring groupBy: the threshold side is a broadcast, the verdict
    a projection.  Used identically by the batch path and by every
    micro-batch of streaming/quality.perplexity_gate_stream — the plan
    IS the parity contract."""
    scored = ngram_lm_score(
        docs, ref_docs, id_col, text_col, extra_cols=(group_col,)
    )
    return (
        scored.join(F.broadcast(thresholds), group_col, "left")
        .select(
            id_col,
            group_col,
            "n_bigrams",
            "lm_score",
            F.when(
                F.col("lm_score").isNotNull()
                & F.col("thr").isNotNull()
                & (F.col("lm_score") >= F.col("thr")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("keep"),
        )
    )

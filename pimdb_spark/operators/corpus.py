"""Corpus-level statistics and hygiene operators for training-data
pipelines: token document-frequency / IDF, corpus top n-grams, eval-set
decontamination, source-priority dedup, repetition scoring, and PII-style
redaction.

The reference's query surface is per-table SQL (pimdb/command.py:223-237);
these are the corpus-wide analyses a 100 TB text pipeline runs on top of
that surface.  All hot paths are JVM column expressions (whole-stage
codegen); the only shuffles are the aggregations/windows that the
semantics require, and each one is partial-aggregated map-side first.

Scale notes per operator:
- doc_frequency: explode(distinct tokens per doc) -> groupBy(token).
  Partial aggregation collapses each task's token multiset before the
  single shuffle; skewed head tokens ("the") are exactly the case
  map-side combine handles.
- top_ngrams: same shape + TakeOrderedAndProject — the global top-k never
  materializes the full n-gram distribution on one node.
- decontaminate: anti-join docs against a (small) eval fingerprint set —
  broadcast, so the corpus scan is shuffle-free.
- priority_dedup: one hash-partition window over fingerprint; digest-only
  shuffle is impossible here (the winning row's payload must survive),
  but the fingerprint is computed in the scan projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _text_col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def doc_frequency(
    docs: DataFrame, text_col: str = "text", sep: str = " "
) -> DataFrame:
    """(token, df): number of documents containing each token.
    `array_distinct` before the explode keeps within-document repetition
    out of the count and shrinks the exploded row count."""
    toks = F.array_distinct(F.split(F.col(text_col), sep))
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )


def idf(df_col: Column | str, n_docs: Column) -> Column:
    """BM25-flavored inverse document frequency WITHOUT the log:
    (N - df + 0.5) / (df + 0.5).  Rationale: the log is monotone, so every
    ranking downstream is unchanged, and pure IEEE-754 arithmetic from
    integers is bit-identical across engines (libm log implementations are
    not) — which keeps the operator oracle-checkable by value hash."""
    d = F.col(df_col) if isinstance(df_col, str) else df_col
    return (n_docs.cast("double") - d + F.lit(0.5)) / (d + F.lit(0.5))


def with_idf(doc_freq: DataFrame, docs: DataFrame) -> DataFrame:
    """Attach idf to a doc_frequency result.  The corpus size joins in as
    a ONE-ROW broadcast (never collected to the driver).  This plans as a
    BroadcastNestedLoopJoin, which is fine here and only here: the build
    side is exactly one row, so the "nested loop" is a constant attach —
    O(n) work, no pairing blowup (a constant-key equi-join folds back to
    the same plan anyway)."""
    n = docs.agg(F.count("*").alias("_n_docs"))
    return doc_freq.crossJoin(F.broadcast(n)).select(
        "token", "df", idf("df", F.col("_n_docs")).alias("idf")
    )


def ngrams(text: Column | str, n: int, sep: str = " ") -> Column:
    """Array of space-joined n-grams of the whitespace tokens; empty array
    when the document has fewer than n tokens."""
    toks = F.split(_text_col(text), sep)
    starts = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide k most frequent n-grams, ties broken by n-gram text so
    the result is a deterministic total order."""
    return (
        docs.select(F.explode(ngrams(text_col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram"))
        .limit(k)
    )


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop every training document whose exact text fingerprint appears
    in the held-out eval set (train/test contamination removal).  The eval
    side reduces to distinct md5 fingerprints and is broadcast."""
    fp = F.md5(F.col(text_col))
    eval_fps = eval_docs.select(fp.alias("_fp")).distinct()
    return (
        docs.withColumn("_fp", fp)
        .join(F.broadcast(eval_fps), "_fp", "left_anti")
        .drop("_fp")
    )


def priority_dedup(
    docs: DataFrame,
    priority_cols: Sequence[str],
    text_col: str = "text",
) -> DataFrame:
    """Among exact-duplicate documents (same md5(text)), keep the single
    row that sorts first by `priority_cols` (e.g. source rank, then doc_id
    as the deterministic tie-break).  One window shuffle on the
    fingerprint."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(
        *[F.col(c) for c in priority_cols]
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def repetition_ratio(text: Column | str, sep: str = " ") -> Column:
    """1 - distinct_tokens/total_tokens: 0.0 for no repeated tokens,
    approaching 1.0 for degenerate repetition (a standard quality gate for
    generated/boilerplate text)."""
    toks = F.split(_text_col(text), sep)
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks).cast(
        "double"
    )


def redact(text: Column | str) -> Column:
    """Replace email-like tokens then digit runs with typed placeholders —
    the shape of a PII scrub pass (real deployments swap in their own
    pattern set).  Two JVM regexp_replace calls, no UDF."""
    t = _text_col(text)
    t = F.regexp_replace(t, "[a-zA-Z0-9]+@[a-zA-Z0-9.]+", "<EMAIL>")
    return F.regexp_replace(t, "[0-9]+", "<NUM>")


def token_blocks(text: Column | str, block: int, sep: str = " ") -> Column:
    """Array of consecutive `block`-token segments (the last one may be
    shorter) — the fixed-width segmentation used when a corpus has no
    natural paragraph breaks.  Callers with real paragraph structure pass
    their own ``split(text, '\\n\\n')`` instead."""
    toks = F.split(_text_col(text), sep)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(block))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, block)))


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    segments: Column | None = None,
    text_col: str = "text",
    block: int = 10,
    sep: str = " ",
) -> DataFrame:
    """Paragraph-level exact deduplication across the corpus (the Dolma /
    RefinedWeb hygiene pass): each document is split into segments, a
    segment occurrence survives only if it is the corpus-wide FIRST
    occurrence of that exact segment (ordered by (doc_id, position)), and
    the survivors are re-assembled in document order.  Returns
    (id, text, n_segments, n_kept) — documents whose every segment was
    seen earlier collapse to an empty string rather than disappearing, so
    downstream joins keep their row count.

    `segments` defaults to fixed `block`-token windows (token_blocks);
    corpora with real structure pass e.g. ``F.split("text", "\\n\\n")``.

    Scale: two keyed shuffles, both inherent to the semantics — one
    window on md5(segment) (keep-first needs a global view per segment;
    only (id, pos, segment) rows move, never whole documents), one
    groupBy on the doc id to re-assemble.  Both are hash partitionings
    on high-cardinality keys; the md5 window's skew ceiling is the
    duplication count of the single most-repeated segment.
    """
    segs = segments if segments is not None else token_blocks(text_col, block, sep)
    exploded = docs.select(
        F.col(id_col), F.posexplode(segs).alias("pos", "seg")
    )
    w = Window.partitionBy(F.md5(F.col("seg"))).orderBy(id_col, "pos")
    kept = exploded.withColumn("_rn", F.row_number().over(w))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct(F.col("pos"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("text"),
        )
        .select(id_col, "text", "n_segments", "n_kept")
    )
    return rebuilt


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    threshold: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """N-gram-level eval-set decontamination — the stronger form of
    `decontaminate`: a training document is contaminated when it shares at
    least `threshold` distinct `n`-grams with the held-out eval set
    (exact-text matching misses paraphrased or embedded leakage; 8-gram
    overlap is the published convention, e.g. GPT-3 appendix C / PaLM).
    Returns every training row as (id, n_shared_ngrams, keep).

    Scale: the eval side reduces to distinct n-gram md5s and broadcasts,
    so the corpus-side explode joins WITHOUT a corpus shuffle; the only
    shuffle aggregates (id, matched-gram) hits — proportional to the
    contamination volume, not the corpus.  The final attach of the
    per-doc count is a left join on the id (broadcast-sized when
    contamination is rare)."""
    gram_fp = lambda c: F.md5(c)  # noqa: E731
    eval_grams = (
        eval_docs.select(F.explode(ngrams(text_col, n, sep)).alias("g"))
        .select(gram_fp(F.col("g")).alias("_gfp"))
        .distinct()
    )
    hits = (
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(ngrams(text_col, n, sep))).alias("g"),
        )
        .select(id_col, gram_fp(F.col("g")).alias("_gfp"))
        .join(F.broadcast(eval_grams), "_gfp")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shared_ngrams"), F.lit(0)).alias(
                "n_shared_ngrams"
            ),
            (F.coalesce(F.col("n_shared_ngrams"), F.lit(0)) < threshold).alias(
                "keep"
            ),
        )
    )


def corpus_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    sep: str = " ",
    top_k: int = 25,
) -> DataFrame:
    """Token-distribution drift between two corpora as per-token
    chi-square contributions — the drift-detection gate between snapshot
    generations, domains, or language slices (which tokens moved, and by
    how much).  KL divergence needs log, which is not bit-identical
    across engines (see idf); the chi-square statistic is pure rational
    arithmetic on integer counts, so the result is oracle-exact:

        e_side = (o_a + o_b) * n_side / (n_a + n_b)
        chi2   = (o_a - e_a)^2 / e_a + (o_b - e_b)^2 / e_b

    Returns the top_k most-divergent tokens (chi2 desc, token asc):
    (token, o_a, o_b, chi2).

    Scale: one shuffle per side for the token counts; the full-outer
    token join shuffles (token, count) pairs only; totals ride one-row
    broadcasts; top-k is TakeOrderedAndProject."""
    def counts(docs: DataFrame, alias: str) -> DataFrame:
        return (
            docs.select(F.explode(F.split(F.col(text_col), sep)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    ta, tb = counts(docs_a, "o_a"), counts(docs_b, "o_b")
    joined = (
        ta.join(tb, "token", "full")
        .select(
            "token",
            F.coalesce(F.col("o_a"), F.lit(0)).alias("o_a"),
            F.coalesce(F.col("o_b"), F.lit(0)).alias("o_b"),
        )
    )
    na = joined.agg(F.sum("o_a").alias("_na"))
    nb = joined.agg(F.sum("o_b").alias("_nb"))
    both = joined.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
    total = F.col("o_a") + F.col("o_b")
    ra = F.col("_na").cast("double") / (F.col("_na") + F.col("_nb"))
    rb = F.col("_nb").cast("double") / (F.col("_na") + F.col("_nb"))
    ea = total * ra
    eb = total * rb
    chi2 = (F.col("o_a") - ea) * (F.col("o_a") - ea) / ea + (
        F.col("o_b") - eb
    ) * (F.col("o_b") - eb) / eb
    return (
        both.select("token", "o_a", "o_b", chi2.alias("chi2"))
        .orderBy(F.col("chi2").desc(), "token")
        .limit(top_k)
    )


def bpe_pair_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies — the inner statistic
    of byte-pair-encoding tokenizer training.  Words are whitespace
    tokens with the </w> end marker; symbols start as characters; the
    count of pair (a, b) is Σ over distinct words of
    word_frequency x in-word occurrences.  Returns (lhs, rhs, cnt) —
    named to dodge LEFT/RIGHT reserved-word traps downstream.

    Scale: the word vocabulary is distinct-ed FIRST (groupBy word →
    freq), so the per-word symbol explode runs once per DISTINCT word,
    not once per corpus occurrence — on a natural-language corpus that
    is orders of magnitude less work (Zipf); the only other shuffle is
    the final pair groupBy with map-side combine."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return _pair_counts_from_words(words, F.col("word"))


def _pair_counts_from_words(words: DataFrame, symbols_src) -> DataFrame:
    """(word, freq) + a column expression rendering the word as a
    space-joined symbol string -> (lhs, rhs, cnt).  Internal: shared
    by bpe_pair_counts (char symbols) and bpe_train_steps (post-merge
    symbol strings)."""
    syms = F.split(symbols_src, " ") if isinstance(symbols_src, str) else None
    if syms is None:
        # char symbols + </w>: "ab" -> ["a", "b", "</w>"]
        syms = F.concat(
            F.split(F.col("word"), ""), F.array(F.lit("</w>"))
        )
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("lhs"),
                F.element_at(syms, i + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def bpe_train_steps(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``n_merges`` rounds of BPE tokenizer training as DataFrame plans:
    each round counts adjacent-symbol pairs over the (distinct-word,
    frequency) vocabulary, picks the most frequent pair — ties broken on
    (left, right) strings, so the winner is deterministic on every
    engine — and merges every non-overlapping left-to-right occurrence.
    Returns one row per merge round: (merge_rank, lhs, rhs, cnt).

    The merge rewrite is a whole-token string replace on the space-joined
    symbol rendering (" a b " -> " ab " with boundary guards), which is
    exactly BPE's left-to-right non-overlapping rule; the winning pair
    attaches to the vocabulary as a ONE-ROW BROADCAST (never collected),
    and each round's vocabulary is localCheckpoint-ed — the house
    iterative pattern (kmeans/bfs).

    Scale: the heavy statistic (pair counts) runs over distinct words x
    rounds; vocabulary state is one row per distinct word.  Production
    BPE runs thousands of merges — each round here is one pair-count
    shuffle + a TakeOrdered top-1, so rounds are cheap but sequential;
    batch several merges per count round (the standard approximation)
    when merge count dominates."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        # symbol rendering with sentinel spaces for whole-symbol replace
        .select(
            F.concat(
                F.lit(" "),
                F.array_join(
                    F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))),
                    " ",
                ),
                F.lit(" "),
            ).alias("sym"),
            "freq",
        )
        .localCheckpoint(eager=False)
    )
    out = None
    for rank in range(1, n_merges + 1):
        counts = _pair_counts_from_words(
            words.select(F.trim(F.col("sym")).alias("word"), "freq"), "word"
        )
        best = (
            counts.orderBy(F.col("cnt").desc(), "lhs", "rhs")
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"), "lhs", "rhs", "cnt"
            )
            .localCheckpoint(eager=False)
        )
        out = best if out is None else out.unionByName(best)
        # merge: " left right " -> " leftright "; replace twice because
        # left-to-right non-overlapping replace consumes the shared
        # boundary space of back-to-back occurrences ("a b a b")
        pat = F.concat(F.lit(" "), F.col("lhs"), F.lit(" "), F.col("rhs"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" "))
        words = (
            words.crossJoin(F.broadcast(best.select("lhs", "rhs")))
            .select(
                F.replace(F.replace(F.col("sym"), pat, rep), pat, rep).alias("sym"),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
    return out


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list to the corpus and count the
    resulting tokens per document — the train→apply loop closed:
    ``merges`` is a (merge_rank, lhs, rhs) frame (bpe_train_steps
    output), applied in rank order with the same whole-token
    double-replace rewrite the trainer uses.  Returns
    (doc_id, n_tokens): the post-BPE sequence length, the number that
    token-budget curation (budget_take / pack_sequences) actually needs.

    Scale: the rewrite runs over the exploded per-doc word stream (no
    distinct here — counts are per document); each merge attaches as a
    ONE-ROW broadcast filtered by rank, so the plan stays collect-free;
    one final doc-keyed groupBy sums symbol counts."""
    words = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .select(
            "doc",
            F.concat(
                F.lit(" "),
                F.array_join(
                    F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))),
                    " ",
                ),
                F.lit(" "),
            ).alias("sym"),
        )
    )
    for rank in range(1, n_merges + 1):
        m = merges.filter(F.col("merge_rank") == rank).select("lhs", "rhs")
        pat = F.concat(F.lit(" "), F.col("lhs"), F.lit(" "), F.col("rhs"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" "))
        words = words.crossJoin(F.broadcast(m)).select(
            "doc",
            F.replace(F.replace(F.col("sym"), pat, rep), pat, rep).alias("sym"),
        )
    return words.groupBy(F.col("doc").alias(id_col)).agg(
        F.sum(F.size(F.split(F.trim(F.col("sym")), " "))).cast("bigint").alias("n_tokens")
    )

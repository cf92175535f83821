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
    when the document has fewer than n tokens.

    NOTE (r18 optimization round): F.transform is a higher-order function
    and higher-order functions are INTERPRETED, not codegen'd — on hot
    corpus passes prefer exploded_ngram_rows below (explode(sequence) +
    slice/concat_ws, whole-stage-codegen'd; measured ~3-5x cheaper per
    pass).  Keep this Column form only where the per-row ARRAY itself is
    required."""
    toks = F.split(_text_col(text), sep)
    starts = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def exploded_ngram_rows(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    text_col: str,
    n: int,
    sep: str = " ",
    out: str = "g",
) -> DataFrame:
    """One (<cols...>, n-gram) row per n-gram OCCURRENCE — value-identical
    to ``df.select(*cols, F.explode(ngrams(text_col, n, sep)).alias(out))``
    but built from explode(sequence) + slice + concat_ws, which
    whole-stage-codegens (the transform lambda inside ngrams() is
    interpreted row-at-a-time — the r18 optimization round measured the
    interpreted chain as the dominant cost of every corpus-pass consumer).
    No shuffle, no window: the token array stays inside one codegen stage
    and each position row reads it in place.

    Short docs (< n tokens) produce no rows, same as the empty-array
    branch of ngrams()."""
    reserved = {"_toks", "_nt", "_i"}
    clashes = (set(cols) | {out}) & reserved
    if clashes or out in set(cols):
        raise ValueError(
            "exploded_ngram_rows: output/carried column names collide with "
            f"the reserved internals {sorted(reserved)} or each other: "
            f"cols={list(cols)!r}, out={out!r}"
        )
    toks = F.split(F.col(text_col), sep)
    base = df.select(
        *[F.col(c) for c in cols], toks.alias("_toks"), F.size(toks).alias("_nt")
    )
    pos = F.explode(
        F.when(
            F.col("_nt") >= n, F.sequence(F.lit(1), F.col("_nt") - n + 1)
        ).otherwise(F.array().cast("array<int>"))
    )
    return base.select(*cols, pos.alias("_i"), "_toks").select(
        *cols, F.concat_ws(" ", F.slice("_toks", F.col("_i"), n)).alias(out)
    )


def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide k most frequent n-grams, ties broken by n-gram text so
    the result is a deterministic total order."""
    return (
        exploded_ngram_rows(docs, (), text_col, n, out="ngram")
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
    # r18 optimization: both gram passes use the codegen'd
    # exploded_ngram_rows form instead of the interpreted ngrams()
    # transform; the train side's per-doc array_distinct becomes a
    # count_distinct over the (tiny) matched set — the same distinct
    # shared-gram count, with dedup paid only for hits instead of for
    # every corpus gram.
    eval_grams = (
        exploded_ngram_rows(eval_docs, (), text_col, n, sep)
        .select(gram_fp(F.col("g")).alias("_gfp"))
        .distinct()
    )
    hits = (
        exploded_ngram_rows(docs, (id_col,), text_col, n, sep)
        .select(id_col, gram_fp(F.col("g")).alias("_gfp"))
        .join(F.broadcast(eval_grams), "_gfp")
        .groupBy(id_col)
        .agg(F.count_distinct("_gfp").alias("n_shared_ngrams"))
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
    the final pair groupBy with map-side combine.

    Character semantics: initial symbols come from ``F.split(word, '')``,
    which in Spark splits on UTF-16 CODE UNITS — astral-plane characters
    (emoji, rare CJK) become two unpaired-surrogate symbols, whereas a
    code-point tokenizer (or the DuckDB oracle's ``word[i]``) would keep
    them whole.  The BPE family therefore assumes BMP-only (in practice
    ASCII) text; run byte-level or NFC-normalized pre-tokenization
    upstream for full-Unicode corpora."""
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
    use ``bpe_train_batched`` (several non-conflicting merges per count
    round, the standard approximation) when merge count dominates.
    Character semantics: BMP-only, same caveat as bpe_pair_counts."""
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


def _merge_rewrite(acc, lhs, rhs):
    """One whole-token BPE merge on a sentinel-spaced symbol string:
    " lhs rhs " -> " lhsrhs ", replaced twice because left-to-right
    non-overlapping replace consumes the shared boundary space of
    back-to-back occurrences ("a b a b").

    Known deviation from symbol-list BPE, only for SAME-symbol pairs on
    runs >= 5: on "c c c c c" the first replace pass consumes the
    boundary space after occurrence 1 and therefore merges positions
    (1,2) and (4,5), leaving symbol 3 isolated between merged tokens
    where the second pass cannot reach it — strict leftmost-greedy would
    merge (1,2),(3,4) and leave symbol 5.  Adjacency differs from run
    length 5; from run length 9 even the merged-pair COUNT drops below
    leftmost-greedy's floor(k/2) (k=9: replace merges 3 pairs, greedy
    4).  Both the Spark plan and the DuckDB oracle use the same replace
    semantics, so parity holds; distinct-symbol pairs are exact (the
    skipped middle occurrence is caught by the second pass)."""
    pat = F.concat(F.lit(" "), lhs, F.lit(" "), rhs, F.lit(" "))
    rep = F.concat(F.lit(" "), lhs, rhs, F.lit(" "))
    return F.replace(F.replace(acc, pat, rep), pat, rep)


def _merge_array(merges: DataFrame, rank_col: str = "merge_rank") -> DataFrame:
    """Collapse a (rank, lhs, rhs) merge frame into ONE row holding the
    rank-ordered array of merge structs — the broadcast payload that
    lets apply/train rewrite a vocabulary with a single fold expression
    instead of one join per merge.  ``agg`` without groupBy always
    returns exactly one row (empty input -> empty array), so the
    crossJoin can never silently empty the stream."""
    return merges.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(rank_col).alias("r"),
                    F.col("lhs").alias("lhs"),
                    F.col("rhs").alias("rhs"),
                )
            )
        ).alias("ms")
    )


def _fold_merges(sym_col, ms_col="ms"):
    """Apply every merge in the ``ms`` array to ``sym_col`` in rank
    order via ONE F.aggregate fold — plan depth O(1) in the merge
    count; the per-row cost (merges x |sym|) is unchanged from the
    join-per-merge form but a 30k-merge list no longer builds a
    30k-stage plan."""
    return F.aggregate(
        ms_col,
        sym_col,
        lambda acc, m: _merge_rewrite(acc, m["lhs"], m["rhs"]),
    )


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list to the corpus and count the
    resulting tokens per document — the train→apply loop closed:
    ``merges`` is a (merge_rank, lhs, rhs) frame (bpe_train_steps /
    bpe_train_batched output), applied in rank order with the same
    whole-token double-replace rewrite the trainers use.  Returns
    (doc_id, n_tokens): the post-BPE sequence length, the number that
    token-budget curation (budget_take / pack_sequences) actually needs.

    The merge list must cover EVERY rank in [1, n_merges]: a short list
    (n_merges beyond what training produced) raises ValueError up front
    instead of silently under-applying — the ≤n_merges-row count here is
    the same bounded-readback class as functions/ids.py.

    Scale: the rewrite runs over the exploded per-doc word stream (no
    distinct here — counts are per document); the WHOLE merge list
    attaches as ONE one-row broadcast array and applies as ONE
    F.aggregate fold, so plan depth stays O(1) in the merge count (at a
    production ~30k merges the old join-per-merge chain was itself the
    bottleneck); one final doc-keyed groupBy sums symbol counts."""
    ranked = merges.filter(F.col("merge_rank").between(1, n_merges))
    got = ranked.select("merge_rank").distinct().count()
    if got != n_merges:
        raise ValueError(
            f"bpe_apply: merge list covers {got} of the {n_merges} "
            "requested ranks — train more merges or lower n_merges"
        )
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
    folded = words.crossJoin(F.broadcast(_merge_array(ranked))).select(
        "doc", _fold_merges(F.col("sym")).alias("sym")
    )
    return folded.groupBy(F.col("doc").alias(id_col)).agg(
        F.sum(F.size(F.split(F.trim(F.col("sym")), " "))).cast("bigint").alias("n_tokens")
    )


def bpe_encode_lengths(
    docs: DataFrame,
    merges: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """bpe_apply's PRODUCTION twin: post-BPE token count per document via
    the classic rank-dict encoder in an Arrow-batched pandas UDF — per
    word, repeatedly merge the lowest-rank pair present (all occurrences,
    left-to-right non-overlapping), with a per-batch distinct-word cache
    (Zipf leverage).  Work per word is O(|word|^2) with dict lookups and
    INDEPENDENT of the merge count — the property the replace-chain form
    cannot have (its cost is O(n_merges x |word|) per word, linear in the
    merge list; measured in SCALE.md).  At a production ~30k merges this
    is the only feasible apply.

    Semantics: identical to bpe_apply for self-consistent merge lists
    (a trainer-produced pair's constituents always carry lower ranks, so
    ascending-rank replay never misses a merge) EXCEPT the same-symbol
    run caveat on _merge_rewrite — from run length 9 the replace-chain
    merges fewer pairs than the classic greedy used here.  The synthetic
    corpus's longest same-char run is 2, so the twin hash-matches the
    q_bpe_apply oracle on every testdata scale.

    Scale: the merge list is collected ONCE to the driver — bounded by
    n_merges (vocabulary-size scale, ~30k rows in production: the same
    bounded-readback class as functions/ids.py) — and ships to workers
    as a broadcast dict; the UDF is Arrow-batched (ArrowEvalPython, the
    sanctioned slow path), one pass over documents, zero joins, zero
    shuffles before the final projection."""
    import pandas as pd

    rows = (
        merges.filter(F.col("merge_rank").between(1, n_merges))
        .select("merge_rank", "lhs", "rhs")
        .collect()
    )
    if len({r.merge_rank for r in rows}) != n_merges:
        raise ValueError(
            f"bpe_encode_lengths: merge list covers {len({r.merge_rank for r in rows})} "
            f"of the {n_merges} requested ranks"
        )
    ranks = {(r.lhs, r.rhs): r.merge_rank for r in rows}
    bc = docs.sparkSession.sparkContext.broadcast(ranks)

    def _n_tokens_fn(texts):
        rk = bc.value
        cache: dict = {}

        def word_len(w: str) -> int:
            n = cache.get(w)
            if n is not None:
                return n
            syms = list(w) + ["</w>"]
            while len(syms) >= 2:
                best = None
                for a, b in zip(syms, syms[1:]):
                    r = rk.get((a, b))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, (a, b))
                if best is None:
                    break
                pair = best[1]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = n = len(syms)
            return n

        return texts.map(
            lambda t: sum(word_len(w) for w in t.split(" ") if w)
        )

    # explicit annotations: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's type inference cannot resolve here
    _n_tokens_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _n_tokens = F.pandas_udf(_n_tokens_fn, "bigint")

    return docs.select(
        F.col(id_col).alias(id_col), _n_tokens(F.col(text_col)).alias("n_tokens")
    )


def bpe_train_batched(
    docs: DataFrame,
    n_rounds: int,
    batch_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batched BPE tokenizer training — the standard approximation for
    production merge counts: per count round, take the top
    ``batch_size`` pairs by (count desc, lhs, rhs) and accept every pair
    that shares NO symbol-or-output with ANY higher-ranked pool pair
    (symbols(p) = {lhs, rhs, lhs||rhs}; the conflict test is against
    the pool position, not acceptance, so it needs no sequential state
    and both engines can evaluate it as a plain anti-join).  Accepted
    pairs are mutually disjoint in symbols AND outputs, so their
    whole-token rewrites cannot interact and one fold applies the batch.
    Returns (merge_rank, batch_no, lhs, rhs, cnt) with merge_rank dense
    over all accepted merges in (round, pool-position) order — feed it
    straight to bpe_apply.

    vs bpe_train_steps: one pair-count shuffle yields up to
    ``batch_size`` merges instead of exactly one, cutting the
    driver-sequenced round count ~batch_size-fold at production merge
    counts; the cost is the approximation (counts within a batch are
    stale for all but the first accepted pair — the standard trade).

    Scale: per round one pair-count shuffle + a TakeOrdered top-m pool;
    the conflict filter is an anti-join of the ≤m-row pool against
    itself (bounded m², never data-sized); the accepted batch attaches
    to the vocabulary as a ONE-ROW broadcast array and applies as one
    fold; vocabulary state is one row per distinct word, checkpointed
    per round.  Character semantics: BMP-only, same caveat as
    bpe_pair_counts."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
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
    accepted_all = None
    for rnd in range(1, n_rounds + 1):
        counts = _pair_counts_from_words(
            words.select(F.trim(F.col("sym")).alias("word"), "freq"), "word"
        )
        pool = (
            counts.orderBy(F.col("cnt").desc(), "lhs", "rhs")
            .limit(batch_size)
            .withColumn(
                "pool_rank",
                F.row_number().over(Window.orderBy(F.col("cnt").desc(), "lhs", "rhs")),
            )
            .withColumn("syms", F.array("lhs", "rhs", F.concat("lhs", "rhs")))
            .localCheckpoint(eager=False)
        )
        accepted = (
            pool.alias("a")
            .join(
                pool.alias("b"),
                (F.col("b.pool_rank") < F.col("a.pool_rank"))
                & F.arrays_overlap(F.col("a.syms"), F.col("b.syms")),
                "left_anti",
            )
            .select(
                F.lit(rnd).cast("int").alias("batch_no"),
                "pool_rank",
                "lhs",
                "rhs",
                "cnt",
            )
            .localCheckpoint(eager=False)
        )
        accepted_all = (
            accepted if accepted_all is None else accepted_all.unionByName(accepted)
        )
        words = (
            words.crossJoin(
                F.broadcast(_merge_array(accepted, rank_col="pool_rank"))
            )
            .select(_fold_merges(F.col("sym")).alias("sym"), "freq")
            .localCheckpoint(eager=False)
        )
    return accepted_all.select(
        F.row_number()
        .over(Window.orderBy("batch_no", "pool_rank"))
        .cast("int")
        .alias("merge_rank"),
        "batch_no",
        "lhs",
        "rhs",
        "cnt",
    )


def boilerplate_strip(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 5,
    min_df: int = 2,
    segments: Column | None = None,
) -> DataFrame:
    """Group-scoped boilerplate removal (the CCNet / RefinedWeb template
    pass): a segment whose exact text occurs in >= ``min_df`` DISTINCT
    documents of the same group (domain/source) is template furniture —
    headers, footers, nav menus, cookie banners — and EVERY occurrence is
    stripped; unique content survives.  This differs from
    ``paragraph_dedup`` (keep the corpus-wide FIRST occurrence) in both
    policy and scope: boilerplate keeps NO occurrence, and the document
    frequency is counted within the group, because a template is only
    evidence of machine generation relative to its own site.

    Returns (id, group, text, n_segments, n_boiler) — one row per doc,
    text re-assembled in order (empty string when everything was
    template), n_boiler = stripped segment occurrences.

    `segments` defaults to fixed `block`-token windows (token_blocks);
    corpora with real structure pass e.g. ``F.split("text", "\\n\\n")``.

    Scale: two keyed shuffles, both inherent — the df count groupBy on
    (group, md5(segment)) moves digest rows only and partial-aggregates
    map-side (count_distinct over doc ids partial-merges as a set per
    digest — bounded by min_df in practice since counting stops
    mattering past it); the verdict join back onto occurrences is a
    hash equi-join on the same key, so AQE co-locates it with the
    count's output partitioning; the re-assembly groupBy on the doc id
    moves surviving segments once.  Skew ceiling = the occurrence count
    of the single most-repeated template, the same bound as
    paragraph_dedup's window."""
    segs = segments if segments is not None else token_blocks(text_col, block)
    exploded = docs.select(
        F.col(id_col),
        F.col(group_col).alias("_grp"),
        F.posexplode(segs).alias("pos", "seg"),
    ).withColumn("_h", F.md5(F.col("seg")))
    df_tab = (
        exploded.groupBy("_grp", "_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_grp", "_h", F.lit(True).alias("_boiler"))
    )
    marked = exploded.join(df_tab, ["_grp", "_h"], "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.first("_grp").alias(group_col),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("_boiler"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_boiler").isNull(),
                                F.struct(F.col("pos"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("text"),
        )
        .select(id_col, group_col, "text", "n_segments", "n_boiler")
    )

"""Bloom-filter membership sketch, engine-portable and exactly
deterministic.

A Bloom filter answers "possibly in the set" / "definitely not in the
set" with a fixed memory budget — the standard prefilter in front of an
exact contamination join when the eval set's n-gram table is too large to
broadcast raw but its *bitmap* is not: m bits cover millions of grams in
m/8 bytes, so the exact (expensive, shuffling) verification join only
ever sees the bloom-positive survivors.

Portability design (the reason this looks different from
``spark.util.sketch.BloomFilter``): Spark's built-in bloom uses
Murmur3-128 over an opaque serialized long-array, which DuckDB cannot
reproduce, so nothing it produces can sit under the repo's hash-parity
gate.  This implementation derives every bit position from the house
md5-prefix integer (``conv(substring(md5(x || ':' || j), 1, 8), 16, 10)``
— identical text in DuckDB), packs bits into 32-BIT words stored in
BIGINTs (bit index < 32 keeps every mask positive, so signed-shift /
sign-extension semantics can never diverge between engines), and
aggregates words with ``bit_or`` — associative, order-free, exact.
The result is a *relational* bloom: a (word_idx, word) table of at most
m/32 rows that broadcasts like any small dimension.

Reference behavior target: pimdb has no sketch structures; this extends
the decontamination family (operators/corpus.ngram_decontaminate) with
the constant-memory prefilter a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32  # bits packed per BIGINT word; < 63 keeps masks positive

# shiftleft with a COLUMN shift amount (pyspark's F.shiftleft only takes a
# literal int); applied to a materialized `_pos` column
_MASK_EXPR = "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT))"


def _md5_int(c: Column) -> Column:
    """First 8 md5 hex chars as a non-negative BIGINT < 2^32 — the house
    engine-portable hash (see operators/curation.py)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def _positions(item: Column, j: Column, m_bits: int) -> Column:
    """Bit position of hash function ``j`` for ``item``: md5 of the
    salted string, mod m."""
    return _md5_int(F.concat(item, F.lit(":"), j.cast("string"))) % F.lit(m_bits)


def bloom_build(
    items: DataFrame, item_col: str, m_bits: int, k_hashes: int,
    distinct_items: bool = True,
) -> DataFrame:
    """Build the bloom bitmap over the values of ``item_col``.

    Returns a (word_idx BIGINT, word BIGINT) frame with at most
    ``m_bits / 32`` rows — only words with at least one set bit appear
    (absent word == 0).  One shuffle: the ``bit_or`` groupBy, whose
    map-side partial combine caps every task's output at m/32 rows, so
    the exchange volume is #tasks x m/32 regardless of item count.

    ``distinct_items=False`` skips the pre-aggregation distinct — the
    bitmap is IDENTICAL because bit_or is idempotent; the streaming twin
    uses this (distinct over an unbounded stream needs state the OR does
    not), and batch callers whose item column is already unique can too."""
    if m_bits % _WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {_WORD_BITS}: {m_bits}")
    pos = _positions(F.col(item_col), F.col("_j"), m_bits)
    base = items.select(F.col(item_col))
    if distinct_items:
        base = base.distinct()
    return (
        base
        .select(
            item_col,
            F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("_j"),
        )
        .select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(_MASK_EXPR).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    item_col: str,
    bloom: DataFrame,
    m_bits: int,
    k_hashes: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col``: true iff every one of the item's k bit
    positions is set in the bloom (possibly-member); false means
    definitely-not-member.

    Plan shape: the sparse (word_idx, word) bloom collapses to a ONE-ROW
    broadcast map (map_from_entries over at most m/32 entries — the
    bpe_apply one-row-attach pattern) and every probe row tests its k
    positions as k UNROLLED whole-stage-codegen expressions (k is a
    plan-time constant): PROBING IS SHUFFLE-FREE with no higher-order
    function in the hot path.  Two rejected shapes, both measured at
    sf0.1: the k-row fanout + bloom hash-join + fold-back groupBy
    (3.3 s — an extra exchange of k x |probes| rows) and an
    aggregate-lambda fold over a position array (5.5 s — HOF lambdas run
    INTERPRETED, so the per-row md5s fell out of codegen; the SCALE.md
    execution-model rule).  This unrolled form keeps every md5 and bit
    test inside WholeStageCodegen and deletes the probe-side exchange.
    The one-row attach is a constant BroadcastNestedLoopJoin — no
    pairing, allowlisted with the other one-row attaches in
    tests/test_plans.py."""
    bloom_map = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("_bm")
    )
    pos_cols = [
        _positions(F.col(item_col), F.lit(j), m_bits).alias(f"_pos{j}")
        for j in range(k_hashes)
    ]
    # SQL shiftleft takes a COLUMN shift (the python F.shiftleft wrapper
    # only takes a literal int); each test references its materialized
    # position column — plain codegen expressions, no lambda
    def bit_test(j: int):
        shift = f"shiftleft(CAST(1 AS BIGINT), CAST(_pos{j} % 32 AS INT))"
        return F.expr(
            f"(coalesce(element_at(_bm, CAST(_pos{j} DIV 32 AS BIGINT)),"
            f" CAST(0 AS BIGINT)) & {shift}) = {shift}"
        )

    hit = bit_test(0)
    for j in range(1, k_hashes):
        hit = hit & bit_test(j)
    return (
        probes.crossJoin(F.broadcast(bloom_map))
        .select(*probes.columns, "_bm", *pos_cols)
        .select(*probes.columns, hit.alias(out_col))
    )


def bloom_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    m_bits: int = 65536,
    k_hashes: int = 3,
    threshold: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-prefiltered n-gram eval-set decontamination: the
    constant-memory form of operators/corpus.ngram_decontaminate.

    The eval set's distinct n-grams are folded into an m-bit bloom
    (m/8 bytes — fixed, however many grams), every training document's
    distinct n-grams probe it, and ONLY the bloom-positive grams reach
    the exact verification join against the real eval gram set.  Output
    per document: distinct-gram count, bloom-positive count, exact hit
    count, and the keep verdict (< threshold exact hits) — bloom_hits -
    exact_hits is the measured false-positive volume the prefilter
    admitted.

    Scale: at 100 TB the eval gram table is far too big to broadcast,
    but the bloom is m/32 rows no matter what; the exact join — the only
    stage that shuffles gram text — runs over bloom survivors alone,
    whose volume is true hits + FP-rate x corpus grams (tune m for the
    target FP rate: ~0.1%% at m = 10 x distinct grams, k=3)."""
    from pimdb_spark.operators.corpus import exploded_ngram_rows

    # r18 optimization: codegen'd exploded_ngram_rows instead of the
    # interpreted ngrams() transform on both gram passes; the .distinct()
    # shuffles were already paid, so the plan shape is unchanged.
    grams = exploded_ngram_rows(docs, (id_col,), text_col, n, out="gram").distinct()
    eval_grams = exploded_ngram_rows(eval_docs, (), text_col, n, out="gram").distinct()

    bloom = bloom_build(eval_grams, "gram", m_bits, k_hashes)
    probed = bloom_probe(grams, "gram", bloom, m_bits, k_hashes)

    # r19: stub-union instead of the double id join-back — the old form
    # LEFT-joined exact-hit counts onto the per-doc probe aggregate and
    # then LEFT-joined the corpus id set back onto THAT (a broadcast of
    # a corpus-row-sized frame at bench SF; a corpus x corpus sort-merge
    # join beyond the broadcast threshold).  Probe rows, exact-hit rows
    # and one all-zero stub per doc now meet in ONE id-keyed groupBy;
    # the branch-indicator sums reproduce every count exactly (BIGINT,
    # order-free), and zero-gram docs fall out of their stub.
    probe_rows = probed.select(
        id_col,
        F.lit(1).cast("bigint").alias("_g"),
        F.col("bloom_hit").cast("bigint").alias("_bh"),
        F.lit(0).cast("bigint").alias("_eh"),
    )
    hit_rows = (
        probed.filter(F.col("bloom_hit"))
        .join(eval_grams, "gram", "left_semi")
        .select(
            id_col,
            F.lit(0).cast("bigint").alias("_g"),
            F.lit(0).cast("bigint").alias("_bh"),
            F.lit(1).cast("bigint").alias("_eh"),
        )
    )
    stubs = docs.select(
        id_col,
        F.lit(0).cast("bigint").alias("_g"),
        F.lit(0).cast("bigint").alias("_bh"),
        F.lit(0).cast("bigint").alias("_eh"),
    )
    return (
        probe_rows.unionByName(hit_rows)
        .unionByName(stubs)
        .groupBy(id_col)
        .agg(
            F.sum("_g").alias("n_grams"),
            F.sum("_bh").alias("bloom_hits"),
            F.sum("_eh").alias("exact_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "bloom_hits",
            "exact_hits",
            (F.col("exact_hits") < threshold).alias("keep"),
        )
    )


def bloom_build_sliced(
    items: DataFrame,
    item_col: str,
    slice_col: str,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Per-slice bloom bitmaps: (slice, word_idx, word) with one
    independent m-bit bloom per value of ``slice_col`` (typically a time
    bucket).  This is the ROTATION design that gives the monotone bloom
    an expiry story: maintain one bloom per slice, probe the OR-union of
    the live slices, and retire membership by DROPPING whole slices —
    no per-item deletion (impossible in a bloom) and no rebuild.

    Scale: the same single bit_or groupBy as bloom_build with the slice
    in the key — state and output are (live slices) x m/32 rows, still
    corpus-size-independent; the streaming form is the identical
    aggregate (bit_or is idempotent, so replays and batch boundaries
    cannot change any slice's bitmap)."""
    if m_bits % _WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {_WORD_BITS}: {m_bits}")
    pos = _positions(F.col(item_col), F.col("_j"), m_bits)
    return (
        items.select(F.col(slice_col).alias("slice"), F.col(item_col))
        .distinct()
        .select(
            "slice",
            item_col,
            F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("_j"),
        )
        .select("slice", pos.alias("_pos"))
        .select(
            "slice",
            (F.col("_pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(_MASK_EXPR).alias("_mask"),
        )
        .groupBy("slice", "word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_union_live(
    sliced: DataFrame, live_slices: list
) -> DataFrame:
    """OR-union the bitmaps of the given slices into one probeable
    (word_idx, word) bloom — the "current membership window" view.
    Dropping a slice from ``live_slices`` retires its members (modulo
    bits shared with live slices — the documented bloom-rotation trade).
    One groupBy over (live slices) x m/32 rows; output <= m/32 rows."""
    return (
        sliced.filter(F.col("slice").isin(list(live_slices)))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )

"""Streaming bloom-filter maintenance — the continuous twin of
operators/membership.bloom_build: keep an m-bit membership bitmap
up to date as new items arrive, so a decontamination / dedup / routing
probe always has the freshest sketch without ever recomputing the
history.

Why a bloom is the IDEAL streaming aggregate: ``bit_or`` is associative,
commutative, and idempotent — duplicate arrivals, replays, and
micro-batch boundaries cannot change the bitmap, so the streaming state
is exactly the batch result at every trigger with NO dedup state at all
(the batch build's ``distinct`` exists only to shrink the shuffle; the
streaming form calls bloom_build(distinct_items=False) and the OR
absorbs duplicates for free).  State is bounded by construction:
at most m/32 aggregation groups (one per 32-bit word), independent of
how many items ever arrived — the opposite of keep-first dedup's
grows-with-distinct-keys state.

Production notes (100 TB / unbounded stream): complete-mode output of a
<= m/32-row aggregate is a bounded write per trigger; the sketch is
monotone (bits only turn on), so EXPIRING members needs rotation —
maintain one bloom per time slice and probe the union of live slices,
dropping whole slices as they age out (the standard rotating-bloom
design; the per-slice build is this same aggregate keyed additionally
by the slice)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from pimdb_spark.operators.membership import bloom_build


def bloom_words_stream(
    items: DataFrame, item_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """The continuously-maintained (word_idx, word) bitmap frame over a
    streaming (or batch — same plan) item source.  Use with
    ``outputMode("complete")``: the aggregate has at most m/32 groups,
    so the per-trigger emission is the whole (tiny) refreshed bloom.

    Drained-batch equality: running this on a stream split across any
    micro-batch boundaries must produce bit-for-bit the batch
    ``bloom_build`` of the union — asserted in
    tests/test_streaming_membership.py."""
    return bloom_build(
        items, item_col, m_bits, k_hashes, distinct_items=False
    )

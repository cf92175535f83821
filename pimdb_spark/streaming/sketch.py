"""Streaming count-min-sketch maintenance — the continuous twin of
operators/sketch.cms_build, completing the sketch-twin trio:

- bloom (streaming/membership.py): bit_or state, idempotent — replay-safe;
- Gram  (streaming/linalg.py): integer sums, exactly-once source required;
- CMS   (this module): integer sums like the Gram — the live frequency
  sketch behind continuous heavy-hitter candidate generation and
  rate-anomaly monitors.

State is hard-bounded at d x w counter cells regardless of item volume;
complete-mode output per trigger is the whole refreshed sketch.  Sums
are associative/commutative but NOT idempotent, so replays double-count
— the standard exactly-once-source contract, same as any streaming SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pimdb_spark.operators.sketch import cms_build


def cms_stream(
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """The continuously-maintained (row, col, cnt) counter frame over a
    streaming (or batch — same plan) item source.  Use with
    ``outputMode("complete")``: at most d x w groups.

    Drained-batch equality across micro-batch splits is asserted in
    tests/test_streaming_sketch.py."""
    return cms_build(items, item_col, width, depth, weight_col)


def hll_registers_stream(items: DataFrame, item_col: str) -> DataFrame:
    """The continuously-maintained HyperLogLog register frame over a
    streaming (or batch — same plan) item source — live cardinality
    tracking with 64 rows of state.  MAX registers are idempotent like
    the bloom's OR: duplicate arrivals and replays cannot change the
    sketch, so NO exactly-once-source requirement (unlike cms_stream's
    sums).  Use with ``outputMode("complete")``; feed the emitted frame
    to operators/sketch.hll_estimate for the live estimate.

    Drained-batch equality across micro-batch splits is asserted in
    tests/test_streaming_sketch.py."""
    from pimdb_spark.operators.sketch import hll_registers

    return hll_registers(items, item_col)


def eh_stream(items: DataFrame, value_col: str, sub_bits: int = 3) -> DataFrame:
    """The continuously-maintained exponential-histogram bucket frame
    over a streaming (or batch — same plan) positive-value source —
    live quantile tracking with <= 64 x 2^sub_bits rows of state.
    Counts are SUMS like the CMS (associative/commutative, NOT
    idempotent): replays double-count, so the exactly-once-source
    contract applies — the cms_stream contract, not the bloom/HLL one.
    Use with ``outputMode("complete")``; feed the emitted frame to
    operators/sketch.eh_quantiles for live percentiles.

    Drained-batch equality across micro-batch splits is asserted in
    tests/test_streaming_sketch.py."""
    from pimdb_spark.operators.sketch import eh_buckets

    return eh_buckets(items, value_col, sub_bits)

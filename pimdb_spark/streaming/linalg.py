"""Streaming Gram/scatter-matrix maintenance — the continuous twin of
operators/linalg.gram_matrix_int8: keep the dim x dim second-moment
aggregate of an embedding stream up to date, the statistic behind
embedding-drift monitoring (compare the live Gram against a reference
window's) and periodically-refreshed PCA/whitening without historical
recomputes.

Why it streams cleanly: every cell is a SUM of exact integers (int8 code
products), and integer sums are associative and commutative — the
streaming state is exactly the batch result at every trigger, and the
aggregate has a HARD bound of dim*(dim+1)/2 groups (2,080 at dim=64)
regardless of how many vectors ever arrived.  Complete-mode output per
trigger is therefore one small bounded frame: the refreshed matrix.

Difference from the bloom twin (streaming/membership.py): bit_or is also
idempotent, so the bloom tolerates replays; integer sums are NOT — a
replayed micro-batch double-counts.  That is the standard
exactly-once-source requirement for any streaming SUM (counts, revenue,
this matrix alike), provided by Spark's checkpointed file/Kafka sources;
documented here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pimdb_spark.operators.linalg import gram_matrix_int8


def gram_matrix_stream(
    vectors: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """The continuously-maintained (i, j, gram) upper-triangle frame over
    a streaming (or batch — same plan) vector source.  Use with
    ``outputMode("complete")``: at most dim*(dim+1)/2 groups, so each
    trigger emits the whole refreshed matrix.

    Drained-batch equality across micro-batch splits is asserted in
    tests/test_streaming_linalg.py."""
    return gram_matrix_int8(vectors, vec_col=vec_col, dim=dim)

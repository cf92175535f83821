"""Table profiling: per-column data-quality statistics in ONE pass — the
ingest-gate check a training-data pipeline runs on every new snapshot
(null explosions, cardinality collapses, and range drift are the three
classic upstream-breakage signals).

Reference parity: none (beyond-parity tooling).

Scale design: a single full-scan aggregate computes every column's stats
as one wide row (partial aggregation does the heavy lifting; no shuffle
of data rows, only of per-partition partial states), then ``stack``
pivots the wide row into one tidy row per column — the pivot runs on ONE
row, so the per-column layout costs nothing.  Exact distinct counts add
one aggregate buffer per column; swap in approx_count_distinct for
thousands-of-columns tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct, min_value,
    max_value) with min/max rendered as strings so heterogeneous column
    types stack into one tidy frame.  exact_distinct=False uses HLL
    (approx_count_distinct) — constant memory per column at any scale."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            distinct.alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__null`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_null, n_distinct, min_value, max_value)"
        )
    )

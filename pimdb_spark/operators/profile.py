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

from pyspark.sql import DataFrame, Window
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


def heavy_hitters(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Top-k keys by exact frequency with their share of all rows —
    the skew diagnostic that decides whether a join/agg on this key needs
    salting (operators/skew.py) before it runs at scale.  Returns
    (key, cnt, share, rank) in a deterministic total order (cnt desc, key
    asc).

    Scale: one partial-aggregated count shuffle carrying (key, count)
    pairs, then TakeOrderedAndProject for the top-k — the full key
    distribution never lands on one node.  The row total rides a one-row
    broadcast; share = cnt/total is a single IEEE division of two exact
    integers, bit-identical everywhere."""
    counts = (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    topk = (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return topk.select(
        "key",
        "cnt",
        (F.col("cnt").cast("double") / F.col("_total")).alias("share"),
        F.row_number().over(w).alias("rank"),
    )


def numeric_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Equi-width histogram over [lo, hi): (bin, bin_lo, bin_hi, cnt)
    with out-of-range values clamped into the edge bins (so every row is
    counted and range drift shows up as mass piling into bin 0 or
    nbins-1).  Empty bins are emitted with cnt=0 — downstream charting
    and drift-diff logic needs the full grid.

    Scale: the bin index is a projection; one partial-aggregated count
    shuffle of at most nbins groups; the dense grid comes from a
    sequence-explode of nbins rows joined to the counts (broadcast-sized
    by construction)."""
    width = (hi - lo) / nbins
    x = F.col(value_col).cast("double")
    bin_ = F.greatest(
        F.lit(0),
        F.least(F.lit(nbins - 1), F.floor((x - F.lit(lo)) / F.lit(width))),
    ).cast("bigint")
    counts = (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = (
        df.sparkSession.range(nbins)
        .select(F.col("id").alias("bin"))
    )
    return (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def robust_outliers(
    df: DataFrame, group_col: str, value_col: str, n_mads: float = 3.0
) -> DataFrame:
    """Per-group robust outlier summary via median / MAD (median absolute
    deviation): (group, n, median, mad, n_outliers) where an outlier is
    |x - median| > n_mads * MAD.  Median/MAD resist the very outliers
    they are hunting, where mean/stddev do not — this is the standard
    gate for metric columns with heavy tails (latencies, prices, doc
    lengths).

    Both medians are the DISCRETE lower median (the element at 1-indexed
    ceil(n/2) in sort order) — an actual data value, engine-exact, where
    interpolated medians average two doubles and invite cross-engine
    rounding drift.

    Scale: two window/aggregate passes, both hash-partitioned on the
    group key (Spark reuses the partitioning across them — one exchange
    feeds median, deviation, and the final rollup); no driver collect;
    per-group work is a sort bounded by the group size."""
    wg = Window.partitionBy(group_col)
    w_val = wg.orderBy(F.col(value_col))
    with_med = (
        df.select(group_col, value_col)
        .withColumn("_rn", F.row_number().over(w_val))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn(
            "_med",
            F.max(
                F.when(F.col("_rn") == F.floor((F.col("_n") + 1) / 2), F.col(value_col))
            ).over(wg),
        )
    )
    dev = with_med.withColumn("_dev", F.abs(F.col(value_col) - F.col("_med")))
    w_dev = wg.orderBy(F.col("_dev"))
    with_mad = (
        dev.withColumn("_rn2", F.row_number().over(w_dev))
        .withColumn(
            "_mad",
            F.max(
                F.when(F.col("_rn2") == F.floor((F.col("_n") + 1) / 2), F.col("_dev"))
            ).over(wg),
        )
    )
    return (
        with_mad.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("_med").alias("median"),
            F.max("_mad").alias("mad"),
            F.sum(
                F.when(F.col("_dev") > F.lit(n_mads) * F.col("_mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def validate_constraints(
    df: DataFrame, rules: list[tuple[str, "F.Column", str]]
) -> DataFrame:
    """Declarative data-quality gate: evaluate a rule list in ONE scan.

    ``rules`` is [(rule_id, violation_predicate_column, description)] —
    each predicate marks a VIOLATING row.  Output is one row per rule:
    (rule_id, description, n_violations, passed).  All counts are
    conditional sums in a single aggregate, so the gate costs one
    pass + partial aggregation regardless of rule count — the
    expectation-suite shape (cf. batch ingest gates) without a second
    framework.

    Scale: one full scan, map-side combine, a one-row reduce; rule
    predicates are JVM expressions (no Python)."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(rid)
        for rid, pred, _desc in rules
    ]
    row = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(rid).alias("rule_id"),
                F.lit(desc).alias("description"),
                F.col(rid).alias("n_violations"),
                (F.col(rid) == 0).alias("passed"),
            )
            for rid, _pred, desc in rules
        ]
    )
    return row.select(F.explode(per_rule).alias("r")).select("r.*")


def group_auc(
    df: DataFrame,
    group_col: str,
    label_col,
    score_col,
) -> DataFrame:
    """Exact per-group ROC AUC via the rank-sum (Mann-Whitney U)
    identity: AUC = (Σ ranks of positives - n_pos(n_pos+1)/2) /
    (n_pos · n_neg), with AVERAGE ranks for tied scores — the standard
    tie convention, equivalently counting ties as half-wins.  The
    offline-eval gate of a training pipeline (per-domain / per-slice
    model quality) computed exactly, no sampling, no trapezoids.

    ``label_col`` is a boolean column/expression (positive class);
    ``score_col`` a numeric expression.  Groups with zero positives or
    zero negatives emit NULL auc (undefined), keeping the row auditable.

    Exactness: ranks are integers, average ranks half-integers; their
    sums are exact in double at any realistic group size (multiples of
    0.5 below 2^52), so the sum is independent of partial-aggregation
    order and ONE final division makes the value engine-exact.

    Scale: one hash exchange on the group key feeds both rank windows
    (rank + tie count share the sort) and the final aggregation; state
    is O(1) per group."""
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    base = df.select(
        F.col(group_col).alias("grp"), lbl.alias("pos"), sc.alias("score")
    )
    w_rank = Window.partitionBy("grp").orderBy("score")
    w_tie = Window.partitionBy("grp", "score")
    ranked = base.select(
        "grp",
        "pos",
        # average rank of a tie bucket = first rank + (bucket size - 1)/2
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("arank"),
    )
    agg = ranked.groupBy("grp").agg(
        F.sum(F.when(F.col("pos"), F.col("arank"))).alias("rank_sum"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast("bigint").alias("n_neg"),
    )
    u = F.col("rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0)
    return agg.select(
        F.col("grp").alias(group_col),
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u / (F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    label_col,
    score_col,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Reliability-diagram bins: scores clamped into ``n_bins`` equal-width
    bins over [lo, hi) (same clamp-and-dense-grid discipline as
    numeric_histogram — empty bins are emitted, outliers land in the edge
    bins), each bin reporting its count, positive count, and exact
    positive rate.  Together with group_auc this is the offline
    model-eval pair: AUC ranks, calibration checks the probabilities.

    Output: (bin, bin_lo, bin_hi, n, n_pos, pos_rate) — bin edges are
    exact float arithmetic shared with the oracle; pos_rate is one IEEE
    division of exact integers (NULL for empty bins).

    Scale: one scan with map-side combine into <= n_bins groups, then a
    broadcast-side dense-grid left join to emit empty bins."""
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    width = (hi - lo) / n_bins
    clamped = F.least(F.greatest(sc, F.lit(lo)), F.lit(hi))
    b = F.least(
        F.floor((clamped - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_bins - 1),
    )
    agg = (
        df.select(b.alias("bin"), lbl.cast("int").alias("pos"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
    )
    spark = df.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        grid.join(F.broadcast(agg), "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.coalesce(F.col("n_pos"), F.lit(0)).cast("bigint").alias("n_pos"),
            F.when(
                F.col("n").isNotNull(),
                F.col("n_pos").cast("double") / F.col("n"),
            ).alias("pos_rate"),
        )
    )

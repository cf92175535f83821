"""Event-log analytics operators: cohort retention, last-touch and
linear multi-touch conversion attribution, top session paths, and
ordered funnel analysis.

These are the product-analytics queries every event warehouse runs daily
(cohort matrices, attribution joins, path mining) expressed as single-pass
DataFrame plans.  Reference parity: none — beyond-parity operators in the
same family as catalog_temporal.py's windowed aggregation/sessionization
(all event-time math stays integer arithmetic on epoch microseconds, so a
DuckDB oracle reproduces every value bit-for-bit).

Scale notes per operator are in the docstrings; the common discipline:
every window and aggregation partitions on user_id (or a key prefixed by
it), so ONE hash exchange on the user key feeds each operator's whole
chain, and nothing ever collects event rows to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_US = 7 * 24 * 3_600_000_000


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = WEEK_US,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of their
    first event; each (cohort, offset) cell counts how many of them were
    active `offset` periods later, plus the retention ratio.

    Output: (cohort_period, period_offset, n_active, cohort_size,
    retention) — periods are integer indexes (epoch_us DIV period_us), the
    ratio is ONE IEEE division of exact integers, so the whole result is
    engine-exact.

    Scale: activity reduces to distinct (user, period) and the cohort to
    min(period) per user — both partial-aggregated before their shuffle;
    the join back is keyed on user_id (co-partitioned with the cohort
    agg), and the final matrix groupBy is O(periods²) groups.  The
    cohort-size attach is a broadcast join on an O(periods)-row frame.
    No step is ever proportional to raw event rows after the first
    distinct."""
    ts = F.col(ts_col)
    # True FLOOR division via pmod (column API, no SQL-string splicing, so
    # exotic column names need no backtick quoting): pmod is always
    # non-negative, so negative epoch timestamps land in their correct
    # (negative) period instead of DIV's double-width truncate-toward-zero
    # period 0.  The double division is exact: the numerator is an exact
    # multiple of period_us and epoch-micros magnitudes (< 2^53 until year
    # ~2255) are exactly representable.
    period = ((ts - F.pmod(ts, F.lit(period_us))) / F.lit(period_us)).cast("long")
    activity = (
        events.select(F.col(user_col).alias("user"), period.alias("period"))
        .distinct()
    )
    cohorts = activity.groupBy("user").agg(F.min("period").alias("cohort_period"))
    cells = (
        activity.join(cohorts, "user")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.countDistinct("user").alias("n_active"))
    )
    sizes = cohorts.groupBy("cohort_period").agg(
        F.countDistinct("user").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_period")
        .withColumn(
            "retention", F.col("n_active").cast("double") / F.col("cohort_size")
        )
        .select(
            "cohort_period", "period_offset", "n_active", "cohort_size", "retention"
        )
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    horizon_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch attribution: every conversion event is attributed to the
    most recent STRICTLY PRECEDING touch event (same user) within
    `horizon_us`; conversions with no in-horizon touch keep NULL
    attribution columns, so the row count equals the conversion count
    (auditable).

    The carried touch is a single struct, so (event_id, type, ts) always
    come from the SAME touch row; ordering ties on ts are broken by
    event_id, making the winner deterministic on every engine.  "Strictly
    preceding" means earlier in (ts, event_id) order with the current row
    EXCLUDED (frame ends at -1 row): a conversion can never attribute to
    itself even when `conversion_type` also appears in `touch_types`, and
    a same-timestamp touch counts only when its event_id is smaller —
    the documented tie rule.

    Scale: one window exchange on user_id over a pre-projected
    (user, ts, id, type) frame — the carry-forward is O(rows) with no
    join; output is filtered to conversions before anything else runs."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("typ"),
        ),
    )
    carried = events.withColumn("_lt", F.last(touch, ignorenulls=True).over(w))
    in_horizon = F.col("_lt").isNotNull() & (
        F.col("_lt.ts") >= F.col(ts_col) - F.lit(horizon_us)
    )
    return (
        carried.filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("conv_ts_us"),
            F.when(in_horizon, F.col("_lt.id")).alias("touch_event_id"),
            F.when(in_horizon, F.col("_lt.typ")).alias("touch_type"),
            F.when(in_horizon, F.col(ts_col) - F.col("_lt.ts")).alias("age_us"),
        )
    )


def session_paths(
    events: DataFrame,
    gap_us: int,
    k: int,
    path_len: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-k session opening paths: sessions are gap-based (same rule as
    catalog_temporal.q_sessionize), each session is summarized by its
    first `path_len` event types joined with '>', and paths are ranked by
    how many sessions open that way.

    Output: (path, n_sessions), ordered n_sessions DESC then path — fully
    deterministic (ties break on the path string).

    Scale: the session flags, the running session id, and the in-session
    row_number all partition by user_id (the session groupBy key is
    user-prefixed, so the SAME exchange satisfies it); only the final
    path count shuffles, on at most |types|^path_len groups, finished by
    TakeOrderedAndProject."""
    w_order = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    w_run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = events.withColumn("_prev", F.lag(ts_col).over(w_order)).withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull() | (F.col(ts_col) - F.col("_prev") > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("_sid", F.sum("_new").over(w_run))
    w_in = Window.partitionBy(user_col, "_sid").orderBy(ts_col, id_col)
    heads = sess.withColumn("_rn", F.row_number().over(w_in)).filter(
        F.col("_rn") <= path_len
    )
    paths = heads.groupBy(user_col, "_sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(ts_col, id_col, F.col(type_col).alias("t")))
                ),
                lambda s: s["t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest timestamp at
    which each step of ``steps`` completes IN ORDER — t_k is the minimum
    event time of step k STRICTLY AFTER t_{k-1} (earliest-first
    semantics, the standard product-funnel definition).  A user who never
    reaches step k has NULL from t_k on.  Output: one row per user with
    (user, t_1..t_n, steps_reached).

    All comparisons are integer epoch-microsecond arithmetic — every
    output value is engine-exact.

    Scale: one aggregation per step, every one keyed on user_id, so a
    single hash partitioning serves the whole chain (each round is a
    co-partitioned join + groupBy on the same key; AQE reuses the
    exchange).  State between rounds is one row per user.  Step count is
    a plan-size multiplier, not a data multiplier."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("typ"),
    )
    cur = ev.groupBy("user").agg(
        F.min(F.when(F.col("typ") == steps[0], F.col("ts"))).alias("t1")
    )
    for k in range(2, len(steps) + 1):
        prev = f"t{k - 1}"
        carried = [F.max(f"t{j}").alias(f"t{j}") for j in range(1, k)]
        cur = (
            ev.join(cur, "user")
            .groupBy("user")
            .agg(
                *carried,
                F.min(
                    F.when(
                        (F.col("typ") == steps[k - 1])
                        & (F.col(prev).isNotNull())
                        & (F.col("ts") > F.col(prev)),
                        F.col("ts"),
                    )
                ).alias(f"t{k}"),
            )
        )
    reached = F.lit(0)
    for k in range(1, len(steps) + 1):
        reached = reached + F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)
    return cur.select(
        F.col("user").alias(user_col),
        *[F.col(f"t{k}") for k in range(1, len(steps) + 1)],
        reached.cast("int").alias("steps_reached"),
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    horizon_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Linear (multi-touch) attribution: every conversion splits its
    credit EQUALLY across all strictly-preceding same-user touches within
    ``horizon_us`` — weight 1/n per touch, so each conversion's credit
    sums to exactly 1.  Conversions with no in-horizon touch emit one
    NULL-touch row (weight NULL), keeping the conversion count auditable.
    "Strictly preceding" is the last-touch rule: earlier in
    (ts, event_id) order.

    Output: (conversion_id, user_id, conv_ts_us, touch_event_id,
    touch_type, age_us, n_touches, weight).  The weight is one IEEE
    division of exact integers — engine-exact.

    Scale: candidates come from an EQUI-join on (user, horizon-width
    time bucket) — each conversion probes its own and the previous
    bucket (a touch within the horizon can span at most two), the
    neighbor-bucket discipline of operators/asof.range_join_pairs; no
    per-user all-pairs, no unbounded window state.  The per-conversion
    count rides one window keyed by conversion id."""
    ts = F.col(ts_col)
    bkt = ((ts - F.pmod(ts, F.lit(horizon_us))) / F.lit(horizon_us)).cast("long")
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("conversion_id"),
        ts.alias("conv_ts"),
        bkt.alias("_cb"),
    )
    probes = conv.select(
        "user",
        "conversion_id",
        "conv_ts",
        F.explode(F.array(F.col("_cb"), F.col("_cb") - 1)).alias("_bkt"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("touch_event_id"),
        ts.alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
        bkt.alias("_bkt"),
    )
    strictly_before = (F.col("touch_ts") < F.col("conv_ts")) | (
        (F.col("touch_ts") == F.col("conv_ts"))
        & (F.col("touch_event_id") < F.col("conversion_id"))
    )
    pairs = (
        probes.join(touch, ["user", "_bkt"])
        .filter(F.col("touch_ts") >= F.col("conv_ts") - F.lit(horizon_us))
        .filter(strictly_before)
    )
    w = Window.partitionBy("conversion_id")
    matched = pairs.select(
        "conversion_id",
        F.col("user").alias(user_col),
        F.col("conv_ts").alias("conv_ts_us"),
        "touch_event_id",
        "touch_type",
        (F.col("conv_ts") - F.col("touch_ts")).alias("age_us"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_touches"),
    ).withColumn("weight", F.lit(1.0) / F.col("n_touches"))
    unmatched = (
        conv.join(
            pairs.select("conversion_id").distinct(), "conversion_id", "left_anti"
        )
        .select(
            "conversion_id",
            F.col("user").alias(user_col),
            F.col("conv_ts").alias("conv_ts_us"),
            F.lit(None).cast("long").alias("touch_event_id"),
            F.lit(None).cast("string").alias("touch_type"),
            F.lit(None).cast("long").alias("age_us"),
            F.lit(0).cast("bigint").alias("n_touches"),
            F.lit(None).cast("double").alias("weight"),
        )
    )
    return matched.unionByName(unmatched)

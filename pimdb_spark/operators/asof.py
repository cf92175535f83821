"""As-of join and range join — operators the reference (and stock Spark)
lack, composed from existing DataFrame primitives so Catalyst can plan
them (SURVEY §2 'custom operators' guidance: composition before UDFs).

As-of join (union + carry-forward):
  Tag right rows side=0 and left rows side=1, union them, and per key take
  last(right_value, ignorenulls) over (ORDER BY time, side ROWS UNBOUNDED
  PRECEDING).  Each left row then carries the greatest right row with
  right.time <= left.time — exactly ASOF JOIN semantics — in ONE shuffle
  on the key, with no per-key quadratic blowup and no range condition in
  a join (which Spark would plan as a broadcast nested loop).

Range join (bucketize + neighbor explode):
  |t_a - t_b| <= R on the same key becomes an equi-join on
  (key, bucket) after exploding each row to its bucket and the two
  neighbors, followed by the exact range filter.  Candidate pairs are
  O(rows x density) instead of O(rows^2) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    right_time <= left_time within the same `on` key (NULLs if none).
    Output: all left columns + right_value_cols (+ matched right time as
    `asof_time`)."""
    lcols = left.columns
    l_tag = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_r_time"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        F.col(right_time).alias("_r_time"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
        F.last("_r_time", ignorenulls=True).over(w).alias("asof_time"),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(on),
        F.col("_t").alias(left_time),
        *[F.col(c) for c in lcols if c not in (on, left_time)],
        *[F.col(f"asof_{c}") for c in right_value_cols],
        "asof_time",
    )


def range_join_pairs(
    df: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    radius: int,
) -> DataFrame:
    """Pairs (id_a < id_b) of rows sharing `key` with
    |time_a - time_b| <= radius (integer time units).
    Scale: equi-join on (key, bucket) after neighbor-bucket explode."""
    # integer division, not float-divide-and-cast: epoch-microsecond times
    # exceed double's 2^53 exact range, and a 1-ulp misround at a bucket
    # boundary on ONE side would silently drop a qualifying pair
    bucket = F.expr(f"`{time_col}` div {int(radius)}")
    a = df.select(
        F.col(key),
        F.col(id_col).alias("id_a"),
        F.col(time_col).alias("t_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bucket"),
    )
    b = df.select(
        F.col(key),
        F.col(id_col).alias("id_b"),
        F.col(time_col).alias("t_b"),
        bucket.alias("bucket"),
    )
    # no distinct needed: b carries exactly one bucket and a's three
    # exploded buckets are distinct, so each qualifying pair joins once
    return (
        a.join(b, [key, "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= radius)
        )
        .select(key, "id_a", "id_b", "t_a", "t_b")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_cols: tuple[str, str],
    r_cols: tuple[str, str],
    grid: int,
) -> DataFrame:
    """Overlap join of two interval sets sharing `key`: every (L, R) pair
    with L.start <= R.end AND R.start <= L.end — the temporal join for
    validity windows (sessions x promotions, observations x outages).

    Scale: each interval explodes onto the grid cells it touches
    (``sequence(start div grid, end div grid)``), the join is a hash
    equi-join on (key, cell), and each qualifying pair is attributed to
    exactly ONE cell — the later of the two start cells — so no distinct
    pass is needed.  Pick ``grid`` near the typical interval length:
    cells per interval ~= length/grid + 1 bounds the explode factor,
    cells much smaller than intervals inflate the explode, cells much
    larger inflate candidates per cell.  Integer division throughout
    (epoch micros exceed double's 2^53 exact range)."""
    ls, le = l_cols
    rs, re_ = r_cols
    g = int(grid)
    l_first = F.expr(f"`{ls}` div {g}")
    r_first = F.expr(f"`{rs}` div {g}")
    a = left.withColumn("_cell", F.explode(F.sequence(l_first, F.expr(f"`{le}` div {g}"))))
    b = right.withColumn("_cell", F.explode(F.sequence(r_first, F.expr(f"`{re_}` div {g}"))))
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    once = F.col("_cell") == F.greatest(l_first, r_first)
    return a.join(b, [key, "_cell"]).filter(overlap & once).drop("_cell")

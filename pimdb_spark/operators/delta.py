"""Snapshot maintenance operators: diff (CDC-style change detection) and
merge (upsert) between two versions of a keyed table.

The reference keeps a local copy of upstream datasets and refreshes it by
re-downloading and re-transferring whole snapshots (pimdb/common.py:155-180
download-if-newer; pimdb/database.py:524-566 truncate-and-reload).  At
100 TB a full reload is off the table; these operators give the
incremental path: diff the new snapshot against the current table, or
merge an update set into it — each a single-shuffle DataFrame plan.

Design for 100 TB:
- diff compares an md5 row-digest, not the row: the full-outer join
  carries (key, 32-byte digest) per side; wide payload columns stay in
  the scan and never shuffle twice.  On partitioned tables, pruning
  restricts both scans to the partitions that can have changed.
- merge is updates ⊎ (base ⟕̸ updates): one anti-join shuffle on the key
  (broadcast when the update set is small — the common case for
  incremental refresh).
- both are deterministic: no timestamps, no RNG, digest arithmetic is
  engine-stable md5.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Unit-separator joint: columns can't contain \x1f in our data model; a NULL
# marker distinct from the empty string keeps NULL != '' in the digest.
_SEP = "\x1f"
_NULL = "\x00N"


def row_digest(cols: Sequence[str]) -> F.Column:
    """md5 digest of the row's compare-columns (NULL-safe, order-fixed).
    Engine-stable: DuckDB spells it
    ``md5(concat_ws(chr(31), coalesce(CAST(c AS VARCHAR), chr(0)||'N'), …))``."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """(key…, status) for every key whose row was added, removed, or
    changed between snapshots; unchanged keys are dropped.  The full-outer
    join runs on (key, digest) projections only."""
    o = old.select(*key_cols, row_digest(compare_cols).alias("_dig_old"))
    n = new.select(*key_cols, row_digest(compare_cols).alias("_dig_new"))
    joined = o.join(n, list(key_cols), "full_outer")
    status = (
        F.when(F.col("_dig_old").isNull(), "added")
        .when(F.col("_dig_new").isNull(), "removed")
        .when(F.col("_dig_old") != F.col("_dig_new"), "changed")
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )


def snapshot_merge(
    base: DataFrame, updates: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Upsert: every key in `updates` takes its updated row; all other base
    rows pass through (updates ∪ base-anti-join-updates).  Column set and
    order follow `base`.  Broadcast `updates` upstream when it is small."""
    cols = base.columns
    keep = base.join(updates.select(*key_cols), list(key_cols), "left_anti")
    return updates.select(*cols).unionByName(keep)


def scd2_intervals(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a stack of versioned
    snapshots: one row per (key, run of consecutive versions with
    identical compare_cols values), carrying ``valid_from`` (first
    version of the run), ``valid_to`` (first version of the NEXT run,
    NULL while current — the half-open [from, to) convention), the run's
    attribute values, and ``n_versions`` (snapshots the run spanned).
    This is how a training-data pipeline materializes point-in-time
    reproducibility from periodic snapshot dumps.

    Change detection is eqNullSafe against the per-key previous version
    (NULL-safe: NULL→value and value→NULL both open a new run); runs are
    numbered by a running sum of change flags.  Scale: ONE shuffle on the
    key — both windows and the groupBy share the same partitioning, so
    Spark reuses the exchange."""
    w = Window.partitionBy(*key_cols).orderBy(version_col)
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    run_id = F.sum(F.when(changed, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = snapshots.withColumn("_run", run_id)
    grouped = runs.groupBy(*key_cols, "_run").agg(
        F.min(version_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_versions"),
        *[F.min(c).alias(c) for c in compare_cols],  # constant within a run
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    return grouped.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    ).select(*key_cols, "valid_from", "valid_to", "n_versions", *compare_cols)

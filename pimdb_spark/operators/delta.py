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

from pyspark.sql import DataFrame
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

"""Snapshot-maintenance catalog (operators/delta.py): CDC-style diff and
upsert merge, exercised on a deterministic synthetic "new snapshot" of the
orders table (changed / removed / added rows derived by key arithmetic so
both engines construct the identical scenario).

The oracle verifies SEMANTICS, not implementation: the Spark side detects
changes via md5 row-digests (so only (key, digest) pairs shuffle); the
DuckDB side compares column values directly with IS DISTINCT FROM.  The
two agree iff the digest is change-faithful (distinct doubles stringify
distinctly; NULL is digest-distinct from every value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register
from pimdb_spark.operators import delta as D

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

# new snapshot, derived from orders by key arithmetic:
#   keys %10==0  -> price bumped (+1.0, exact in ieee754)   => changed
#   keys %97==3  -> dropped                                  => removed
#   keys %200==0 -> re-inserted under key + (1+max key)      => added
# The re-insert offset is DERIVED as 1 + max(o_orderkey) — a one-row
# broadcast on the Spark side, a scalar subquery in the oracle — so the
# planted "added" keys are collision-free on ANY key range (the
# q_embedding_dup_pairs / q_cross_neardup_filter form; the r13 literal
# +10,000,000 fixture-assumption is retired, r15 verdict item 3).
_NEW_SNAP_SQL = """
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 3
      UNION ALL
      SELECT o_orderkey + (SELECT 1 + max(o_orderkey) FROM orders)
                 AS o_orderkey,
             o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 200 = 0
"""


def _old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(*_COLS)


def _key_offset(o: DataFrame) -> DataFrame:
    """1 + max(o_orderkey) as a one-row frame (broadcast-attached, never
    collected to the driver)."""
    return o.agg((F.lit(1) + F.max("o_orderkey")).alias("_o"))


def _new_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _old(spark, sf_dir)
    kept = o.filter(F.col("o_orderkey") % 97 != 3).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    added = (
        o.filter(F.col("o_orderkey") % 200 == 0)
        .crossJoin(F.broadcast(_key_offset(o)))
        .select(
            (F.col("o_orderkey") + F.col("_o")).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )
    return kept.unionByName(added)


@register(
    "q_snapshot_diff",
    oracle=f"""
    WITH new_snap AS ({_NEW_SNAP_SQL})
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN (o.o_totalprice   IS DISTINCT FROM n.o_totalprice)
                  OR (o.o_orderstatus  IS DISTINCT FROM n.o_orderstatus)
                  OR (o.o_custkey      IS DISTINCT FROM n.o_custkey)
                THEN 'changed' END AS status
    FROM orders o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    WHERE coalesce(o.o_orderkey, n.o_orderkey) IS NOT NULL
      AND (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR (o.o_totalprice  IS DISTINCT FROM n.o_totalprice)
           OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
           OR (o.o_custkey     IS DISTINCT FROM n.o_custkey))
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff of two snapshots (operators/delta.snapshot_diff): every
    key classified added/removed/changed via md5 row-digest comparison;
    unchanged keys never leave the join.

    Scale: the full-outer join shuffles (key, 32-byte digest) only — the
    row payload stays in the scans; on partitioned tables both sides
    prune to partitions that can differ."""
    old = _old(spark, sf_dir)
    new = _new_snapshot(spark, sf_dir)
    return D.snapshot_diff(
        old, new, ["o_orderkey"], ["o_custkey", "o_orderstatus", "o_totalprice"]
    )


@register(
    "q_snapshot_merge",
    oracle=f"""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + (SELECT 1 + max(o_orderkey) FROM orders)
                 AS o_orderkey,
             o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 200 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM upd
    UNION ALL
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
    """,
)
def q_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert merge (operators/delta.snapshot_merge): an update set
    (changed prices + brand-new keys) overrides the base table; untouched
    rows pass through.  Emits the full merged table — the driver hashes
    every row, so the whole upsert semantics is value-checked.

    The brand-new-key offset is DERIVED as 1 + max(o_orderkey) (one-row
    broadcast attach; scalar subquery in the oracle) — collision-free on
    any key range, the last literal id offset in the catalog retired
    (r15 verdict item 3).

    Scale: one anti-join shuffle on the key; with a small update set the
    anti join broadcasts and the merge is shuffle-free."""
    base = _old(spark, sf_dir)
    changed = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
    )
    added = (
        base.filter(F.col("o_orderkey") % 200 == 0)
        .crossJoin(F.broadcast(_key_offset(base)))
        .select(
            (F.col("o_orderkey") + F.col("_o")).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )
    updates = changed.unionByName(added)
    return D.snapshot_merge(base, updates, ["o_orderkey"])


_VERSIONS_SQL = """
      SELECT 1 AS version, o_orderkey, o_orderstatus, o_totalprice FROM orders
      UNION ALL
      SELECT 2 AS version, o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      UNION ALL
      SELECT 3 AS version, o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'Z' ELSE o_orderstatus END
                 AS o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
"""


@register(
    "q_scd2_intervals",
    oracle=f"""
    WITH snaps AS ({_VERSIONS_SQL}),
    flagged AS (
      SELECT *,
             CASE WHEN (o_orderstatus IS DISTINCT FROM
                        lag(o_orderstatus) OVER w)
                    OR (o_totalprice IS DISTINCT FROM
                        lag(o_totalprice) OVER w)
                  THEN 1 ELSE 0 END AS chg
      FROM snaps
      WINDOW w AS (PARTITION BY o_orderkey ORDER BY version)
    ), runs AS (
      SELECT *, sum(chg) OVER (PARTITION BY o_orderkey ORDER BY version
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM flagged
    ), grouped AS (
      SELECT o_orderkey, run,
             min(version) AS valid_from,
             count(*) AS n_versions,
             min(o_orderstatus) AS o_orderstatus,
             min(o_totalprice) AS o_totalprice
      FROM runs GROUP BY o_orderkey, run
    )
    SELECT o_orderkey, valid_from,
           lead(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
               AS valid_to,
           CAST(n_versions AS BIGINT) AS n_versions,
           o_orderstatus, o_totalprice
    FROM grouped
    """,
    bench=True,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history materialization (operators/delta.scd2_intervals) over
    three synthetic snapshot versions of orders (v2 bumps every 10th
    key's price, v3 flips every 7th key's status — both engines construct
    the identical stack by key arithmetic).  Each key yields one row per
    run of versions with unchanged attributes, with half-open
    [valid_from, valid_to) validity.

    Scale: the three-version union is a narrow scan; then ONE shuffle on
    o_orderkey serves both windows and the run groupBy."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2_price = F.when(
        F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1
    ).otherwise(F.col("o_totalprice"))
    v3_status = F.when(F.col("o_orderkey") % 7 == 0, F.lit("Z")).otherwise(
        F.col("o_orderstatus")
    )
    snaps = (
        o.select(F.lit(1).alias("version"), "o_orderkey", "o_orderstatus", "o_totalprice")
        .unionByName(
            o.select(
                F.lit(2).alias("version"),
                "o_orderkey",
                "o_orderstatus",
                v2_price.alias("o_totalprice"),
            )
        )
        .unionByName(
            o.select(
                F.lit(3).alias("version"),
                "o_orderkey",
                v3_status.alias("o_orderstatus"),
                v2_price.alias("o_totalprice"),
            )
        )
    )
    return D.scd2_intervals(
        snaps, ["o_orderkey"], "version", ["o_orderstatus", "o_totalprice"]
    )

"""Skew-resilient equi-join (salting).

AQE's skew-join splitting (on in session.py) handles most skew at runtime,
but it only works for sort-merge joins and after-the-fact; salting is the
declarative form that also composes with bucketing and streaming.  The
reference has no counterpart (its RDBMS handled physical join choice —
SURVEY §2.3/§4); this is part of the 100 TB scale surface.

How it works: the skewed (large, heavy-hitter-keyed) side gets a
deterministic salt in [0, n); the other side is replicated once per salt
value; the join runs on (key, salt).  A key that used to land on one
reducer now spreads over n of them.  Cost: other side shuffles n x its
size — choose the smaller side as ``other`` and n ~ the worst observed
key-skew multiple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed ⋈ other` on column(s) ``on``, spreading each join
    key of the skewed side over ``n_salts`` reducers.

    The salt is derived from a hash of the skewed side's whole row
    (xxhash64), so the plan stays deterministic — no rand(), results and
    oracle comparisons are reproducible.

    Only join types whose semantics survive replicating `other` are
    accepted: inner / left / left_semi / left_anti (an unmatched LEFT row
    surfaces once regardless of salt; a matched one pairs only with its
    own salt replicate).  right/full outer would emit every unmatched
    `other` row n_salts times — refused rather than silently wrong.
    """
    normalized = how.replace("_", "").replace("outer", "")
    if normalized not in ("inner", "left", "leftsemi", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the non-skewed side is "
            "replicated n_salts times, so right/full outer joins would emit "
            "unmatched rows once per salt. Use inner/left/left_semi/left_anti."
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn(SALT_COL, salt.cast("int"))
    right = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, keys + [SALT_COL], how).drop(SALT_COL)


def partial_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    heavy_threshold: int = 10_000,
) -> DataFrame:
    """Salted inner join that replicates `other` ONLY for heavy-hitter
    keys.  Full salting (salted_join) pays an n_salts-fold replication of
    the entire other side; here light keys join unsalted (salt 0 on both
    sides), and only keys whose skewed-side row count exceeds
    ``heavy_threshold`` fan out — so the replication cost is
    n_salts x |other rows with heavy keys|, which for real skew (a handful
    of flood keys) is near zero.

    The heavy-key set is an exact count over the skewed side's key column
    — one extra shuffle of (key) pairs, cheap relative to the join, and
    deterministic (no sampling) so plans and results are reproducible.
    The result is broadcast to tag both sides without another shuffle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    heavy = (
        skewed.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > heavy_threshold)
        .select(*keys, F.lit(True).alias("_heavy"))
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = (
        skewed.join(F.broadcast(heavy), keys, "left")
        .withColumn(
            SALT_COL,
            F.when(F.col("_heavy"), salt.cast("int")).otherwise(F.lit(0)),
        )
        .drop("_heavy")
    )
    salts_all = F.array(*[F.lit(i) for i in range(n_salts)])
    right = (
        other.join(F.broadcast(heavy), keys, "left")
        .withColumn(
            "_salts",
            F.when(F.col("_heavy"), salts_all).otherwise(F.array(F.lit(0))),
        )
        .withColumn(SALT_COL, F.explode("_salts"))
        .drop("_heavy", "_salts")
    )
    return left.join(right, keys + [SALT_COL], "inner").drop(SALT_COL)

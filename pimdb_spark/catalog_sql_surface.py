"""Advanced SQL-surface coverage (SURVEY §2.4/§2.8 'free extras'):
ROLLUP, GROUPING SETS-style multi-level aggregation, correlated/
uncorrelated subqueries (EXISTS / IN / scalar), and approximate distinct
counting — the capabilities the reference inherits from its backing RDBMS
and this engine inherits from Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-level aggregation: (flag, status), (flag), () levels in
    one pass.  Scale: Spark expands rollup into a single Expand + hash agg
    — one shuffle for all levels."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations in one pass."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("sum_price"),
    )


@register(
    "q_exists_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (TPC-H Q4/Q21 shape).  Catalyst
    rewrites these to left-semi / left-anti joins — both shuffle once on
    the correlation key."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        )
        """
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT l_partkey,
           count(*) AS n_small,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_small
    FROM lineitem
    WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem)
    GROUP BY l_partkey
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (TPC-H Q17 shape): the global average
    computes once and broadcasts as a literal into the filter.
    Note the threshold itself is a double avg — it only gates a < filter,
    and the gap between any l_quantity and the threshold is >> 1 ulp, so
    engine-order float differences cannot flip row membership."""
    for t in ("lineitem",):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT l_partkey,
               count(*) AS n_small,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_small
        FROM lineitem
        WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem)
        GROUP BY l_partkey
        """
    )


@register("q_approx_distinct", oracle=None)  # HLL sketches differ per engine
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group next to the exact
    count — rows-only check (sketch implementations differ across engines
    by design); tests assert the approximation error bound instead.
    Scale: HLL sketches merge associatively — constant memory per group
    versus the exact count's full distinct shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )

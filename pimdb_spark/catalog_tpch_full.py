"""The four TPC-H query shapes the catalog still lacked (Q2, Q11, Q12,
Q20), completing the 22-query suite (Q7 already exists as
q7_nation_volume; the rest live in catalog.py / catalog_sql_surface.py).
The testdata has no partsupp table and no
comment/shipmode/commitdate columns, so each query keeps its canonical
PLAN SHAPE (correlated min, nation-pair theta filter, group-threshold
HAVING with a scalar subquery, late-shipment CASE pivot, qty-share
semi-join) over the columns that exist — the same adaptation policy as
q16/q21/q22 (catalog_sql_surface.py).

Numeric parity follows the catalog.py policy: money aggregates in exact
DECIMAL cast to DOUBLE at the end; per-row doubles raw; thresholds
compared in the DECIMAL domain so boundary rows agree bit-for-bit with
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pimdb_spark.catalog import dec2, frac2, load, register, ts_lit


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT c.l_partkey, c.supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand, e.supplycost
    FROM part p JOIN eu e ON e.l_partkey = p.p_partkey
    WHERE p.p_type = 'LARGE'
      AND e.supplycost = (SELECT min(e2.supplycost) FROM eu e2
                          WHERE e2.l_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part via a correlated
    min subquery.  No partsupp table exists, so the (part, supplier) cost
    relation is derived from lineitem — supplycost := min observed unit
    price (l_extendedprice / l_quantity), a per-row double division that
    is bit-identical across engines; min() is pure selection, so the
    float equality against the regional minimum is exact.

    Spark-first: the correlated subquery is a window min over l_partkey
    AFTER the part filter joins in (p_partkey is unique, so filtering
    parts first removes whole partkey groups without changing any group's
    min) — one groupBy shuffle for the cost relation, one window shuffle
    on partkey, TakeOrderedAndProject for the ORDER BY+LIMIT.
    Region/nation broadcast; supplier and part are SF-scaling → stats/AQE
    decide their join strategy."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")

    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eu = (
        cost.join(s, cost.l_suppkey == s.s_suppkey)  # SF-scaling: stats decide
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.join(p, eu.l_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nval AS (
      SELECT l.l_partkey, sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_12', 'NATION_13')
      GROUP BY l.l_partkey)
    SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
    FROM nval
    WHERE value > (SELECT sum(value) * 0.001 FROM nval)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for two nations' suppliers, kept
    only where the part exceeds a fraction of the TOTAL value — the
    group-threshold HAVING with a scalar subquery.  partsupp is absent,
    so value := shipped revenue (exact DECIMAL) instead of
    supplycost*availqty; the threshold comparison stays entirely in the
    DECIMAL domain (sum and sum*0.001 are exact in both engines), so
    boundary parts agree bit-for-bit; only the output casts to DOUBLE.

    Scale: one groupBy(partkey) shuffle; the grand total is a ONE-ROW
    aggregate broadcast-attached to every part row (no pairing — the
    same sanctioned shape as q_token_df_idf/q_bm25_topk)."""
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_12", "NATION_13")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem")
    nval = (
        li.join(s, li.l_suppkey == s.s_suppkey)  # nation-filtered: stats decide
        .groupBy("l_partkey")
        .agg(
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1).cast("decimal(3,2)") - frac2("l_discount"))
            ).alias("value_dec")
        )
    )
    total = nval.agg(F.sum("value_dec").alias("total_dec"))
    return (
        nval.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec")
            > F.col("total_dec") * F.lit("0.001").cast("decimal(4,3)")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"))
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: the priority CASE pivot over late shipments.
    The schema has no shipmode/commitdate/receiptdate, so 'late' is
    shipped >60 days after the order date (a cross-table theta residual
    on the orderkey equi-join) and the pivot class is l_returnflag.
    Sums of CASE are cast to BIGINT in the oracle (DuckDB sums to
    HUGEINT — the q_table_profile lesson).

    Scale: one shuffle join on orderkey, then a 3-group aggregate with
    map-side partials; the date residual evaluates inside the join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q20_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY l_partkey)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name IN ('NATION_12', 'NATION_13', 'NATION_15')
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey FROM shipped sh
      JOIN tot t  ON t.l_partkey = sh.l_partkey
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE '%widget%' AND sh.qty > t.total_qty * 0.3)
    ORDER BY s.s_name
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate shipment of some targeted
    part — the qty-share semi-join.  partsupp/availqty are absent, so a
    supplier qualifies when their 1996 shipped quantity of a '%widget%'
    part exceeds 30% of that part's total (shares compared in exact
    DECIMAL; both engines agree at the boundary).

    Scale: shipped/tot reuse ONE groupBy(partkey, suppkey) shuffle (tot
    re-aggregates the already-keyed output); the IN-subquery is a
    left-semi hash join on suppkey; part filter pushes into the parquet
    scan; nation broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(ts_lit("1996-01-01"), ts_lit("1996-12-31"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_12", "NATION_13", "NATION_15")
    )
    s = load(spark, sf_dir, "supplier")

    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec2("l_quantity")).alias("qty")
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    qualifying = (
        shipped.join(tot, "l_partkey")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .filter(F.col("qty") > F.col("total_qty") * F.lit("0.3").cast("decimal(2,1)"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )

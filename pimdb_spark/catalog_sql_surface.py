"""Advanced SQL-surface coverage (SURVEY §2.4/§2.8 'free extras'):
ROLLUP, GROUPING SETS-style multi-level aggregation, correlated/
uncorrelated subqueries (EXISTS / IN / scalar), and approximate distinct
counting — the capabilities the reference inherits from its backing RDBMS
and this engine inherits from Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register, ts_lit


@register(
    "q_grouping_analytics",
    oracle="""
    SELECT 'rollup' AS op, l_returnflag AS k1, l_linestatus AS k2,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS op, o_orderstatus AS k1, o_orderpriority AS k2,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'grouping_sets' AS op, l_returnflag AS k1, l_linestatus AS k2,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level grouping analytics in one tagged result: ROLLUP ((flag,
    status), (flag), () levels), CUBE (all 4 combinations), and explicit
    GROUPING SETS (per-flag, per-status, grand total — neither a rollup
    nor a cube).  Scale: Spark expands each into a single Expand + hash
    agg — one shuffle per grouping op for all its levels, never one scan
    per level."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    rollup = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total"),
    ).select(
        F.lit("rollup").alias("op"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        "n",
        "total",
    )
    cube = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
    ).select(
        F.lit("cube").alias("op"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        "n",
        "total",
    )
    # DataFrame-native GROUPING SETS (no temp-view side effect on the
    # shared session): per-flag, per-status, grand total.
    gsets = li.groupingSets(
        [[F.col("l_returnflag")], [F.col("l_linestatus")], []],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total"),
    ).select(
        F.lit("grouping_sets").alias("op"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        "n",
        "total",
    )
    return rollup.unionByName(cube).unionByName(gsets)


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


@register(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_A,
           CAST(sum(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_N,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (long → wide).  Listing the pivot
    values keeps it a single-pass conditional aggregation — omitting them
    would cost an extra distinct-scan job to discover the columns."""
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"))
    )
    return out.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (both engines use
    the type-7 quantile definition; l_quantity values are small integers so
    the interpolation arithmetic is exact in binary floating point).
    Scale: exact percentile buffers per-group values — fine for bounded
    groups; unbounded cardinality should switch to approx_percentile
    (t-digest, mergeable sketches)."""
    li = load(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_quantity, array(0.25D, 0.50D, 0.75D))")
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("_p"))
        .select(
            "l_returnflag",
            F.col("_p")[0].alias("p25"),
            F.col("_p")[1].alias("p50"),
            F.col("_p")[2].alias("p75"),
        )
    )


# Bench-only since the round-10 consolidation: the full-salt demo's
# oracle is the LITERAL oracle of q_partial_salted_join (both prove
# salting semantically invisible against the same plain join) — the
# heavy-key-only production form keeps the registry slot; the full-salt
# path is hash-gated on the shared oracle by tests/test_catalog_oracle.py
# and stays covered by tests/test_plans.py's plan audit, the skew
# operator tests, and bench.py.
from pimdb_spark.catalog import register_bench_only as _rbo  # noqa: E402

# Salting must be semantically invisible: both the full-salt demo and the
# heavy-key-only production form hash against this one plain-join oracle.
_PLAIN_JOIN_ORACLE = """
    SELECT o.o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """


@_rbo("q_salted_join", oracle=_PLAIN_JOIN_ORACLE)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted join (operators/skew.salted_join): lineitem's
    orderkey spread over 8 salts, orders replicated 8x, then the same
    aggregate as the plain join — the oracle IS the plain join, proving the
    salting is semantically invisible.  Scale: heavy-hitter orderkeys can't
    flood one reducer; salting composes where AQE skew-split can't reach
    (broadcast-ineligible, bucketed, or streaming joins)."""
    from pimdb_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, o, on="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("sum_price"),
    )


@register(
    "q_partial_salted_join",
    oracle=_PLAIN_JOIN_ORACLE,
    bench=True,
)
def q_partial_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial (heavy-hitter-only) salted join (operators/skew.
    partial_salted_join): keys above the skew threshold fan out over 8
    salts, light keys join unsalted, so the replication cost is confined
    to the flood keys.  The oracle is the plain join — salting must be
    semantically invisible.  The threshold sits in the tail of the
    per-key count distribution (<1% of orderkeys at sf0.1, ~100 keys at
    sf0.01) so both the salted and unsalted paths are exercised while the
    replication cost stays where it belongs: near zero.

    Scale: full salting replicates the entire build side n_salts-fold;
    this replicates only rows whose key is genuinely hot, which for real
    skew (a handful of flood keys) is near-free, while those keys still
    spread over n reducers."""
    from pimdb_spark.operators.skew import partial_salted_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = partial_salted_join(li, o, on="l_orderkey", n_salts=8, heavy_threshold=9)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("sum_price"),
    )


@register(
    "q_full_outer",
    oracle="""
    WITH oc AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_mktsegment, oc.o_custkey, oc.n_orders
    FROM customer c
    FULL OUTER JOIN oc ON c.c_custkey = oc.o_custkey
    WHERE c.c_custkey IS NULL OR c.c_custkey % 3 = 0
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the reference has only inner + left outer, SURVEY
    §2.3): customers with no orders and order-keys with no customer row
    both survive with NULLs.  Scale: full outer forces a shuffle join on
    both sides (no broadcast) — exactly one exchange per side."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    oc = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = c.join(oc, c.c_custkey == oc.o_custkey, "full_outer")
    return joined.filter(
        F.col("c_custkey").isNull() | (F.col("c_custkey") % 3 == 0)
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY n1.n_name, n2.n_name, extract(year FROM l.l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dim table joined TWICE under different
    aliases (supplier nation vs customer nation), a disjunctive cross-side
    predicate, a date-range filter, and per-year aggregation.

    Scale: the nation-pair disjunction is pushed to BOTH fact sides
    BEFORE the big joins — supplier and customer each pre-join (broadcast)
    a nation table filtered to the two pair members, so the orders⋈
    lineitem shuffle carries only rows that can survive (~2/25ths here,
    2/N generally) and the residual pair filter runs on the already-
    reduced slice.  The disjunction itself never becomes a join condition
    → no nested loop; one real shuffle (orders⋈lineitem) plus the final
    agg exchange."""
    pair = ("NATION_20", "NATION_11")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= ts_lit("1995-01-01")
    )
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            n.select(F.col("n_nationkey").alias("n1_key"),
                     F.col("n_name").alias("supp_nation"))
        ),
        F.col("s_nationkey") == F.col("n1_key"),
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(
            n.select(F.col("n_nationkey").alias("n2_key"),
                     F.col("n_name").alias("cust_nation"))
        ),
        F.col("c_nationkey") == F.col("n2_key"),
    )
    pair_ok = (
        (F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1])
    ) | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
    volume = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)  # nation-filtered: stats decide
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # nation-filtered: stats decide
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("volume"))
    )


@register(
    "q_window_suite",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           first_value(o_orderkey) OVER w AS first_ok,
           lead(o_orderkey, 1) OVER w AS next_ok,
           lag(o_orderkey, 1)  OVER w AS prev_ok
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the window-function family in one pass: ntile,
    percent_rank, cume_dist, first_value, lead, lag — all sharing ONE
    window spec, so Catalyst evaluates them in a single Window operator
    over a single shuffle+sort on o_custkey."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.lead("o_orderkey", 1).over(w).alias("next_ok"),
        F.lag("o_orderkey", 1).over(w).alias("prev_ok"),
    )


@register(
    "q_scalar_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_u,
           trim(c_mktsegment) AS seg_t,
           substring(c_name, 1, 8) AS name_8,
           length(c_name) AS name_len,
           CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS order_month,
           CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
           CAST(extract(dow FROM o_orderdate) AS INT) AS order_dow
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey % 50 = 0
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common scalar string/date functions in one projection (upper, trim,
    substring, length, date_trunc, extract year/dow) — all codegen'd
    JVM-side, no UDF.  DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 50 == 0)
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey).select(
        "c_custkey",
        F.upper("c_name").alias("name_u"),
        F.trim("c_mktsegment").alias("seg_t"),
        F.substring("c_name", 1, 8).alias("name_8"),
        F.length("c_name").alias("name_len"),
        # cast to date first: DuckDB's date_trunc('month', ts) renders as a
        # DATE ('1995-06-01'), Spark's as a timestamp ('1995-06-01 00:00:00')
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
    )


def approx_distinct_full(li: DataFrame) -> DataFrame:
    """Sketch + exact side by side (shared by the catalog entry and the
    error-bound test, which asserts on the raw approx value)."""
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@register(
    "q_approx_distinct",
    # The HLL sketch VALUE differs per engine by design, so the hashed
    # output carries (exact count, bound verdict) instead of the sketch:
    # the oracle recomputes the exact count and expects within_bound=1,
    # so a sketch drifting past 10% relative error turns this row red —
    # a real cross-checked gate, not a rows-only "didn't crash".
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(1 AS INT) AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group, gated against the
    exact count: emits the exact distinct (hash-checked against DuckDB)
    and within_bound = sketch inside 10% relative error (oracle expects
    1; the tighter 2% typical error is asserted in tests on the raw
    values via approx_distinct_full).
    Scale: HLL sketches merge associatively — constant memory per group
    versus the exact count's full distinct shuffle."""
    full = approx_distinct_full(load(spark, sf_dir, "lineitem"))
    return full.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            < 0.1
        )
        .cast("int")
        .alias("within_bound"),
    )


@register(
    "q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer-order-count distribution via a left outer
    join with an extra join-side predicate (not a WHERE — customers with
    zero qualifying orders must survive with c_count = 0), then a second
    aggregation over the first's result.

    Scale: two shuffles by construction (join+agg on custkey, re-agg on
    c_count); the second input is one row per customer, already tiny
    relative to the fact table."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as a semi-join filter
    (orders whose total lineitem quantity exceeds the threshold), then the
    customer join and the final per-order aggregate.

    Scale: the HAVING subquery is a partial-aggregated groupBy on
    l_orderkey whose output (just the qualifying keys) semi-joins back —
    Spark plans it as a LeftSemi without materializing the IN-list;
    quantity sums run in exact DECIMAL for cross-engine bit parity."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaling: no forced broadcast
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan→filter→global aggregate, no grouping key.

    Scale: the whole query is one narrow map stage plus a single-row final
    aggregate; all four predicates and the 3-column projection push into
    the parquet scan (`PushedFilters` in the plan), so I/O — not CPU — is
    the cost at 100 TB.  Revenue in exact DECIMAL for cross-engine parity."""
    from pimdb_spark.catalog import dec2, frac2

    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts_lit("1995-01-01"))
            & (F.col("l_shipdate") < ts_lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * frac2("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
                    ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS promo_revenue_pct,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-12-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) over a
    fact⋈dim join — the promo-revenue percentage.

    Scale: `part` is the small side and is broadcast, so the only wide
    operation is the single-row final aggregate; the date filter prunes
    the lineitem scan before the join.  Both sums run in exact DECIMAL,
    the ratio is computed in DOUBLE at the very end."""
    from pimdb_spark.catalog import dec2, frac2

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = dec2("l_extendedprice") * (one - frac2("l_discount"))
    promo = F.when(
        F.col("p_type").startswith("PROMO"), disc_price
    ).otherwise(F.lit(0).cast("decimal(15,4)"))
    return (
        li.filter(
            (F.col("l_shipdate") >= ts_lit("1995-09-01"))
            & (F.col("l_shipdate") < ts_lit("1995-12-01"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))  # SF-scaling
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal_d,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: rank customers by revenue lost to returned items —
    fact⋈fact⋈dim join, grouped aggregate, global top-20.

    Scale: the orders date filter and the lineitem returnflag filter both
    push into their scans before the orderkey shuffle; nation is broadcast;
    the final ORDER BY + LIMIT plans as TakeOrderedAndProject, so no
    executor ever materializes a full sort.  The custkey tiebreak makes the
    top-20 deterministic across engines."""
    from pimdb_spark.catalog import dec2, frac2

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - frac2("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= ts_lit("1995-01-01"))
                & (F.col("o_orderdate") < ts_lit("1996-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal_d"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 45
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join with a disjunction of conjunctive
    residual predicates (OR across three brand/size/quantity clauses).

    Scale: Catalyst keeps the p_partkey equality as the join key (hash
    join, never nested-loop) and evaluates the OR as a post-join filter;
    single-column predicates that appear in every branch are not needed
    here, but the small `part` side is broadcast so the disjunction never
    forces a shuffle of its own."""
    from pimdb_spark.catalog import dec2, frac2

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - frac2("l_discount"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    clause = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 45) & q.between(20, 40))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))  # SF-scaling
        .filter(clause)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND CAST(l.l_quantity AS DECIMAL(12,2))
          * 5
          * (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
          < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(12,2)))
             FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AGGREGATE subqueries — revenue
    from orders of less than 20% of a part's average quantity.

    Catalyst decorrelates each subquery into a groupBy on the correlation
    key joined back to the outer lineitem, so the plan is aggregate+join,
    never a per-row re-scan.  The textbook form compares against
    ``0.2 * avg(...)`` — a double whose last-ulp depends on partial-sum
    order; multiplying out to ``qty * 5 * count < sum`` keeps every
    operand in exact DECIMAL/integer arithmetic, so both engines agree on
    row membership bit-for-bit."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               count(*) AS n
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND CAST(l.l_quantity AS DECIMAL(12,2))
              * 5
              * (SELECT count(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
              < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(12,2)))
                 FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
        """
    )


# ---------------------------------------------------------------------------
# Anti-join family (TPC-H Q21/Q22/Q16 shapes) — the NOT EXISTS chain and
# null-aware NOT IN surfaces the reference inherits from its backing RDBMS
# (pass-through SQL, pimdb/command.py:223-237) and this engine from Spark.
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n.n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE returned-flag lineitem
    in a finished multi-supplier order — a correlated EXISTS (another
    supplier participated) chained with a correlated NOT EXISTS (no other
    supplier's item was returned), both with an inequality correlation
    term on top of the equi-key.

    Expressed DataFrame-native: both subqueries become left_semi /
    left_anti joins whose condition is the l_orderkey equi-key plus the
    l_suppkey inequality — Spark plans the pair as two hash joins on
    l_orderkey (the inequality rides along as a join residual), so the
    whole chain is two shuffles on the same key, never a per-row re-scan.
    Supplier⋈nation broadcasts.  (l_returnflag='R' stands in for the
    receipt-after-commit predicate; this testdata has no receipt dates.)
    """
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")

    nat_suppliers = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")

    cand = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("ck_order"),
            F.col("l_suppkey").alias("ck_supp"),
        )
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("ck_order") == F.col("o_orderkey"),
        )
        .drop("o_orderkey")
        .join(nat_suppliers, F.col("ck_supp") == F.col("s_suppkey"))  # supplier-scaling
    )

    others = li.select(
        F.col("l_orderkey").alias("ot_order"),
        F.col("l_suppkey").alias("ot_supp"),
        "l_returnflag",
    )
    other_supplier = (F.col("ot_order") == F.col("ck_order")) & (
        F.col("ot_supp") != F.col("ck_supp")
    )
    cand = cand.join(others, other_supplier, "left_semi")
    cand = cand.join(
        others.filter(F.col("l_returnflag") == "R"), other_supplier, "left_anti"
    )
    return cand.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 5, 9, 13, 17)
      AND CAST(c_acctbal AS DECIMAL(12,2))
          * (SELECT count(*) FROM customer
             WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17))
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer
             WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17))
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in a nation group
    with no urgent orders — an uncorrelated scalar aggregate threshold
    plus a correlated NOT EXISTS anti-join.

    The textbook form compares against avg(c_acctbal), a division whose
    rounding differs across engines; multiplying out to
    ``bal * count > sum`` keeps both sides exact DECIMAL, so row
    membership is bit-identical.  Scale: the scalar subqueries reduce to
    one-row aggregates evaluated once (SubqueryExec, no join in the main
    plan); the NOT EXISTS plans as a LeftAnti hash join on c_custkey —
    one shuffle.  (No-urgent-orders stands in for no-orders; every
    customer in this testdata has orders.)"""
    load(spark, sf_dir, "customer").createOrReplaceTempView("q22_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("q22_orders")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM q22_customer c
        WHERE c_nationkey IN (1, 5, 9, 13, 17)
          AND CAST(c_acctbal AS DECIMAL(12,2))
              * (SELECT count(*) FROM q22_customer
                 WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17))
              > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM q22_customer
                 WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17))
          AND NOT EXISTS (
            SELECT 1 FROM q22_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
          )
        GROUP BY c_nationkey
        """
    )


@register(
    "q16_supplier_parts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 4, 9, 16, 25)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class, excluding
    a NOT IN subquery of disqualified suppliers (negative balance stands
    in for the complaints LIKE; this testdata has no s_comment).

    NOT IN is the null-aware anti-join: Spark's single-column NAAJ
    optimization plans it as a BroadcastHashJoin LeftAnti (isNullAware)
    against the broadcast-able disqualified set — no nested loop even
    though NULL semantics are honored.  Brand/size predicates push into
    the part scan; part broadcasts into lineitem."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q16_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("q16_part")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("q16_supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM q16_lineitem l
        JOIN q16_part p ON p.p_partkey = l.l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_size IN (1, 4, 9, 16, 25)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM q16_supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        """
    )


@register(
    "q_rolling_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_30d
    FROM orders
    """,
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per customer, the 30-day trailing revenue
    at each order (range frame over epoch seconds, not row counts — peers
    at the same timestamp aggregate together on both engines).
    Scale: one shuffle on o_custkey; the running frame is a single sorted
    pass per partition."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    # timestampdiff on TIMESTAMP_NTZ is timezone-free — unix_timestamp would
    # interpret the naive timestamp in the SESSION timezone and shift frame
    # boundaries under a non-UTC driver session
    epoch_s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    )
    w = Window.partitionBy("o_custkey").orderBy(epoch_s).rangeBetween(-30 * 86400, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_30d"),
    )


@register(
    "q4_priority_count",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a date window having at least one
    late-shipping lineitem (correlated EXISTS with a cross-side date
    comparison; ship > order+60d stands in for receipt > commit — this
    testdata carries no commit/receipt dates), counted per priority.

    DataFrame-native: the EXISTS is a left_semi join whose condition is
    the l_orderkey equi-key plus the date inequality riding along as a
    residual — one shuffle on the key, the semi-join short-circuits per
    order, and both date filters push into the scans."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-07-01"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("lk"), "l_shipdate"
    )
    late = (F.col("lk") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(3,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume END) AS DOUBLE)
               AS nation_volume,
           CAST(sum(volume) AS DOUBLE) AS total_volume,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue delivered
    into ASIA-region customers, per order year — the widest join in the
    suite (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region ⋈ supplier ⋈
    nation ⋈ part, the same dim joined twice under different roles).

    Scale: every dim broadcasts; the only real shuffle is
    orders⋈lineitem and the final year agg.  Both sums stay in exact
    DECIMAL until ONE cast to double each, and the share divides those
    two doubles — IEEE division is engine-identical, so the ratio is
    reproducible where a summed-in-double ratio would not be."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaling: no forced broadcast
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)  # SF-scaling
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .join(p, li.l_partkey == p.p_partkey)  # SF-scaling
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
    ).cast("double")
    tot = F.sum("volume").cast("double")
    return base.groupBy("o_year").agg(
        nat.alias("nation_volume"),
        tot.alias("total_volume"),
        (nat / tot).alias("mkt_share"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT max(total) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals the
    maximum over the aggregated revenue view — an uncorrelated scalar
    aggregate over a CTE the outer query also consumes (the reference
    expresses this as a VIEW; Spark reuses the exchange).

    The max-equality compares exact DECIMAL totals, so 'the' top supplier
    cannot differ across engines by a double ulp.  Scale: one shuffle for
    the revenue agg; the scalar max is a one-row subquery result; the
    supplier join broadcasts."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS total
          FROM q15_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_rev
        FROM q15_supplier s
        JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total = (SELECT max(total) FROM rev)
        """
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))
                      * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE)
               AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, extract(year FROM o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year for parts whose
    name matches a substring — the LIKE-filtered 5-table join with
    cross-table arithmetic inside the aggregate.  (retailprice/10 stands
    in for ps_supplycost; this testdata has no partsupp.)

    All arithmetic stays in exact DECIMAL — the /10 divides by an exact
    power of ten, so scale just shifts — with ONE cast to double at the
    end.  Scale: part (LIKE pushed into its scan), supplier and nation
    broadcast; orders⋈lineitem is the one real shuffle, then the
    (nation, year) agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(3,2)"))
        - F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        # x0.1 as exact DECIMAL, never /10: DECIMAL / INT promotes to
        # DOUBLE in DuckDB, breaking cross-engine bit parity
        * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # SF-scaling: stats decide
        .join(s, li.l_suppkey == s.s_suppkey)  # SF-scaling
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


def approx_percentile_full(li: DataFrame) -> DataFrame:
    """Sketch + exact quantiles side by side, one scalar row per (flag,
    quantile) — shared by the catalog entry and the error-bound test."""
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)"
        ).alias("approx_p"),
        F.expr(
            "percentile(l_extendedprice, array(0.25, 0.5, 0.75))"
        ).alias("exact_p"),
    )
    return agg.select(
        "l_returnflag",
        F.posexplode(F.arrays_zip("approx_p", "exact_p")).alias("q_idx", "z"),
    ).select(
        "l_returnflag",
        "q_idx",
        F.col("z.approx_p").alias("approx_val"),
        F.col("z.exact_p").alias("exact_val"),
    )


@register(
    "q_approx_percentile",
    # Sketch internals are engine-specific AND the exact interpolated
    # percentile is a float whose last ulp may differ across engines, so
    # the hashed output carries only the group grid and the bound verdict
    # (both computed Spark-side from sketch vs exact): the oracle expects
    # within_bound=1 for every (flag, quantile) cell, so a sketch past 2%
    # relative error turns this row red — a cross-checked gate rather
    # than rows-only.
    oracle="""
    SELECT DISTINCT l_returnflag, q.q_idx, CAST(1 AS INT) AS within_bound
    FROM lineitem, (VALUES (0), (1), (2)) AS q(q_idx)
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group, gated against the exact percentile —
    the mergeable-sketch path for unbounded-cardinality groups, where
    exact percentiles would buffer every group's values.  Emits one row
    per (flag, quantile) with within_bound = sketch inside 2% relative
    error of the exact value (oracle expects 1 everywhere; raw values
    are asserted in tests via approx_percentile_full).

    Output is one SCALAR row per (flag, quantile) because the driver's
    comparator canonicalizes via pandas sort_values, which cannot sort
    ArrayType cells.
    Scale: the sketch merges associatively — constant memory per group,
    map-side partial aggregation, one shuffle; the explode is 3 rows per
    group."""
    full = approx_percentile_full(load(spark, sf_dir, "lineitem"))
    return full.select(
        "l_returnflag",
        "q_idx",
        (
            F.abs(F.col("approx_val") - F.col("exact_val")) / F.col("exact_val")
            < 0.02
        )
        .cast("int")
        .alias("within_bound"),
    )


@register(
    "q_list_membership_join",
    bench=True,
    oracle="""
    WITH crew AS (
      SELECT o_orderkey,
             'd' || CAST(o_orderkey % 31 AS VARCHAR) || ',' ||
             'd' || CAST((o_orderkey + 7) % 31 AS VARCHAR) || ',' ||
             'd' || CAST((o_orderkey * 3 + 1) % 31 AS VARCHAR) AS directors
      FROM orders
    ), exploded AS (
      SELECT o_orderkey, unnest(list_distinct(string_split(directors, ',')))
             AS person_id
      FROM crew
    ), people AS (
      SELECT 'd' || CAST(s_suppkey % 31 AS VARCHAR) AS person_id,
             min(s_name) AS person_name
      FROM supplier GROUP BY 1
    )
    SELECT p.person_id, p.person_name,
           count(*) AS n_titles, min(e.o_orderkey) AS first_key
    FROM exploded e JOIN people p ON e.person_id = p.person_id
    GROUP BY p.person_id, p.person_name
    """,
)
def q_list_membership_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's documented list-membership theta-join
    (docs/datamodel.md:56: ``find_in_set(nconst, directors) > 0`` against
    the un-normalized CSV column; SURVEY §2.3 maps it to
    ``array_contains(split(directors, ','), nconst)``).

    The doc form is a theta join — as written it would plan as a
    BroadcastNestedLoopJoin and die at scale.  The scale path implemented
    here: ``explode(array_distinct(split(csv)))`` then a plain hash
    EQUI-join on the exploded member, which Catalyst plans as broadcast /
    shuffle hash join (plan-tested: no BNLJ).  ``array_distinct`` before
    the explode preserves find_in_set's membership-ONCE semantics when a
    list repeats an id.

    The CSV column and person dim are derived deterministically from
    orders/supplier (this testdata has no IMDb-shaped crew table); the
    derivation is part of the query on both engines, so the oracle
    attests the membership-join semantics end to end.  Scale: explode
    factor is bounded by list length (3 here; <= ~10 for real crew
    lists), people is a broadcast dim, then one keyed agg."""
    o = load(spark, sf_dir, "orders")
    crew = o.select(
        "o_orderkey",
        F.concat_ws(
            ",",
            F.concat(F.lit("d"), (F.col("o_orderkey") % 31).cast("string")),
            F.concat(F.lit("d"), ((F.col("o_orderkey") + 7) % 31).cast("string")),
            F.concat(F.lit("d"), ((F.col("o_orderkey") * 3 + 1) % 31).cast("string")),
        ).alias("directors"),
    )
    s = load(spark, sf_dir, "supplier")
    people = s.groupBy(
        F.concat(F.lit("d"), (F.col("s_suppkey") % 31).cast("string")).alias(
            "person_id"
        )
    ).agg(F.min("s_name").alias("person_name"))
    exploded = crew.select(
        "o_orderkey",
        F.explode(F.array_distinct(F.split(F.col("directors"), ","))).alias(
            "person_id"
        ),
    )
    return (
        exploded.join(F.broadcast(people), "person_id")
        .groupBy("person_id", "person_name")
        .agg(
            F.count(F.lit(1)).alias("n_titles"),
            F.min("o_orderkey").alias("first_key"),
        )
    )

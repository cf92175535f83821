"""Operator/query catalog: the driver-facing contract.

Every operator family from SURVEY.md §2 (and the beyond-parity
LLM-data-pipeline operators) is exercised here as a named query over the
driver's synthetic TPC-H-ish tables, paired with an ANSI-SQL oracle that
DuckDB runs on the same parquet files.  ``queries()`` / ``oracle_sql()`` in
``__spark_entry__.py`` re-export this registry.

Conventions (driver compare is row-count + schema + order-insensitive
value-hash with columns sorted by name):

- Every computed column is aliased identically in the Spark plan and in the
  oracle SQL.
- Float aggregates are ``round(x, N)`` on both sides so that
  partial-aggregation order (which differs between engines and between runs)
  cannot flip the last ulp of an unrounded double.
- Raw timestamps are emitted as ``epoch_us`` bigints (exact, no formatting
  ambiguity); truncated timestamps are cast to string (both engines format
  whole-second timestamps identically).
- All queries are pure DataFrame plans: no collect(), no Python row loops,
  no RDDs.  Scale notes (what the plan does at 100 TB) are in each docstring.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


_SHIPPED_APPS: set[str] = set()


def ensure_worker_code(spark: SparkSession) -> None:
    """Ship this package to executor-side Python workers via ``addPyFile``.

    The driver process has the repo on ``sys.path`` (``__spark_entry__``
    inserts it), but executor Python workers see only PYTHONPATH plus the
    JVM's working directory — when the session was created from some other
    directory, any Pandas UDF pickled by reference to this package dies on
    the worker with ``ModuleNotFoundError: pimdb_spark``.  Shipping a zip of
    the package once per SparkContext is the cluster-correct fix: on a
    1000-executor cluster the same call distributes the code to every
    worker, exactly as it does here."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED_APPS:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="pimdb_spark_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "pimdb_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED_APPS.add(app)


def parquet_ts_unit(path: str, column: str = "ts") -> str:
    """Time unit ('ns'/'us'/'ms'/'s') of a parquet timestamp column, read
    from the footer (pyarrow, no data pages).  ``path`` may be a single
    parquet file or a directory of them (first file sniffed — a dataset's
    files share one schema); the streaming readers use the directory form.

    Raises ValueError when the column is not a parquet timestamp or the
    unit is unrecognized — a testdata generation that drops the logical
    type must fail loudly here, not be silently misread as micros."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    p = path
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if not files:
            raise FileNotFoundError(f"no parquet files to sniff in {path}")
        p = os.path.join(path, files[0])
    field = pq.read_schema(p).field(column)
    if not pat.is_timestamp(field.type):
        raise ValueError(
            f"{p}:{column} is {field.type}, not a parquet timestamp — "
            "cannot infer an epoch unit; fix the writer or read it explicitly"
        )
    unit = field.type.unit
    if unit not in ("ns", "us", "ms", "s"):
        raise ValueError(f"{p}:{column} has unsupported timestamp unit {unit!r}")
    return unit


def _events_ts_unit(sf_dir: str) -> str:
    """Time unit of ``{sf_dir}/events.parquet``'s ts column, cached.

    Different generations of the driver's testdata write ``ts`` as INT64
    TIMESTAMP(NANOS) or TIMESTAMP(MICROS); hard-coding either breaks the
    other (a nanos assumption on micros data inflates every epoch by
    1000x).  One driver-side footer read settles it per sf_dir.  On a real
    cluster this is a metadata-only operation on a single file — same cost
    class as schema inference.

    The cache is process-lifetime by design: regenerating testdata in
    place under a live session requires a new process (the documented
    re-run-the-sweep-after-regen workflow); invalidating on file mtime
    would buy nothing during a normal run."""
    key = (sf_dir, "events_ts_unit")
    cached = _TS_UNIT_CACHE.get(key)
    if cached is None:
        cached = parquet_ts_unit(f"{sf_dir}/events.parquet")
        _TS_UNIT_CACHE[key] = cached
    return cached


_TS_UNIT_CACHE: dict[tuple[str, str], str] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; filters/column pruning push down into this scan.

    ``events.ts`` is physically an INT64 parquet timestamp whose unit has
    varied across testdata generations (NANOS in early rounds, MICROS now).
    Spark's vectorized reader happily reads either as a raw epoch long via
    an explicit LongType schema (TIMESTAMP_NANOS it cannot read any other
    way), so we sniff the unit from the footer (`_events_ts_unit`) and
    normalize to ``ts_us`` (epoch microseconds, bigint).  All event-time
    logic in this catalog is integer arithmetic on epoch micros — exact and
    timezone-independent on both Spark and the DuckDB oracle (which itself
    computes ``epoch_us(ts)`` on the naive timestamp).
    """
    ensure_worker_code(spark)
    if name == "events":
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        )
        unit = _events_ts_unit(sf_dir)
        if unit == "ns":
            to_us = F.expr("ts div 1000")
        elif unit == "ms":
            to_us = F.col("ts") * 1000
        elif unit == "s":
            to_us = F.col("ts") * 1_000_000
        else:  # "us" — parquet_ts_unit already rejected anything else
            to_us = F.col("ts")
        return (
            spark.read.schema(schema)
            .parquet(f"{sf_dir}/{name}.parquet")
            .withColumn("ts_us", to_us)
            .drop("ts")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_lit(s: str):
    """Timestamp literal as TIMESTAMP_NTZ: the driver tables store naive
    timestamps (parquet isAdjustedToUTC=false → Spark timestamp_ntz), and
    NTZ-vs-NTZ comparison is independent of the session timezone, matching
    DuckDB's naive TIMESTAMP semantics exactly."""
    return F.lit(s).cast("timestamp_ntz")


# Numeric-parity policy (vs the DuckDB oracle):
#
# 1. Per-row float expressions are emitted RAW (no rounding): when the Spark
#    plan and the oracle SQL share the same expression structure, IEEE-754
#    ops produce bit-identical doubles, so no tolerance is needed.
# 2. Aggregates over money-like columns use exact DECIMAL arithmetic
#    (inputs are fixed-point values stored as doubles; casting to a narrow
#    decimal recovers them exactly) and cast the final sum to DOUBLE.  This
#    removes float-summation-order sensitivity entirely — Spark's partial
#    aggregation order varies run to run, decimal sums do not.
# 3. Averages are emitted as CAST(sum_decimal AS DOUBLE) / count — one
#    deterministic double division instead of engine-specific AVG typing.


def dec2(c) -> F.Column:
    """Exact cents: prices/quantities (≤ 10 digits, 2 decimals)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(12,2)")


def frac2(c) -> F.Column:
    """Exact small fraction (discount/tax in [0,1.1])."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(3,2)")


@dataclass
class CatalogEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records the weaker rows-only check
    bench: bool = False  # include in bench.py headline run


_REGISTRY: dict[str, CatalogEntry] = {}

# Bench-only callables: production fast-path twins whose ORACLE is the
# literal oracle of a registry base entry (same semantics, different
# physical scorer).  They are timed by bench.py and plan-audited by
# tests/test_plans.py exactly like registry entries, but do not consume
# driver-window capacity — the round-10 consolidation that keeps the
# rotation invariant at K=3 (COVERAGE.md "Attestation rotation").
_EXTRA_BENCH: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

# Oracles for bench-only entries whose contract is NOT a literal duplicate
# of a registry base entry (e.g. q_sparse_doc_sim_sum's round-4
# associative-sum contract): excluded from the driver window, but
# tests/test_catalog_oracle.py hash-gates them at sf0.001 on every pytest
# run, so the claim stays mechanically enforced locally.
_EXTRA_BENCH_ORACLE: dict[str, str] = {}


def register_bench_only(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _EXTRA_BENCH[name] = fn
        if oracle is not None:
            _EXTRA_BENCH_ORACLE[name] = oracle
        return fn

    return deco


def register(name: str, oracle: str | None, bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = CatalogEntry(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


# The driver's CORRECTNESS check only covers the first 50 entries of
# queries().  Entries listed here are emitted FIRST so new/changed entries
# and the stalest attestations land inside that window; the rest follows in
# registration order (attestation already on recent record).
#
# Rotation invariant (COVERAGE.md "Attestation rotation"): re-derived
# every round by scripts/derive_rotation.py as (new entries) + (changed
# entries) + (entries that failed last round) + (entries outside last
# round's window, stalest attestation first, ties in registration
# order).  Builder-r21 derivation (`scripts/derive_rotation.py
# q_incremental_split_inherit`) over the 149-entry registry (149 = r20's
# 148 + the one promotion, headroom 1 under the 150 cap; the r18 verdict
# item 7 / r17 slate's arithmetic: 48 forced r16-stale names + 2 free
# slots): 1 new (the promoted q_incremental_split_inherit — the LAST
# name in the promotion line, which is now empty; bench-only with a
# DuckDB oracle hash-gated at both SFs since r14) + 0 changed + 0 failed
# + the 48 forced last-green-r16 names + 1 margin slot taken by the
# stalest r17 name (q_distinct_multi) = 50.  This round's optimization-
# touched entries keep their hashes (oracle-verified at both SFs in the
# r19 optimization batches) and are covered by the 190-gate pytest
# sweep, the same convention as the r18 optimization round.
# derive_rotation.py verified registry \ (r17 ∪ r18 ∪ next) = ∅, exit 0.
_CHECK_FIRST: list[str] = [
    # -- new this round --
    "q_incremental_split_inherit",
    # -- stalest attestation first --
    "q_dedup_keep_first",
    "q_leakage_safe_split",
    "q_simhash",
    "q_bm25_topk",
    "q_cross_neardup_filter",
    "q_kmeans_assignments",
    "q_int8_ann_topk",
    "q_ivf_int8_topk",
    "q_ivf_pq_rerank_topk",
    "q_embedding_gram_int8",
    "q_random_projection_int8",
    "q_multimodal_decode",
    "q_image_channel_stats",
    "q_jpeg_color_stats",
    "q13_order_distribution",
    "q18_large_volume_customers",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q10_returned_items",
    "q19_discounted_revenue",
    "q17_small_quantity",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q16_supplier_parts",
    "q_rolling_window",
    "q4_priority_count",
    "q8_market_share",
    "q15_top_supplier",
    "q9_product_profit",
    "q_hash_split",
    "q_domain_quota",
    "q_seq_packing",
    "q_quality_funnel",
    "q_stratified_sample",
    "q_weighted_sample",
    "q_snapshot_diff",
    "q_snapshot_merge",
    "q_scd2_intervals",
    "q_token_df_idf",
    "q_top_bigrams",
    "q_decontaminate",
    "q_priority_dedup",
    "q_repetition_ratio",
    "q_redact",
    "q_corpus_divergence",
    "q_bpe_train_batched",
    "q_bloom_decontaminate",
    "q_label_propagation",
    "q_distinct_multi",  # last green r17
    "q_key_table_tokens",  # last green r17
    "q_left_join_coalesce",  # last green r17
    "q_window_rank",  # last green r17
    "q_count_star",  # last green r17
    "q_set_ops",  # last green r17
    "q_json_extract",  # last green r17
    "q_sql_passthrough",  # last green r17
    "q_posexplode_ordering",  # last green r17
    "q_explode_resolve_renumber",  # last green r17
    "q_token_decompose",  # last green r17
    "q_text_stats",  # last green r17
    "q_lang_id",  # last green r17
    "q_token_counts",  # last green r17
    "q_doc_fingerprint_dedup",  # last green r17
    "q_cluster_quota",  # last green r17
    "q_negative_sample",  # last green r17
    "q_pq_from_codes_topk",  # last green r17
    "q_pq_trained_topk",  # last green r17
    "q_audio_stats",  # last green r17
    "q_video_frame_stats",  # last green r17
    "q_image_ahash",  # last green r17
    "q_image_dup_pairs",  # last green r17
    "q_audio_fingerprint",  # last green r17
    "q_audio_dup_pairs",  # last green r17
    "q_jpeg_color_stats_420",  # last green r17
    "q7_nation_volume",  # last green r17
    "q_approx_distinct",  # last green r17
    "q_approx_percentile",  # last green r17
    "q_table_profile",  # last green r17
    "q_ngram_lm_score",  # last green r17
    "q_ngram_lm_score_jm",  # last green r17
    "q2_min_cost_supplier",  # last green r17
    "q11_important_stock",  # last green r17
    "q12_late_shipments",  # last green r17
    "q20_part_promotion",  # last green r17
    "q_paragraph_dedup",  # last green r17
    "q_ngram_decontaminate",  # last green r17
    "q_chunk_documents",  # last green r17
    "q_budget_take",  # last green r17
    "q_heavy_hitters",  # last green r17
    "q_histogram",  # last green r17
    "q_robust_outliers",  # last green r17
    "q_fuzzy_link",  # last green r17
    "q_zorder_key",  # last green r17
    "q_mixture_plan",  # last green r17
    "q_validate_constraints",  # last green r17
    "q_sparse_doc_sim",  # last green r17
    "q_cms_heavy_hitters",  # last green r17
    "q_hll_group_distinct",  # last green r17
]





def _ordered_names() -> list[str]:
    first = [n for n in _CHECK_FIRST if n in _REGISTRY]
    seen = set(first)
    return first + [n for n in _REGISTRY if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered_names()
        if _REGISTRY[name].oracle is not None
    }


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {name: e.fn for name, e in _REGISTRY.items() if e.bench}
    out.update(_EXTRA_BENCH)
    return out


# ---------------------------------------------------------------------------
# Core relational operators (SURVEY.md §2.2-§2.8)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*)  AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (SURVEY §2.4): scan→filter→hash-agg.

    Scale: single shuffle on a 2-value grouping key; partial aggregation
    (map-side combine) reduces the shuffle to O(partitions * groups) rows.
    Filter + 7-column projection push into the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = dec2("l_extendedprice") * (one - frac2("l_discount"))
    charge = disc_price * (one + frac2("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= ts_lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(frac2("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate_s,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join fact → agg → top-k.

    Scale: customer(filtered) is small relative to lineitem → broadcast it;
    orders⋈lineitem is the one real shuffle. Top-k plans as
    TakeOrderedAndProject (no global sort materialization).
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts_lit("1998-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ts_lit("1996-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaling: no forced broadcast
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1).cast("decimal(3,2)") - frac2("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           count(*) AS n_items
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey   = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey   = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
    GROUP BY n.n_name
    """,
    bench=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (SURVEY §2.3 J2/J6): 6-way join with a composite
    condition (suppkey AND nationkey), dims broadcast.

    Scale: region/nation/supplier/customer are all dims → broadcast-hash
    joins; the only shuffle join is orders⋈lineitem on orderkey.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == F.col("c_custkey"))  # customer-sized: stats decide
        .join(
            s,  # SF-scaling: no forced broadcast
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                dec2("l_extendedprice")
                * (F.lit(1).cast("decimal(3,2)") - frac2("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_filter_project_rename",
    oracle="""
    SELECT l_orderkey AS order_key,
           l_linenumber AS line_number,
           l_quantity AS quantity,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS return_flag
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount > 0.04
      AND l_returnflag IS NOT NULL
    """,
)
def q_filter_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/P5 (SURVEY §2.2): predicate + projection + rename + scalar expr.

    Scale: no shuffle at all; predicates and the 6-column projection push
    down to the parquet scan (PushedFilters/ReadSchema).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                ts_lit("1996-01-01"), ts_lit("1996-12-31")
            )
            & (F.col("l_discount") > 0.04)
            & F.col("l_returnflag").isNotNull()
        )
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_quantity").alias("quantity"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.upper("l_returnflag").alias("return_flag"),
        )
    )


@register(
    "q_conjunctive_isin",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7, 8)
    """,
)
def q_conjunctive_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (SURVEY §2.1): conjunctive set-membership filter
    (reference: filtered_name_to_values_map, common.py:241-252).
    Scale: pure pushed-down scan filter; IN-lists compile to parquet filters.
    """
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_nationkey").isin(list(range(1, 9)))
    ).select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")


@register(
    "q_dedup_keep_first",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (SURVEY §2.1): keep-FIRST dedup by key via row_number window —
    the distributed replacement for the reference's in-memory seen-keys set
    (common.py:238-255), with (ts_us, event_id) as the deterministic order.

    Scale: one shuffle on the dedup key; no driver-side state. Skewed keys
    are handled by AQE; for extreme skew, pre-aggregate min_by per key.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts_us", "event_type")
    )


@register(
    "q_distinct_multi",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey
    FROM lineitem
    """,
)
def q_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 (SURVEY §2.4): multi-column DISTINCT.
    Scale: plans as partial+final hash aggregate — map-side combine shrinks
    the shuffle to unique rows per partition.
    """
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_suppkey"
    ).distinct()


@register(
    "q_key_table_tokens",
    oracle="""
    SELECT row_number() OVER (ORDER BY name) AS id, name
    FROM (SELECT DISTINCT unnest(string_split(p_type, ' ')) AS name FROM part)
    """,
)
def q_key_table_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+A4+E1 (SURVEY §2.5/§2.6): build a key table (id = 1-based rank of
    name in sorted order) from the distinct tokens of a comma/space list
    column — the Spark form of pimdb's _build_key_table_from_values
    (database.py:631-635) + set-union accumulate (database.py:604-617).

    Scale: distinct first (shuffle on token), then a single-partition
    row_number over the tiny distinct set — key tables are small by
    definition (genre ~30, profession ~50), so the 1-partition sort is fine.
    """
    p = load(spark, sf_dir, "part")
    names = p.select(F.explode(F.split("p_type", " ")).alias("name")).distinct()
    return names.select(
        F.row_number().over(Window.orderBy("name")).alias("id"), "name"
    )


@register(
    "q_left_join_coalesce",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           coalesce(agg.sum_qty, 0.0)  AS sum_qty,
           coalesce(agg.n_lines, 0)    AS n_lines
    FROM part p
    LEFT JOIN (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n_lines
      FROM lineitem GROUP BY l_partkey
    ) agg ON agg.l_partkey = p.p_partkey
    """,
)
def q_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+P4 (SURVEY §2.3): left outer join + NULL-default coalesce — the
    shape of build_title_table's ratings join (database.py:907-918) where
    unrated titles get average_rating=0.

    Scale: aggregate the fact side BEFORE the join (shrinks it to one row
    per key), then join; part is the smaller side at TPC-H ratios but the
    pre-agg is what keeps the join cheap.
    """
    p = load(spark, sf_dir, "part")
    agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return (
        p.join(agg, p.p_partkey == agg.l_partkey, "left")
        .select(
            "p_partkey",
            "p_name",
            F.coalesce("sum_qty", F.lit(0.0)).alias("sum_qty"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
    )


@register(
    "q_self_join_pairs",
    oracle="""
    SELECT o1.o_custkey AS custkey,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN o2.o_totalprice > o1.o_totalprice THEN 1 ELSE 0 END)
                AS BIGINT) AS n_increasing
    FROM orders o1
    JOIN orders o2 ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
    GROUP BY o1.o_custkey
    """,
)
def q_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (SURVEY §2.3): self-join with two aliases of the same table — the
    shape of build_episode_table's double self-join (database.py:944-980).

    Scale: self-join on o_custkey; per-key fan-out is bounded (orders per
    customer is a constant ~10 at any SF), so output grows linearly. Both
    sides share the same shuffle partitioning, which Spark reuses.
    """
    o = load(spark, sf_dir, "orders")
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o1.o_orderkey") < F.col("o2.o_orderkey")),
        )
        .groupBy(F.col("o1.o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("o2.o_totalprice") > F.col("o1.o_totalprice"), 1).otherwise(0)
            ).alias("n_increasing"),
        )
    )


@register(
    "q_composite_key_join",
    oracle="""
    SELECT l1.l_orderkey AS orderkey,
           l1.l_linenumber AS linenumber,
           l1.l_extendedprice AS price,
           l2.l_extendedprice AS next_price
    FROM lineitem l1
    JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l2.l_linenumber = l1.l_linenumber + 1
    """,
)
def q_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (SURVEY §2.3): composite-key equi-join (multi-condition ON) — the
    shape of build_title_alias_to_title_alias_type_table's
    (titleId AND ordering) join (database.py:1085-1088).

    Scale: both sides hash-partition on l_orderkey only (the equi part);
    the +1 arithmetic rides along as a join condition, no extra shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l2.l_linenumber") == F.col("l1.l_linenumber") + 1),
    ).select(
        F.col("l1.l_orderkey").alias("orderkey"),
        F.col("l1.l_linenumber").alias("linenumber"),
        F.col("l1.l_extendedprice").alias("price"),
        F.col("l2.l_extendedprice").alias("next_price"),
    )


@register(
    "q_multiway_distinct",
    oracle="""
    SELECT DISTINCT r.r_name, n.n_name, o.o_orderpriority, l.l_returnflag
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    """,
)
def q_multiway_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 (SURVEY §2.3): 5-way join then DISTINCT — the shape of
    build_participation_to_character_table (database.py:765-811).

    Scale: dims broadcast; distinct is a partial+final hash agg over a
    low-cardinality result.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaling: no forced broadcast
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "o_orderpriority", "l_returnflag")
        .distinct()
    )


@register(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS totalprice,
           CAST(o_orderdate AS VARCHAR) AS orderdate_s
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 (SURVEY §2.5): ORDER BY + LIMIT top-k.
    Scale: Catalyst plans TakeOrderedAndProject — per-partition heaps, no
    global sort; deterministic via the o_orderkey tiebreak.
    """
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderdate").cast("string").alias("orderdate_s"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(15)
    )


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 window functions: per-group top-N via row_number.
    Scale: one shuffle on o_custkey; Spark 3.5+/4.x inserts a
    WindowGroupLimit (partial top-k before the shuffle) for rank filters.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            "rnk",
        )
    )


@register(
    "q_count_star",
    oracle="SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders FROM lineitem",
)
def q_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (SURVEY §2.4): scalar counts (table_count / check_table_count,
    database.py:398-401,925-935).  Scale: count(*) reads parquet row-group
    metadata only when no filter is present."""
    return load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "q_set_ops",
    oracle="""
    SELECT 'union_except' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations in one tagged result: UNION (distinct) then
    EXCEPT, plus INTERSECT (distinct, plans as a left-semi hash join over
    distincts).  Scale: each set op is a hash-based shuffle on the single
    key column.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    ue = a.union(b).distinct().exceptAll(f.distinct())
    open_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    ix = a.intersect(open_cust)
    return ue.select(F.lit("union_except").alias("op"), "c_custkey").unionByName(
        ix.select(F.lit("intersect").alias("op"), "c_custkey")
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (SURVEY §2.6): JSON string column parsed in-engine — the Spark
    form of pimdb's json.loads over TitlePrincipals.characters
    (database.py:715-728), as a built-in expression, not a UDF.
    Scale: get_json_object is JVM-side codegen; no Python boundary.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "q_sql_passthrough",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING count(*) > 2
    """,
)
def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 query surface: arbitrary SQL text over registered views —
    pimdb's `query` verb (command.py:223-237) becomes spark.sql over temp
    views. Scale: identical plan to the DataFrame form; Catalyst parses,
    optimizes, broadcasts nation."""
    for t in ("customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        HAVING count(*) > 2
        """
    )

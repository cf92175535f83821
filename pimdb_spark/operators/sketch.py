"""Count-min sketch: fixed-memory frequency estimation, engine-portable
and exactly deterministic — the frequency-domain sibling of the
membership bloom (operators/membership.py).

A CMS answers "about how many times has x occurred" with d x w integer
counters: item x increments counter (j, h_j(x)) for each of d hash rows,
and the estimate is the MINIMUM over the d counters — always >= the true
count (collisions only ever add), with the classic (eps, delta)
guarantee eps ~ e/w overestimate mass at confidence 1 - e^-d.  It is the
standard pre-pass for heavy-hitter candidate generation when the exact
per-key groupBy (operators/profile.heavy_hitters) is too wide to hold:
the sketch is d x w cells whatever the key cardinality.

Portability: hash positions are the house md5-prefix integers (salted
"j:item"), counters are exact BIGINT sums (associative, order-free — no
float discipline), and estimation is an unrolled min over d codegen map
lookups (the bloom_probe lesson: HOF lambdas run interpreted, so d stays
a plan-time constant and every md5 lives in WholeStageCodegen).

Streaming note: counter sums are associative/commutative but NOT
idempotent — a CMS streams exactly like any streaming SUM (bounded d x w
group state, complete-mode output) under an exactly-once source; replays
double-count, the same contract as streaming/linalg.gram_matrix_stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_pos(item: Column, j: Column | int, width: int) -> Column:
    jj = F.lit(j) if isinstance(j, int) else j
    h = F.conv(
        F.substring(
            F.md5(F.concat(jj.cast("string"), F.lit(":"), item)), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(width)


def cms_build(
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d x w counter table: (row INT, col BIGINT, cnt BIGINT).
    Only non-zero cells appear (absent cell == 0).

    One shuffle: the (row, col) groupBy, whose map-side partial combine
    caps each task's output at d x w rows regardless of item count —
    the bloom_build shape with sums instead of ORs.  ``weight_col``
    (optional) makes it a weighted sketch (e.g. token counts)."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("bigint")
    fanned = items.select(
        F.col(item_col).alias("_it"),
        w.alias("_w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("_j"),
    )
    return (
        fanned.select(
            F.col("_j").cast("int").alias("row"),
            _cms_pos(F.col("_it"), F.col("_j"), width).alias("col"),
            "_w",
        )
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    queries: DataFrame,
    cms: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    out_col: str = "est",
) -> DataFrame:
    """Append ``out_col``: the CMS frequency estimate (min over the d
    counters), always >= the true count.

    Plan shape: the counter table collapses to a ONE-ROW broadcast map
    keyed by row * width + col (<= d x w entries), and every query row
    takes its d lookups as UNROLLED codegen expressions — shuffle-free
    estimation, no HOF, no join (the bloom_probe pattern and its
    measured reasoning)."""
    cms_map = cms.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("row").cast("bigint") * width + F.col("col")).alias(
                        "k"
                    ),
                    F.col("cnt").alias("v"),
                )
            )
        ).alias("_cm")
    )
    pos_cols = [
        (_cms_pos(F.col(item_col), j, width) + F.lit(j * width)).alias(
            f"_k{j}"
        )
        for j in range(depth)
    ]
    est = F.least(
        *[
            F.coalesce(
                F.element_at(F.col("_cm"), F.col(f"_k{j}")),
                F.lit(0).cast("bigint"),
            )
            for j in range(depth)
        ]
    )
    return (
        queries.crossJoin(F.broadcast(cms_map))
        .select(*queries.columns, "_cm", *pos_cols)
        .select(*queries.columns, est.alias(out_col))
    )


def cms_heavy_hitter_candidates(
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    min_est: int = 10,
) -> DataFrame:
    """Heavy-hitter candidate generation: distinct items whose CMS
    estimate clears ``min_est``.  NO FALSE NEGATIVES (estimates never
    undercount), so the exact verdict needs no data beyond the
    candidates.  Output: (item, est, exact, is_heavy) with exact the
    true count and is_heavy the exact verdict.

    ONE corpus pass, ONE item-keyed exchange, ZERO joins: enumerating
    the distinct items (this operator's declared output domain) already
    pays full-vocabulary per-key state, so the exact counts ride that
    same groupBy for one extra BIGINT per key, the weighted sketch
    builds FROM the per-item counts (BIGINT sums are associative — the
    cell counters are bit-identical to the per-occurrence build, over
    |vocab| x d fan-out rows instead of |stream| x d), and estimation
    stays the shuffle-free one-row-broadcast map projection.  The
    previous form scanned the stream three times (sketch, distinct,
    candidate-only exact pass) and re-attached the exact counts through
    two joins; ReusedExchange covers the count groupBy's two consumers
    here, so nothing is evaluated twice."""
    counts = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("exact"))
    sk = cms_build(counts, item_col, width, depth, weight_col="exact")
    return (
        cms_estimate(counts, sk, item_col, width, depth)
        .filter(F.col("est") >= min_est)
        .select(
            item_col,
            "est",
            "exact",
            (F.col("exact") >= min_est).alias("is_heavy"),
        )
    )


# -- HyperLogLog ------------------------------------------------------------

HLL_BUCKETS = 64  # p = 6 bucket bits out of the 32-bit md5 prefix
_HLL_LOW_BITS = 26
_HLL_MAX_RHO = _HLL_LOW_BITS + 1


def hll_registers(items: DataFrame, item_col: str) -> DataFrame:
    """HyperLogLog register table: (bucket INT, register INT) over the
    values of ``item_col`` — the cardinality member of the sketch trio
    (bloom = membership via OR, CMS = frequency via SUM, HLL =
    cardinality via MAX).

    Register update is MAX of the first-one-bit rank — associative,
    commutative, and IDEMPOTENT like the bloom's OR: duplicates and
    replays cannot change a register, so the sketch streams with no
    dedup state and no exactly-once requirement (the bloom contract, not
    the CMS one).

    Portability: the 32-bit md5-prefix hash splits into 6 bucket bits
    (h div 2^26) and 26 rank bits; rank = 27 - bitlength(low), with
    bitlength computed as length(bin(x)) — `bin` exists with identical
    semantics in Spark and DuckDB, so both engines build the IDENTICAL
    register table.  Absent buckets mean register 0.

    Scale: one map-side-combined groupBy capped at 64 rows per task —
    the smallest bounded-aggregate shape in the repo."""
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    low = h % F.lit(2**_HLL_LOW_BITS)
    rho = (
        F.when(low == 0, F.lit(_HLL_MAX_RHO))
        .otherwise(F.lit(_HLL_MAX_RHO) - F.length(F.bin(low)))
        .cast("int")
    )
    return (
        items.select(
            (h / F.lit(2**_HLL_LOW_BITS)).cast("bigint").cast("int").alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy("bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row raw HyperLogLog estimate from a register table:
    (m, n_present, raw_estimate) with

        raw_estimate = alpha_m * m^2 / (sum over ALL m buckets of 2^-M)

    where absent buckets contribute 2^0 = 1.  EVERY arithmetic step is
    engine-exact by construction: 2^-M = 1 / (1 << M) is a dyadic
    rational exactly representable in double, the <= m-term sum of such
    terms is exact in ANY order (m * 2^26 fits far inside the 53-bit
    mantissa), alpha_m is spelled as the same literal expression
    0.7213 / (1 + 1.079 / m) on both engines, and the final multiply /
    divide are single correctly-rounded IEEE ops — no pow, no ln, no
    fold discipline.  The small-range (linear-counting) correction needs
    ln and is deliberately NOT applied here; callers compare
    raw_estimate against exact counts with the documented HLL error
    ~ 1.04 / sqrt(m) (~13%% at m = 64).

    An EMPTY register table (zero items seen) is a defined input, not an
    error: sum() over zero rows is NULL, which the coalesce pins to 0.0
    so the estimate is the all-zero-registers constant
    alpha_m * m^2 / m = alpha_m * m (~45.1 at m = 64, the raw formula's
    documented zero-cardinality bias without the linear-counting
    correction) — never NULL."""
    m = HLL_BUCKETS
    return registers.agg(
        F.lit(m).alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.expr(
            f"(0.7213D / (1.0D + 1.079D / {m})) * {m}D * {m}D / "
            f"(coalesce(sum(1.0D / CAST(shiftleft(CAST(1 AS BIGINT), register)"
            f" AS DOUBLE)), 0.0D)"
            f" + CAST({m} - count(1) AS DOUBLE))"
        ).alias("raw_estimate"),
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS counter tables cell-wise (sum) — sketches built with the
    SAME (width, depth) over different slices (partitions, days,
    sources) combine into the sketch of the union stream: the mergeable-
    summary property that makes sketches the distributed-systems tool
    they are.  Exact BIGINT sums; output stays <= d x w rows."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge HLL register tables bucket-wise (max) — the union-
    cardinality sketch: merging per-slice sketches gives EXACTLY the
    sketch of the union stream (max is idempotent, so overlapping
    slices never double-count — the property sums lack).  Output stays
    <= m rows."""
    out = register_tables[0]
    for s in register_tables[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))


def hll_group_estimate(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Per-group HyperLogLog cardinality — the at-scale form of
    ``SELECT g, count(DISTINCT x) GROUP BY g`` when the distinct sets
    are too large to shuffle raw: registers aggregate per (group,
    bucket), then each group's raw estimate reduces from its <= m
    registers.  Output: (group, n_present, raw_estimate).

    Every step keeps the bit-exactness of hll_estimate (dyadic 2^-M
    terms, exact any-order sums, no pow/ln), so the per-group estimates
    are engine-identical and the whole thing is two bounded groupBys:
    the register aggregation caps at |groups| x m rows per task
    map-side, and the reduce is m rows per group."""
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    low = h % F.lit(2**_HLL_LOW_BITS)
    rho = (
        F.when(low == 0, F.lit(_HLL_MAX_RHO))
        .otherwise(F.lit(_HLL_MAX_RHO) - F.length(F.bin(low)))
        .cast("int")
    )
    m = HLL_BUCKETS
    regs = (
        items.select(
            F.col(group_col).alias("grp"),
            (h / F.lit(2**_HLL_LOW_BITS)).cast("bigint").cast("int").alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("_rho").alias("register"))
    )
    return regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.expr(
            f"(0.7213D / (1.0D + 1.079D / {m})) * {m}D * {m}D / "
            f"(sum(1.0D / CAST(shiftleft(CAST(1 AS BIGINT), register) AS DOUBLE))"
            f" + CAST({m} - count(1) AS DOUBLE))"
        ).alias("raw_estimate"),
    )


# ---------------------------------------------------------------------------
# Exponential-histogram quantile sketch — the DISTRIBUTION member of the
# sketch family (bloom = membership/OR, CMS = frequency/SUM, HLL =
# cardinality/MAX, EH = quantiles/SUM).  Appended self-contained (the
# trio above is byte-untouched).

EH_SUB_BITS = 3  # sub-buckets per octave; relative error <= 2^-3 = 12.5%


def eh_buckets(
    items: DataFrame, value_col: str, sub_bits: int = EH_SUB_BITS
) -> DataFrame:
    """Exponential-histogram bucket table over POSITIVE BIGINT values:
    (bkey BIGINT, lo BIGINT, cnt BIGINT), where a value v with
    bitlength b falls in the bucket keyed by its top (1 + sub_bits)
    bits s at octave b — bkey = b * 2^(sub_bits+1) + s — and `lo` is the
    bucket's smallest member (s back-shifted).  Bucket width over lo is
    <= 2^-sub_bits, which bounds the quantile estimate's relative error;
    values below 2^(sub_bits+1) get singleton buckets (exact).

    The sketch is the standard fixed-memory quantile pre-pass (the
    deterministic engine-portable stand-in for approx_percentile /
    t-digest, whose randomized internals can never be oracle-exact):
    <= 64 octaves x 2^sub_bits sub-buckets = a few hundred cells
    whatever the row count.

    Portability: bitlength = length(bin(v)) (`bin` zero-pad-free in
    both engines, the HLL trick); the top-bits slice is one variable
    shiftright (SQL form — the python F.shiftleft wrapper takes only
    literal shifts); counts are exact BIGINT sums.

    Scale: ONE map-side-combined groupBy capped at the cell count per
    task — the CMS shape.  Sums are associative/commutative but not
    idempotent: merging follows the CMS contract (disjoint slices
    only), and the sketch streams exactly-once, not replay-safe.

    Values <= 0 and NULL are rejected loudly (the log-domain bucketing
    is undefined there; a silently-admitted NULL would inflate N and
    shift every rank); shift non-positive domains and filter NULLs
    before sketching."""
    v = F.col(value_col).cast("bigint")
    # when(v > 0) so NULL values fall to the raising branch too — the
    # inverse predicate when(v <= 0) is NULL for NULL v and would pass
    # the row through as a silent (NULL, NULL) bucket
    checked = F.when(v > 0, v).otherwise(F.raise_error(
        F.concat(F.lit("eh_buckets: value must be positive, got "),
                 F.coalesce(v.cast("string"), F.lit("NULL")))))
    items = items.select(checked.alias("_v"))
    bl = F.length(F.bin(F.col("_v"))).cast("int")
    width = sub_bits + 1
    keyed = items.select(
        F.col("_v"),
        bl.alias("_bl"),
        F.expr(f"shiftright(_v, greatest(length(bin(_v)) - {width}, 0))")
        .cast("bigint")
        .alias("_s"),
    ).select(
        (F.col("_bl").cast("bigint") * F.lit(2 ** width) + F.col("_s"))
        .alias("bkey"),
        F.expr(
            f"shiftleft(shiftright(_v, greatest(length(bin(_v)) - {width}, 0)),"
            f" greatest(length(bin(_v)) - {width}, 0))"
        ).cast("bigint").alias("lo"),
    )
    return keyed.groupBy("bkey", "lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def eh_merge(*sketches: DataFrame) -> DataFrame:
    """Merge EH bucket tables cell-wise (sum) — same contract as
    cms_merge: sketches over DISJOINT slices combine into the sketch of
    the union stream; overlapping slices double-count."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bkey", "lo").agg(F.sum("cnt").alias("cnt"))


def eh_quantiles(
    buckets: DataFrame, quantiles_bp: list[int]
) -> DataFrame:
    """Quantile estimates from an EH bucket table: for each requested
    quantile q (in basis points, e.g. 5000 / 9000 / 9900), the `lo` of
    the first bucket (in value order) whose cumulative count reaches
    rank ceil(q * N) — the standard sketch readout, and INTEGER-EXACT
    end to end: rank = (q_bp * N + 9999) div 10000 is one BIGINT
    expression, the cumulative walk is a window sum over the bounded
    bucket table, and the estimate is the bucket's exact BIGINT lower
    bound (true value < est * (1 + 2^-sub_bits) by construction).

    Output: (q_bp INT, rank BIGINT, est BIGINT), one row per requested
    quantile.  An EMPTY sketch yields zero rows (no distribution — the
    documented contract; callers LEFT JOIN if they need NULL rows).

    Scale: everything after the sketch is bounded by the cell count —
    the single-partition window over <= a few hundred rows is the
    bounded-aggregate tail, not a data-sized sort."""
    from pyspark.sql import Window

    w = Window.orderBy("bkey").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select(
        "bkey", "lo", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    total = buckets.agg(F.sum("cnt").alias("n"))
    qs = F.explode(
        F.array(*[F.lit(q).cast("int") for q in quantiles_bp])
    ).alias("q_bp")
    targets = total.select(qs, F.col("n")).select(
        "q_bp",
        F.expr("CAST((CAST(q_bp AS BIGINT) * n + 9999) div 10000 AS BIGINT)")
        .alias("rank"),
    )
    hit = (
        cum.join(F.broadcast(targets), F.col("cum") >= F.col("rank"))
        .groupBy("q_bp", "rank")
        .agg(F.min("lo").alias("est"))
    )
    return hit.select("q_bp", "rank", "est")


def eh_group_buckets(
    items: DataFrame,
    group_col: str,
    value_col: str,
    sub_bits: int = EH_SUB_BITS,
) -> DataFrame:
    """Per-group exponential-histogram bucket table: (grp, bkey, lo,
    cnt) — the GROUPED form of eh_buckets, exactly as hll_group_estimate
    is the grouped HLL: the at-scale shape of "percentile per source /
    language / day" when a full sort per group is too wide.  Same
    derivation, same portability, same loud non-positive reject; the
    single map-side-combined groupBy caps at |groups| x cells rows per
    task."""
    v = F.col(value_col).cast("bigint")
    # when(v > 0): NULLs fall to the raising branch (see eh_buckets)
    checked = F.when(v > 0, v).otherwise(F.raise_error(
        F.concat(F.lit("eh_group_buckets: value must be positive, got "),
                 F.coalesce(v.cast("string"), F.lit("NULL")))))
    width = sub_bits + 1
    keyed = items.select(
        F.col(group_col).alias("grp"), checked.alias("_v")
    ).select(
        "grp",
        (F.length(F.bin(F.col("_v"))).cast("bigint") * F.lit(2 ** width)
         + F.expr(f"shiftright(_v, greatest(length(bin(_v)) - {width}, 0))"))
        .alias("bkey"),
        F.expr(
            f"shiftleft(shiftright(_v, greatest(length(bin(_v)) - {width}, 0)),"
            f" greatest(length(bin(_v)) - {width}, 0))"
        ).cast("bigint").alias("lo"),
    )
    return keyed.groupBy("grp", "bkey", "lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def eh_group_quantiles(
    buckets: DataFrame, quantiles_bp: list[int]
) -> DataFrame:
    """Per-group quantile readout from an eh_group_buckets table:
    (grp, q_bp, rank, est), one row per group per requested quantile —
    the same integer-exact walk as eh_quantiles with every step keyed by
    group.  The cum >= rank pick rides as a post-filter on the grp HASH
    equi-join (never a nested loop over data), and both sides are
    bounded: |groups| x cells and |groups| x |quantiles|."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("bkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = buckets.select(
        "grp", "bkey", "lo", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    totals = buckets.groupBy("grp").agg(F.sum("cnt").alias("n"))
    qs = F.explode(
        F.array(*[F.lit(q).cast("int") for q in quantiles_bp])
    ).alias("q_bp")
    targets = totals.select("grp", qs, "n").select(
        "grp",
        "q_bp",
        F.expr("CAST((CAST(q_bp AS BIGINT) * n + 9999) div 10000 AS BIGINT)")
        .alias("rank"),
    )
    return (
        cum.join(F.broadcast(targets), "grp")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("grp", "q_bp", "rank")
        .agg(F.min("lo").alias("est"))
        .select("grp", "q_bp", "rank", "est")
    )

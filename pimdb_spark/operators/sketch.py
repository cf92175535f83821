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
    undercount), so the exact verification groupBy can run over the
    candidates alone — the bloom_decontaminate economics applied to
    frequency.  Output: (item, est, exact, is_heavy) with exact the true
    count over the candidate set and is_heavy the exact verdict."""
    sk = cms_build(items, item_col, width, depth)
    cand = cms_estimate(
        items.select(F.col(item_col)).distinct(), sk, item_col, width, depth
    ).filter(F.col("est") >= min_est)
    exact = (
        items.join(F.broadcast(cand.select(item_col)), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("exact"))
    )
    return (
        cand.join(exact, item_col)
        .select(
            item_col,
            "est",
            "exact",
            (F.col("exact") >= min_est).alias("is_heavy"),
        )
    )

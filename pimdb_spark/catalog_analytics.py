"""Catalog entries for the event-log analytics and graph operator families
(operators/analytics.py, operators/graph.py): cohort retention, last-touch
attribution, session path mining, co-occurrence edge extraction, and
multi-source BFS hop counts — all over the events table, all with exact
DuckDB oracles (integer event-time arithmetic; the single retention ratio
is one IEEE division of exact integers).

Scale notes live on the operators; the catalog's parameter choices are
sized so the sf0.01 gate exercises the interesting paths (the bucket cap
actually drops flood buckets, BFS needs multiple hops, attribution has
both matched and NULL rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register
from pimdb_spark.operators.analytics import (
    WEEK_US,
    cohort_retention,
    funnel_steps,
    last_touch_attribution,
    session_paths,
)
from pimdb_spark.operators.graph import (
    bfs_hops,
    co_occurrence_edges,
    label_propagation,
    pagerank,
    triangle_count,
)

HOUR_US = 3_600_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000
HORIZON_US = 3 * 24 * 3_600_000_000  # 3-day attribution horizon


@register(
    "q_cohort_retention",
    oracle=f"""
    WITH activity AS (
      SELECT DISTINCT user_id AS u, epoch_us(ts) // {WEEK_US} AS period
      FROM events
    ), cohorts AS (
      SELECT u, min(period) AS cohort_period FROM activity GROUP BY u
    ), cells AS (
      SELECT cohort_period, period - cohort_period AS period_offset,
             count(DISTINCT a.u) AS n_active
      FROM activity a JOIN cohorts c ON a.u = c.u
      GROUP BY 1, 2
    ), sizes AS (
      SELECT cohort_period, count(DISTINCT u) AS cohort_size
      FROM cohorts GROUP BY 1
    )
    SELECT cohort_period, period_offset, n_active, cohort_size,
           CAST(n_active AS DOUBLE) / cohort_size AS retention
    FROM cells JOIN sizes USING (cohort_period)
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (operators/analytics.
    cohort_retention): users cohorted by first-active week; each
    (cohort, offset) cell counts distinct users active that many weeks
    later plus the retention ratio (ONE IEEE division of exact integers —
    engine-exact, no rounding needed).

    Scale: activity reduces to distinct (user, week) before any join;
    everything after is O(users) then O(weeks^2); cohort sizes attach via
    an O(weeks)-row broadcast."""
    ev = load(spark, sf_dir, "events")
    return cohort_retention(ev, user_col="user_id", ts_col="ts_us", period_us=WEEK_US)


@register(
    "q_last_touch",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
    ), carried AS (
      SELECT event_id, user_id, ts_us, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN struct_pack(ts := ts_us, id := event_id,
                                              typ := event_type)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
      FROM e
    )
    SELECT event_id AS conversion_id, user_id, ts_us AS conv_ts_us,
           CASE WHEN lt IS NOT NULL AND lt.ts >= ts_us - {HORIZON_US}
                THEN lt.id END AS touch_event_id,
           CASE WHEN lt IS NOT NULL AND lt.ts >= ts_us - {HORIZON_US}
                THEN lt.typ END AS touch_type,
           CASE WHEN lt IS NOT NULL AND lt.ts >= ts_us - {HORIZON_US}
                THEN ts_us - lt.ts END AS age_us
    FROM carried WHERE event_type = 'purchase'
    """,
)
def q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (operators/analytics.
    last_touch_attribution): every purchase is attributed to the most
    recent strictly-preceding click/view by the same user within 3 days;
    unattributed purchases keep NULL columns so the row count equals the
    purchase count.  The carried touch is one struct — id/type/age always
    come from the same touch row; ties on ts break on event_id.

    Scale: one window exchange on user_id over a 4-column projection; no
    join."""
    ev = load(spark, sf_dir, "events")
    return last_touch_attribution(
        ev,
        conversion_type="purchase",
        touch_types=["click", "view"],
        horizon_us=HORIZON_US,
        user_col="user_id",
        ts_col="ts_us",
        id_col="event_id",
        type_col="event_type",
    )


@register(
    "q_session_paths",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT user_id, ts_us, event_id, event_type,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id, ts_us, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), ranked AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts_us, event_id) AS rn
      FROM sessions
    ), paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3 GROUP BY 1, 2
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 25
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 session opening paths (operators/analytics.session_paths):
    30-min-gap sessions (the q_sessionize rule), summarized by their first
    3 event types joined with '>', ranked by session count with ties
    broken on the path string (deterministic top-k).

    Scale: session flags, ids, and in-session row numbers all ride ONE
    user_id exchange; the path count groups on at most |types|^3 keys and
    finishes as TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events")
    return session_paths(
        ev,
        gap_us=SESSION_GAP_US,
        k=25,
        path_len=3,
        user_col="user_id",
        ts_col="ts_us",
        id_col="event_id",
        type_col="event_type",
    )


# Shared co-occurrence SQL: distinct (event_type, hour, user) triples, flood
# buckets (> cap users) dropped, then a within-bucket self-join src < dst.
def _edges_cte(where: str, cap: int) -> str:
    return f"""
    keyed AS (
      SELECT DISTINCT event_type AS k0,
             epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS k1,
             user_id AS node
      FROM events {where}
    ), ok AS (
      SELECT k0, k1 FROM keyed GROUP BY k0, k1 HAVING count(*) <= {cap}
    ), capped AS (
      SELECT keyed.* FROM keyed JOIN ok USING (k0, k1)
    ), edges AS (
      SELECT DISTINCT a.node AS src, b.node AS dst
      FROM capped a JOIN capped b
        ON a.k0 = b.k0 AND a.k1 = b.k1 AND a.node < b.node
    )"""


@register(
    "q_co_occurrence_edges",
    oracle=f"""
    WITH {_edges_cte("", 8)}
    SELECT src, dst FROM edges
    """,
)
def q_co_occurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User co-occurrence edges (operators/graph.co_occurrence_edges):
    undirected (src < dst) edges between users sharing an
    (event_type, hour) bucket, with buckets over 8 users dropped BEFORE
    the self-join — the flood cap that keeps an adversarial mega-bucket
    (a bot item every user touches) from going m².

    Scale: distinct first, then candidate pairs are O(buckets x cap²);
    both joins are hash equi-joins on the bucket key."""
    ev = load(spark, sf_dir, "events").withColumn(
        "hour_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    return co_occurrence_edges(
        ev, ["event_type", "hour_us"], node_col="user_id", max_bucket_size=8
    )


@register(
    "q_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_edges_cte("WHERE event_type = 'purchase'", 8)},
    sym AS (
      SELECT src AS s, dst AS d FROM edges
      UNION ALL
      SELECT dst, src FROM edges
    ),
    walk(node, hop) AS (
      SELECT DISTINCT user_id AS node, 0 AS hop FROM events
      WHERE user_id % 20 = 0
      UNION
      SELECT sym.d, walk.hop + 1 FROM walk JOIN sym ON walk.node = sym.s
      WHERE walk.hop < 3
    )
    SELECT node, CAST(min(hop) AS INTEGER) AS hop FROM walk GROUP BY node
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop counts (operators/graph.bfs_hops) over the
    purchase co-occurrence graph: seeds are users with user_id % 20 = 0,
    hops capped at 3.  First visit is the minimum hop, so the iterative
    Spark frontier and the oracle's recursive-CTE min(hop) agree exactly.

    Scale: <= 3 rounds of (frontier ⋈ edges) hash joins + anti-join
    against visited, lineage cut per round with localCheckpoint; frames
    carry (node, hop) only."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").withColumn(
        "hour_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    edges = co_occurrence_edges(
        purchases, ["event_type", "hour_us"], node_col="user_id", max_bucket_size=8
    )
    seeds = ev.filter(F.col("user_id") % 20 == 0).select("user_id").distinct()
    return bfs_hops(edges, seeds, max_hops=3, seed_col="user_id")


@register(
    "q_funnel_steps",
    bench=True,
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts, event_type AS typ FROM events
    ), s1 AS (
      SELECT user_id, min(CASE WHEN typ = 'view' THEN ts END) AS t1
      FROM e GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, max(s1.t1) AS t1,
             min(CASE WHEN typ = 'click' AND s1.t1 IS NOT NULL
                       AND ts > s1.t1 THEN ts END) AS t2
      FROM e JOIN s1 USING (user_id) GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, max(s2.t1) AS t1, max(s2.t2) AS t2,
             min(CASE WHEN typ = 'purchase' AND s2.t2 IS NOT NULL
                       AND ts > s2.t2 THEN ts END) AS t3
      FROM e JOIN s2 USING (user_id) GROUP BY e.user_id
    )
    SELECT user_id, t1, t2, t3,
           CAST((CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
             AS steps_reached
    FROM s3
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase (operators/analytics.
    funnel_steps): per user, the earliest time each step completes
    strictly after the previous step; NULL from the first missed step on;
    steps_reached counts completions.  Pure integer event-time math.

    Scale: one aggregation per step, all keyed on user_id — a single hash
    partitioning serves the chain; between-step state is one row per
    user."""
    ev = load(spark, sf_dir, "events")
    return funnel_steps(
        ev,
        steps=["view", "click", "purchase"],
        user_col="user_id",
        ts_col="ts_us",
        type_col="event_type",
    )


@register(
    "q_pagerank",
    bench=True,
    oracle=f"""
    WITH {_edges_cte("WHERE event_type = 'purchase'", 8)},
    sym AS (
      SELECT src AS s, dst AS d FROM edges
      UNION ALL
      SELECT dst, src FROM edges
    ), deg AS (
      SELECT s, count(*) AS deg FROM sym GROUP BY s
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM deg
    ), r0 AS (
      SELECT deg.s AS node, deg.deg, CAST(1.0 AS DOUBLE) / nn.n AS rank
      FROM deg, nn
    ), i1 AS (
      SELECT sym.d AS node,
             list_reduce(list(r0.rank / r0.deg ORDER BY sym.s),
                         (x, y) -> x + y) AS in_sum
      FROM sym JOIN r0 ON sym.s = r0.node GROUP BY sym.d
    ), r1 AS (
      SELECT r0.node, r0.deg,
             CAST(0.5 AS DOUBLE) / nn.n + CAST(0.5 AS DOUBLE) * i1.in_sum AS rank
      FROM r0 JOIN i1 USING (node), nn
    ), i2 AS (
      SELECT sym.d AS node,
             list_reduce(list(r1.rank / r1.deg ORDER BY sym.s),
                         (x, y) -> x + y) AS in_sum
      FROM sym JOIN r1 ON sym.s = r1.node GROUP BY sym.d
    ), r2 AS (
      SELECT r1.node,
             CAST(0.5 AS DOUBLE) / nn.n + CAST(0.5 AS DOUBLE) * i2.in_sum AS rank
      FROM r1 JOIN i2 USING (node), nn
    )
    SELECT node, rank FROM r2
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power iterations of PageRank (operators/graph.pagerank,
    damping 0.5 — an exactly-representable double, so (1-d) and d-scaling
    are exact on both engines) over the purchase co-occurrence graph.
    The oracle unrolls the SAME two iterations; contributions sum as an
    ordered fold over neighbors (the kmeans discipline), so an ITERATIVE
    float algorithm hash-matches to the last bit.

    Scale: one rank ⋈ edges equi-join + one destination groupBy per
    iteration, both on node ids; state is (node, deg, rank)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").withColumn(
        "hour_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    edges = co_occurrence_edges(
        purchases, ["event_type", "hour_us"], node_col="user_id", max_bucket_size=8
    )
    return pagerank(edges, n_iter=2, damping=0.5)


@register(
    "q_triangle_count",
    oracle=f"""
    WITH {_edges_cte("WHERE event_type = 'purchase'", 8)},
    degs AS (
      SELECT v, count(*) AS deg FROM (
        SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY v
    ), okv AS (
      SELECT v FROM degs WHERE deg <= 30
    ), ce AS (
      SELECT a.src, a.dst FROM edges a
      JOIN okv o1 ON a.src = o1.v JOIN okv o2 ON a.dst = o2.v
    ), tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM ce e1
      JOIN ce e2 ON e1.dst = e2.src
      JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ), corners AS (
      SELECT unnest([a, b, c]) AS node FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.triangle_count) over the
    purchase co-occurrence graph with a degree cap of 30: each triangle
    a<b<c is generated once as an (a,b)+(b,c) wedge closed by an (a,c)
    edge check — two hash equi-joins, wedge volume bounded by the cap.

    Scale: sum(deg^2) wedge cost with the cap as the dial; the corner
    explode is 3 rows per triangle."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").withColumn(
        "hour_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    edges = co_occurrence_edges(
        purchases, ["event_type", "hour_us"], node_col="user_id", max_bucket_size=8
    )
    return triangle_count(edges, max_degree=30)


@register(
    "q_linear_attribution",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
    ), conv AS (
      SELECT user_id, event_id AS conversion_id, ts_us AS conv_ts
      FROM e WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts,
             event_type AS touch_type
      FROM e WHERE event_type IN ('click', 'view')
    ), pairs AS (
      SELECT c.conversion_id, c.user_id, c.conv_ts, t.touch_event_id,
             t.touch_type, c.conv_ts - t.touch_ts AS age_us
      FROM conv c JOIN touch t
        ON c.user_id = t.user_id
       AND t.touch_ts >= c.conv_ts - {HORIZON_US}
       AND (t.touch_ts < c.conv_ts
            OR (t.touch_ts = c.conv_ts AND t.touch_event_id < c.conversion_id))
    ), counted AS (
      SELECT *, CAST(count(*) OVER (PARTITION BY conversion_id) AS BIGINT)
               AS n_touches
      FROM pairs
    )
    SELECT conversion_id, user_id, conv_ts AS conv_ts_us, touch_event_id,
           touch_type, age_us, n_touches,
           CAST(1.0 AS DOUBLE) / n_touches AS weight
    FROM counted
    UNION ALL
    SELECT c.conversion_id, c.user_id, c.conv_ts, NULL, NULL, NULL,
           CAST(0 AS BIGINT), NULL
    FROM conv c
    WHERE c.conversion_id NOT IN (SELECT conversion_id FROM pairs)
    """,
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (operators/analytics.
    linear_attribution): every purchase splits credit 1/n across all
    strictly-preceding click/view touches within 3 days; unattributed
    purchases emit one NULL row.  The weight is one IEEE division of
    exact integers.

    Scale: candidates from an equi-join on (user, horizon-width bucket)
    with a two-bucket probe (the range-join neighbor discipline) — never
    per-user all-pairs; one conversion-keyed window for the count."""
    ev = load(spark, sf_dir, "events")
    from pimdb_spark.operators.analytics import linear_attribution

    return linear_attribution(
        ev,
        conversion_type="purchase",
        touch_types=["click", "view"],
        horizon_us=HORIZON_US,
        user_col="user_id",
        ts_col="ts_us",
        id_col="event_id",
        type_col="event_type",
    )


@register(
    "q_label_propagation",
    bench=True,
    oracle=f"""
    WITH {_edges_cte("WHERE event_type = 'purchase'", 8)},
    sym AS (
      SELECT src AS s, dst AS d FROM edges
      UNION ALL
      SELECT dst, src FROM edges
    ), l0 AS (
      SELECT DISTINCT s AS node, s AS label FROM sym
    ), c1 AS (
      SELECT sym.d AS node, l0.label, count(*) AS cnt
      FROM sym JOIN l0 ON sym.s = l0.node GROUP BY 1, 2
    ), l1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label) AS rn
        FROM c1) WHERE rn = 1
    ), c2 AS (
      SELECT sym.d AS node, l1.label, count(*) AS cnt
      FROM sym JOIN l1 ON sym.s = l1.node GROUP BY 1, 2
    ), l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label) AS rn
        FROM c2) WHERE rn = 1
    )
    SELECT node, label FROM l2
    """,
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous rounds of label-propagation community detection
    (operators/graph.label_propagation — Raghavan et al. 2007) over the
    purchase co-occurrence graph: each node adopts its neighbors' most
    frequent label, ties to the smallest — fully integer, so the DuckDB
    oracle unrolls the identical rounds with no float contract at all.
    Completes the graph family: components (connectivity), BFS
    (distance), PageRank (centrality), triangles (clustering), LPA
    (community).

    Scale: per round one labels ⋈ edges equi-join, one (node, label)
    count, one per-node window argmax — all keyed on node ids; state is
    (node, label)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").withColumn(
        "hour_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    edges = co_occurrence_edges(
        purchases, ["event_type", "hour_us"], node_col="user_id", max_bucket_size=8
    )
    return label_propagation(edges, n_iter=2)

"""Unit tests for operators/analytics.py and operators/graph.py — hand-sized
frames with hand-computed expected outputs, covering the edge cases the
catalog's synthetic events can't pin down individually (self-attribution
exclusion, same-timestamp ties, horizon cutoffs, negative-epoch cohorts,
flood-bucket drop, multi-seed minimum hops, the seed-column contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pimdb_spark.operators.analytics import (
    cohort_retention,
    last_touch_attribution,
    session_paths,
)
from pimdb_spark.operators.graph import bfs_hops, co_occurrence_edges


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, event_type string"
    )


# ---------------------------------------------------------------- cohorts


def test_cohort_retention_matrix(spark):
    # period = 100 us; user 1 first active period 0, also period 1 and 2;
    # user 2 first active period 1, also period 2; user 3 only period 0.
    rows = [
        (1, 1, 10, "a"),
        (2, 1, 150, "a"),
        (3, 1, 250, "a"),
        (4, 2, 120, "a"),
        (5, 2, 260, "a"),
        (6, 3, 50, "a"),
    ]
    out = cohort_retention(_events(spark, rows), period_us=100)
    got = {
        (r.cohort_period, r.period_offset): (r.n_active, r.cohort_size, r.retention)
        for r in out.collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (0, 2): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
        (1, 1): (1, 1, 1.0),
    }


def test_cohort_retention_negative_epochs_floor(spark):
    # ts -50 must land in period -1 (floor), not period 0 (truncate): a
    # truncate-toward-zero would merge it with ts 50's period and report a
    # single double-width cohort.
    rows = [(1, 1, -50, "a"), (2, 2, 50, "a")]
    out = cohort_retention(_events(spark, rows), period_us=100)
    got = {(r.cohort_period, r.period_offset) for r in out.collect()}
    assert got == {(-1, 0), (0, 0)}


# ------------------------------------------------------------ attribution


def test_last_touch_basic_and_horizon(spark):
    rows = [
        (1, 1, 100, "click"),
        (2, 1, 200, "view"),
        (3, 1, 250, "purchase"),   # attributed to view@200
        (4, 2, 100, "click"),
        (5, 2, 5000, "purchase"),  # click too old for horizon 1000
        (6, 3, 300, "purchase"),   # no touch at all
    ]
    out = last_touch_attribution(
        _events(spark, rows), "purchase", ["click", "view"], horizon_us=1000
    )
    got = {r.conversion_id: (r.touch_event_id, r.touch_type, r.age_us) for r in out.collect()}
    assert got == {
        3: (2, "view", 50),
        5: (None, None, None),
        6: (None, None, None),
    }


def test_last_touch_never_self_attributes(spark):
    # conversion_type also in touch_types: the conversion must attribute to
    # the EARLIER purchase, never to itself (age 0).
    rows = [(1, 1, 100, "purchase"), (2, 1, 300, "purchase")]
    out = last_touch_attribution(
        _events(spark, rows), "purchase", ["purchase"], horizon_us=10_000
    )
    got = {r.conversion_id: (r.touch_event_id, r.age_us) for r in out.collect()}
    assert got == {1: (None, None), 2: (1, 200)}


def test_last_touch_same_timestamp_tie_rule(spark):
    # Same ts: a touch with SMALLER event_id is "before" the conversion and
    # counts; a touch with larger event_id does not.
    rows = [
        (1, 1, 100, "click"),
        (2, 1, 100, "purchase"),
        (9, 2, 100, "purchase"),
        (10, 2, 100, "click"),
    ]
    out = last_touch_attribution(
        _events(spark, rows), "purchase", ["click"], horizon_us=1000
    )
    got = {r.conversion_id: r.touch_event_id for r in out.collect()}
    assert got == {2: 1, 9: None}


# ------------------------------------------------------------------ paths


def test_session_paths_topk(spark):
    # user 1: two sessions (gap 1000): [a,b,c,d] -> "a>b>c", [a,b] -> "a>b"
    # user 2: one session [a,b,c] -> "a>b>c"
    rows = [
        (1, 1, 100, "a"),
        (2, 1, 200, "b"),
        (3, 1, 300, "c"),
        (4, 1, 400, "d"),
        (5, 1, 5000, "a"),
        (6, 1, 5100, "b"),
        (7, 2, 100, "a"),
        (8, 2, 150, "b"),
        (9, 2, 200, "c"),
    ]
    out = session_paths(_events(spark, rows), gap_us=1000, k=10, path_len=3)
    assert [(r.path, r.n_sessions) for r in out.collect()] == [
        ("a>b>c", 2),
        ("a>b", 1),
    ]


# ------------------------------------------------------------------ graph


def _bucketed(spark, rows):
    return spark.createDataFrame(rows, "bucket string, user_id bigint")


def test_co_occurrence_edges_and_flood_cap(spark):
    rows = [
        ("x", 1), ("x", 2), ("x", 3),
        ("y", 3), ("y", 4),
        # flood bucket: 5 members > cap 4 -> contributes no edges
        ("z", 10), ("z", 11), ("z", 12), ("z", 13), ("z", 14),
        ("x", 1),  # duplicate membership must not duplicate edges
    ]
    out = co_occurrence_edges(
        _bucketed(spark, rows), ["bucket"], node_col="user_id", max_bucket_size=4
    )
    got = {(r.src, r.dst) for r in out.collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (3, 4)}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_bfs_hops_multi_seed_minimum(spark):
    # path graph 1-2-3-4-5 plus seed 5: node 3 is 2 hops from seed 1 and
    # 2 hops from seed 5; node 4 is 1 hop (from 5), NOT 3 (from 1).
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,), (5,)], "user_id bigint")
    out = bfs_hops(edges, seeds, max_hops=4, seed_col="user_id")
    got = {r.node: r.hop for r in out.collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_hops_max_hops_bound_and_undirected(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(4,)], "n bigint")
    out = bfs_hops(edges, seeds, max_hops=2)  # single column: no seed_col needed
    got = {r.node: r.hop for r in out.collect()}
    assert got == {4: 0, 3: 1, 2: 2}  # node 1 is 3 hops away: excluded


def test_bfs_hops_multicolumn_seeds_requires_seed_col(spark):
    edges = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1, "x")], "user_id bigint, note string")
    with pytest.raises(ValueError, match="seed_col"):
        bfs_hops(edges, seeds, max_hops=1)
    got = {
        r.node: r.hop
        for r in bfs_hops(edges, seeds, max_hops=1, seed_col="user_id").collect()
    }
    assert got == {1: 0, 2: 1}


def test_funnel_steps_ordered_semantics(spark):
    rows = [
        # user 1 completes A->B->C in order
        (1, 1, 100, "A"), (2, 1, 200, "B"), (3, 1, 300, "C"),
        # user 2 has B BEFORE A: step 2 must use the B AFTER A (none) -> t2 NULL
        (4, 2, 100, "B"), (5, 2, 200, "A"),
        # user 3: A then C then B then C -> t3 is the C after B (400), not 250
        (6, 3, 100, "A"), (7, 3, 250, "C"), (8, 3, 300, "B"), (9, 3, 400, "C"),
        # user 4: no step-1 event at all
        (10, 4, 100, "B"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, event_type string"
    )
    from pimdb_spark.operators.analytics import funnel_steps

    out = {r.user_id: (r.t1, r.t2, r.t3, r.steps_reached)
           for r in funnel_steps(df, ["A", "B", "C"]).collect()}
    assert out == {
        1: (100, 200, 300, 3),
        2: (200, None, None, 1),
        3: (100, 300, 400, 3),
        4: (None, None, None, 0),
    }


def test_pagerank_star_and_mass_conservation(spark):
    """Star graph 0-1, 0-2, 0-3: the hub must outrank the leaves, the
    three leaves tie exactly, and total rank mass stays 1."""
    from pimdb_spark.operators.graph import pagerank

    edges = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    ranks = {r.node: r.rank for r in pagerank(edges, n_iter=3, damping=0.5).collect()}
    assert set(ranks) == {0, 1, 2, 3}
    assert ranks[1] == ranks[2] == ranks[3]
    assert ranks[0] > ranks[1]
    assert abs(sum(ranks.values()) - 1.0) < 1e-12


def test_triangle_count_counts_and_degree_cap(spark):
    from pimdb_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4}: every node is on 3 triangles
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = {r.node: r.n_triangles for r in triangle_count(_edges(spark, k4)).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # cap 2 drops every K4 vertex (degree 3); the separate triangle
    # {10,11,12} (degree 2 each) survives
    both = k4 + [(10, 11), (10, 12), (11, 12)]
    capped = {r.node: r.n_triangles
              for r in triangle_count(_edges(spark, both), max_degree=2).collect()}
    assert capped == {10: 1, 11: 1, 12: 1}


def test_linear_attribution_splits_credit(spark):
    from pimdb_spark.operators.analytics import linear_attribution

    rows = [
        (1, 1, 100, "click"),
        (2, 1, 200, "view"),
        (3, 1, 250, "purchase"),    # two in-horizon touches -> 1/2 each
        (4, 2, 100, "click"),
        (5, 2, 5000, "purchase"),   # click outside horizon 1000 -> NULL row
        (6, 3, 100, "purchase"),    # no touches at all -> NULL row
    ]
    out = linear_attribution(
        _events(spark, rows), "purchase", ["click", "view"], horizon_us=1000
    ).collect()
    by_conv: dict = {}
    for r in out:
        by_conv.setdefault(r.conversion_id, []).append(r)
    touches3 = {(r.touch_event_id, r.weight, r.n_touches) for r in by_conv[3]}
    assert touches3 == {(1, 0.5, 2), (2, 0.5, 2)}
    assert sum(r.weight for r in by_conv[3]) == 1.0
    assert [(r.touch_event_id, r.weight) for r in by_conv[5]] == [(None, None)]
    assert [(r.touch_event_id, r.weight) for r in by_conv[6]] == [(None, None)]


def test_linear_attribution_bucket_boundary_and_ties(spark):
    """A touch just inside the horizon but in the PREVIOUS time bucket is
    still found (the two-bucket probe), and same-timestamp ties follow
    the strictly-preceding event-id rule."""
    from pimdb_spark.operators.analytics import linear_attribution

    h = 1000
    rows = [
        (1, 1, 950, "click"),        # bucket 0; conversion in bucket 1
        (2, 1, 1900, "purchase"),    # 950 >= 1900-1000 -> attributed
        (3, 2, 300, "purchase"),     # tie at same ts:
        (4, 2, 300, "click"),        # larger id -> NOT strictly preceding
        (5, 2, 300, "purchase"),     # click id 4 < 5 -> attributed
    ]
    out = linear_attribution(
        _events(spark, rows), "purchase", ["click"], horizon_us=h
    ).collect()
    got = {r.conversion_id: (r.touch_event_id, r.n_touches) for r in out}
    assert got[2] == (1, 1)
    assert got[3] == (None, 0)
    assert got[5] == (4, 1)

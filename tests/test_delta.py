"""Snapshot diff/merge (operators/delta.py): semantics on hand-built frames
plus plan-shape checks — diff must shuffle (key, digest) projections, never
the payload; merge must be a single anti-join."""

from __future__ import annotations

from pyspark.sql import Row

from pimdb_spark.operators import delta as D
from tests.test_plans import SF, plan_of, tree_nodes


def _frames(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10.0),   # unchanged
            Row(k=2, a="y", b=20.0),   # changed (b)
            Row(k=3, a=None, b=30.0),  # changed (a NULL -> '')
            Row(k=4, a="z", b=40.0),   # removed
            Row(k=6, a="", b=60.0),    # changed ('' -> NULL)
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10.0),
            Row(k=2, a="y", b=21.0),
            Row(k=3, a="", b=30.0),
            Row(k=5, a="w", b=50.0),   # added
            Row(k=6, a=None, b=60.0),
        ]
    )
    return old, new


def test_diff_classifies_and_distinguishes_null_from_empty(spark):
    old, new = _frames(spark)
    got = {
        r["k"]: r["status"]
        for r in D.snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added", 6: "changed"}


def test_merge_upserts_and_passes_through(spark):
    old, _ = _frames(spark)
    updates = spark.createDataFrame([Row(k=2, a="y2", b=99.0), Row(k=7, a="n", b=7.0)])
    got = {r["k"]: (r["a"], r["b"]) for r in D.snapshot_merge(old, updates, ["k"]).collect()}
    assert got[2] == ("y2", 99.0)          # overridden
    assert got[7] == ("n", 7.0)            # inserted
    assert got[1] == ("x", 10.0)           # untouched base row survives
    assert set(got) == {1, 2, 3, 4, 6, 7}


def test_diff_shuffles_digest_not_payload(spark):
    from pimdb_spark.catalog import load

    orders = load(spark, SF, "orders")
    plan = plan_of(
        D.snapshot_diff(
            orders, orders, ["o_orderkey"], ["o_totalprice", "o_orderpriority"]
        )
    )
    nodes = tree_nodes(plan)
    assert any(n.startswith("SortMergeJoin") or n.startswith("ShuffledHashJoin") for n in nodes)
    # each exchange carries only key + 32-char digest: the payload column
    # must be digested away before the shuffle
    for section in plan.split("Exchange")[1:]:
        args = section.split("\n")[0]
        assert "o_orderpriority" not in args


def test_merge_is_single_anti_join(spark):
    old, _ = _frames(spark)
    updates = spark.createDataFrame([Row(k=2, a="y2", b=99.0)])
    plan = plan_of(D.snapshot_merge(old, updates, ["k"]))
    assert "LeftAnti" in plan

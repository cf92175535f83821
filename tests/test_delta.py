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


def test_scd2_intervals_model(spark):
    """SCD2 runs against a hand-checked 3-version stack: unchanged keys
    get one open interval; a changed key closes the old run at the
    change version (half-open [from, to)) and opens a new one."""
    from pimdb_spark.operators.delta import scd2_intervals

    rows = [
        # key 1: never changes
        (1, 1, "A", 10.0), (2, 1, "A", 10.0), (3, 1, "A", 10.0),
        # key 2: price changes at v3
        (1, 2, "A", 10.0), (2, 2, "A", 10.0), (3, 2, "A", 11.0),
        # key 3: appears at v2, status flips at v3, NULL price throughout
        (2, 3, "A", None), (3, 3, "B", None),
    ]
    df = spark.createDataFrame(rows, "version int, k int, status string, price double")
    out = {
        (r.k, r.valid_from): (r.valid_to, r.n_versions, r.status, r.price)
        for r in scd2_intervals(df, ["k"], "version", ["status", "price"]).collect()
    }
    assert out == {
        (1, 1): (None, 3, "A", 10.0),
        (2, 1): (3, 2, "A", 10.0),
        (2, 3): (None, 1, "A", 11.0),
        (3, 2): (3, 1, "A", None),
        (3, 3): (None, 1, "B", None),
    }


def test_scd2_single_shuffle(spark):
    """Both windows and the run groupBy must reuse ONE key exchange."""
    import contextlib
    import io

    from pimdb_spark.catalog_delta import q_scd2_intervals

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_scd2_intervals(spark, "/root/testdata/sf0.001").explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    n_exchanges = sum(
        1 for line in tree.splitlines() if "Exchange" in line and "Reused" not in line
    )
    assert n_exchanges == 1, plan

"""Embedding data-selection operators (operators/selection.py):
hard-negative mining, kNN label-error detection, k-center greedy
coreset — python-model parity and contract tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows, label=True):
    schema = "vec_id bigint, embedding array<double>" + (
        ", label int" if label else ""
    )
    return spark.createDataFrame(rows, schema)


def _qcos_model(a, b):
    """Python replica of the int8 quantized cosine (round-4)."""
    ma, mb = max(map(abs, a)), max(map(abs, b))
    if ma == 0 or mb == 0:
        return 0.0
    ca = [max(-127, min(127, math.floor(x * 127.0 / ma + 0.5))) for x in a]
    cb = [max(-127, min(127, math.floor(x * 127.0 / mb + 0.5))) for x in b]
    idot = sum(x * y for x, y in zip(ca, cb))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na * nb == 0:
        return 0.0
    return round(idot * (ma / 127.0) * (mb / 127.0) / (na * nb), 4)


# ---------------------------------------------------------------- hard negs


def test_hard_negatives_python_model_parity(spark):
    """Mined negatives, positive best, and margins match a brute-force
    python replay exactly (ranking ties by candidate id)."""
    import random

    from pimdb_spark.operators.selection import hard_negative_mining

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(30)
    ]
    df = _mk(spark, rows)
    q = _mk(spark, rows).filter(F.col("vec_id") < 5)
    got = {
        (r.q_id, r.neg_rank): r
        for r in hard_negative_mining(q, df, k=2).collect()
    }
    vecs = {i: (v, l) for i, v, l in rows}
    for qi in range(5):
        qv, ql = vecs[qi]
        scored = [
            (_qcos_model(qv, cv), ci, cl)
            for ci, (cv, cl) in vecs.items()
            if ci != qi
        ]
        negs = sorted(
            [(s, ci, cl) for s, ci, cl in scored if cl != ql],
            key=lambda t: (-t[0], t[1]),
        )[:2]
        pos = max(s for s, ci, cl in scored if cl == ql)
        for rank, (s, ci, cl) in enumerate(negs, start=1):
            r = got[(qi, rank)]
            assert (r.neg_id, r.neg_label) == (ci, cl)
            assert abs(r.neg_qcos - s) < 1e-12
            assert abs(r.pos_qcos - pos) < 1e-12
            assert abs(r.margin - (pos - s)) < 1e-12


def test_hard_negatives_no_positive_is_null(spark):
    """A query whose label has no other member gets NULL pos/margin —
    absence, not a zero score."""
    from pimdb_spark.operators.selection import hard_negative_mining

    rows = [
        (0, [1.0, 0.0], 7),  # unique label
        (1, [0.9, 0.1], 1),
        (2, [0.8, 0.2], 1),
    ]
    df = _mk(spark, rows)
    q = _mk(spark, rows).filter(F.col("vec_id") == 0)
    out = hard_negative_mining(q, df, k=2).collect()
    assert len(out) == 2
    assert all(r.pos_qcos is None and r.margin is None for r in out)
    assert all(r.neg_label == 1 for r in out)


# ---------------------------------------------------------------- label errs


def test_knn_label_errors_votes_and_flags(spark):
    """A planted mislabel inside a tight same-direction cluster is
    flagged; a correctly-labelled member is not.  Vote counts and the
    majority tie-break are integer-deterministic."""
    from pimdb_spark.operators.selection import knn_label_errors

    # cluster A along +x (label 0) with one mislabelled member (label 9);
    # cluster B along +y (label 1)
    rows = [
        (0, [1.0, 0.01], 0),
        (1, [1.0, 0.02], 0),
        (2, [1.0, 0.03], 0),
        (3, [1.0, 0.04], 9),  # mislabelled
        (4, [0.01, 1.0], 1),
        (5, [0.02, 1.0], 1),
        (6, [0.03, 1.0], 1),
    ]
    df = _mk(spark, rows)
    q = _mk(spark, rows)
    out = {r.vec_id: r for r in knn_label_errors(q, df, k=3).collect()}
    assert out[3].is_suspect and out[3].knn_label == 0 and out[3].n_agree == 0
    assert not out[0].is_suspect and out[0].knn_label == 0
    # members of A see the mislabel among their 3 NNs: n_agree == 2
    assert out[0].n_agree == 2
    assert not out[4].is_suspect and out[4].n_agree == 2


def test_knn_label_errors_majority_tie_breaks_low_label(spark):
    """A 1-1-1 vote among k=3 neighbours resolves to the SMALLEST label
    (count DESC, label ASC) in both engines."""
    from pimdb_spark.operators.selection import knn_label_errors

    rows = [
        (0, [1.0, 0.0], 5),
        (1, [0.9, 0.1], 3),
        (2, [0.9, -0.1], 8),
        (3, [0.8, 0.0], 1),
    ]
    df = _mk(spark, rows)
    q = _mk(spark, rows).filter(F.col("vec_id") == 0)
    (r,) = knn_label_errors(q, df, k=3).collect()
    assert r.knn_label == 1 and r.is_suspect and r.n_agree == 0


# ---------------------------------------------------------------- k-center


def _kcenter_model(rows, k):
    """Greedy k-center python replay: seed = min id, then argmax of
    min-sqdist-to-chosen, ties by id."""
    vecs = dict(rows)
    chosen = [min(vecs)]
    out = [(1, chosen[0], None)]
    for r in range(2, k + 1):
        best = None
        for pid, v in vecs.items():
            if pid in chosen:
                continue
            dmin = min(
                sum((x - y) * (x - y) for x, y in zip(v, vecs[c]))
                for c in chosen
            )
            key = (-dmin, pid)
            if best is None or key < best[0]:
                best = (key, pid, dmin)
        chosen.append(best[1])
        out.append((r, best[1], best[2]))
    return out


def test_kcenter_greedy_python_model_parity(spark):
    import random

    from pimdb_spark.operators.selection import kcenter_greedy

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)]
    df = _mk(spark, rows, label=False)
    got = [(r.sel_rank, r.vec_id, r.dmin) for r in kcenter_greedy(df, k=5).collect()]
    want = _kcenter_model(rows, 5)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gd), (_, _, wd) in zip(got[1:], want[1:]):
        assert abs(gd - wd) < 1e-12


def test_kcenter_objective_monotone_and_spread(spark):
    """The dmin column (coverage radius curve) is monotone non-increasing,
    picks are distinct, and the greedy picks beat a prefix pick of the
    same size on the k-center objective."""
    import random

    from pimdb_spark.operators.selection import kcenter_greedy

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)]
    df = _mk(spark, rows, label=False)
    out = kcenter_greedy(df, k=6).collect()
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == 6 and out[0].dmin is None
    ds = [r.dmin for r in out[1:]]
    assert all(a >= b for a, b in zip(ds, ds[1:]))

    def radius(centers):
        return max(
            min(
                sum((x - y) * (x - y) for x, y in zip(v, dict(rows)[c]))
                for c in centers
            )
            for i, v in rows
            if i not in centers
        )

    assert radius(ids) <= radius([0, 1, 2, 3, 4, 5]) + 1e-12


def test_kcenter_fewer_points_than_k(spark):
    """k larger than the table: every point is selected once, nothing
    crashes, output has n rows."""
    from pimdb_spark.operators.selection import kcenter_greedy

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = _mk(spark, rows, label=False)
    out = kcenter_greedy(df, k=5).collect()
    assert sorted(r.vec_id for r in out) == [0, 1, 2]
    assert len(out) == 3

"""Distributed linear algebra (operators/linalg.py) against numpy."""

from __future__ import annotations

import math
import random

import numpy as np


def _py_codes(vec: list[float]) -> list[int]:
    mx = max(abs(x) for x in vec)
    if mx == 0:
        return [0] * len(vec)
    return [
        int(max(-127.0, min(127.0, math.floor(x * 127.0 / mx + 0.5))))
        for x in vec
    ]


def _fixture(n: int = 80, dim: int = 16):
    rng = random.Random(31)
    return [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]


def test_gram_matrix_int8_matches_numpy_exactly(spark):
    from pimdb_spark.operators.linalg import gram_matrix_int8

    rows = _fixture()
    dim = 16
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r.i, r.j): r.gram
        for r in gram_matrix_int8(df, dim=dim).collect()
    }
    codes = np.array([_py_codes(v) for _, v in rows], dtype=np.int64)
    want = codes.T @ codes
    assert len(got) == dim * (dim + 1) // 2
    for i in range(1, dim + 1):
        for j in range(i, dim + 1):
            assert got[(i, j)] == want[i - 1, j - 1]  # exact integers


def test_pca_project_matches_numpy_model(spark):
    from pimdb_spark.operators.linalg import pca_project

    rows = _fixture()
    dim, k = 16, 4
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: list(r.components)
        for r in pca_project(df, n_components=k, dim=dim).collect()
    }

    codes = np.array([_py_codes(v) for _, v in rows], dtype=np.float64)
    g = codes.T @ codes
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    for c in range(k):
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    want = codes @ comps

    assert set(got) == {i for i, _ in rows}
    for idx, (i, _) in enumerate(rows):
        assert np.allclose(got[i], want[idx], rtol=1e-9, atol=1e-9)

    # the top component must capture the most energy: projections onto
    # component 0 dominate component k-1 in total variance
    p = np.array([got[i] for i, _ in rows])
    assert (p[:, 0] ** 2).sum() >= (p[:, k - 1] ** 2).sum()


def test_random_project_int8_matches_python_model(spark):
    from pimdb_spark.operators.linalg import _jl_signs, random_project_int8

    rows = _fixture()
    dim, k = 16, 8
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r.vec_id, r.comp): r.value
        for r in random_project_int8(df, n_components=k, dim=dim).collect()
    }
    signs = _jl_signs(k, dim)
    codes = {i: _py_codes(v) for i, v in rows}
    assert len(got) == len(rows) * k
    for i, _ in rows:
        for c in range(1, k + 1):
            want = sum(codes[i][d] * signs[c - 1][d] for d in range(dim))
            assert got[(i, c)] == want  # exact integers

    # JL sanity: projected squared norms track original code norms in
    # aggregate (E[|Px|^2] = k * |x|^2 for +/-1 signs) — check the
    # corpus-level ratio is within a loose band
    import numpy as np

    orig = sum(float(np.dot(codes[i], codes[i])) for i, _ in rows)
    proj = sum(float(v) ** 2 for v in got.values())
    ratio = proj / (k * orig)
    assert 0.5 < ratio < 2.0

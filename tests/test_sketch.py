"""Count-min sketch (operators/sketch.py) against an independent python
model: exact counter parity, the never-undercount guarantee, and
heavy-hitter candidate soundness/completeness."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _pos(item: str, j: int, width: int) -> int:
    return int(hashlib.md5(f"{j}:{item}".encode()).hexdigest()[:8], 16) % width


def _py_cms(counts: Counter, width: int, depth: int):
    cells: Counter = Counter()
    for item, c in counts.items():
        for j in range(depth):
            cells[(j, _pos(item, j, width))] += c
    return cells


@pytest.mark.parametrize("seed", range(4))
def test_cms_counters_and_estimates_match_python_model(spark, seed):
    from pimdb_spark.operators.sketch import cms_build, cms_estimate

    rng = random.Random(seed)
    width, depth = rng.choice([16, 64, 256]), rng.randint(2, 4)
    items = [f"k{int(rng.paretovariate(1.0)) % 40}" for _ in range(600)]
    counts = Counter(items)

    df = spark.createDataFrame([(s,) for s in items], ["item"])
    sk = cms_build(df, "item", width, depth)
    got_cells = {(r.row, r.col): r.cnt for r in sk.collect()}
    assert got_cells == dict(_py_cms(counts, width, depth))

    est = cms_estimate(
        df.select("item").distinct(), sk, "item", width, depth
    )
    cells = _py_cms(counts, width, depth)
    for r in est.collect():
        want = min(cells[(j, _pos(r.item, j, width))] for j in range(depth))
        assert r.est == want
        assert r.est >= counts[r.item]  # never undercounts


def test_cms_weighted_and_absent_items(spark):
    from pimdb_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame(
        [("a", 5), ("b", 7), ("a", 2)], ["item", "w"]
    )
    sk = cms_build(df, "item", 1024, 3, weight_col="w")
    est = {
        r.item: r.est
        for r in cms_estimate(
            spark.createDataFrame(
                [("a",), ("b",), ("never",)], ["item"]
            ),
            sk,
            "item",
            1024,
            3,
        ).collect()
    }
    assert est["a"] >= 7 and est["b"] >= 7
    # wide sketch, 3 items: no collisions — exact
    assert est["a"] == 7 and est["b"] == 7
    # an item that never occurred can only be a collision artifact; with
    # this width all its cells are empty -> estimate 0
    assert est["never"] == 0


def test_cms_heavy_hitter_candidates_sound_and_complete(spark):
    from pimdb_spark.operators.sketch import cms_heavy_hitter_candidates

    rng = random.Random(9)
    items = ["hot1"] * 80 + ["hot2"] * 60 + [
        f"cold{rng.randint(0, 200)}" for _ in range(400)
    ]
    df = spark.createDataFrame([(s,) for s in items], ["item"])
    counts = Counter(items)

    # narrow sketch => collisions => some false candidates; the exact
    # verify pass must keep verdicts truthful
    out = {
        r.item: (r.est, r.exact, r.is_heavy)
        for r in cms_heavy_hitter_candidates(
            df, "item", width=32, depth=3, min_est=50
        ).collect()
    }
    for item, (est, exact, is_heavy) in out.items():
        assert exact == counts[item]
        assert est >= exact
        assert is_heavy == (exact >= 50)
    # completeness: every true heavy hitter is in the candidate set
    for item, c in counts.items():
        if c >= 50:
            assert item in out and out[item][2]


def _py_hll(values, low_bits=26, buckets=64):
    regs = {}
    for s in set(values):
        h = int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16)
        b, low = h >> low_bits, h % (1 << low_bits)
        rho = (low_bits + 1) if low == 0 else (low_bits + 1 - low.bit_length())
        regs[b] = max(regs.get(b, 0), rho)
    return regs


@pytest.mark.parametrize("seed", range(3))
def test_hll_registers_match_python_model_and_are_idempotent(spark, seed):
    from pimdb_spark.operators.sketch import hll_registers

    rng = random.Random(seed)
    values = [f"u{rng.randint(0, 5000)}" for _ in range(1500)]
    df = spark.createDataFrame([(s,) for s in values], ["item"])
    got = {r.bucket: r.register for r in hll_registers(df, "item").collect()}
    assert got == _py_hll(values)

    # idempotence: replaying the whole stream changes nothing (MAX)
    replay = {
        r.bucket: r.register
        for r in hll_registers(df.union(df), "item").collect()
    }
    assert replay == got


def test_hll_estimate_accuracy_and_determinism(spark):
    from pimdb_spark.operators.sketch import hll_estimate, hll_registers

    rng = random.Random(7)
    true_n = 3000
    values = [f"id{i}" for i in range(true_n) for _ in (0, 1)]  # dups too
    rng.shuffle(values)
    df = spark.createDataFrame([(s,) for s in values], ["item"])
    est = hll_estimate(hll_registers(df, "item")).collect()[0]
    assert est.m == 64
    # raw HLL error ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est.raw_estimate - true_n) / true_n < 0.4
    # determinism: re-partitioned input gives the BIT-identical estimate
    est2 = hll_estimate(
        hll_registers(df.repartition(13), "item")
    ).collect()[0]
    assert est2.raw_estimate == est.raw_estimate


def test_sketch_merges_equal_union_sketches(spark):
    """Mergeability — the distributed-systems property: per-slice
    sketches merged == the sketch of the union stream.  CMS merges by
    cell sums (disjoint slices only — sums double-count overlap); HLL
    merges by register max and is EXACT even for overlapping slices."""
    from pimdb_spark.operators.sketch import (
        cms_build,
        cms_merge,
        hll_merge,
        hll_registers,
    )

    rng = random.Random(13)
    a = [f"x{rng.randint(0, 300)}" for _ in range(400)]
    b = [f"x{rng.randint(100, 500)}" for _ in range(400)]
    da = spark.createDataFrame([(s,) for s in a], ["item"])
    db = spark.createDataFrame([(s,) for s in b], ["item"])
    du = da.union(db)

    merged_cms = {
        (r.row, r.col): r.cnt
        for r in cms_merge(
            cms_build(da, "item", 128, 3), cms_build(db, "item", 128, 3)
        ).collect()
    }
    union_cms = {
        (r.row, r.col): r.cnt for r in cms_build(du, "item", 128, 3).collect()
    }
    assert merged_cms == union_cms

    merged_hll = {
        r.bucket: r.register
        for r in hll_merge(
            hll_registers(da, "item"), hll_registers(db, "item")
        ).collect()
    }
    union_hll = {
        r.bucket: r.register for r in hll_registers(du, "item").collect()
    }
    assert merged_hll == union_hll  # exact despite the overlapping range


def test_hll_group_estimate_matches_per_group_global(spark):
    """Per-group HLL must equal running the global sketch on each group
    independently (group isolation), bit for bit."""
    from pimdb_spark.operators.sketch import (
        hll_estimate,
        hll_group_estimate,
        hll_registers,
    )

    rng = random.Random(21)
    rows = [
        (f"g{i % 3}", f"u{rng.randint(0, 2000)}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, ["grp", "item"])
    got = {
        r.grp: (r.n_present, r.raw_estimate)
        for r in hll_group_estimate(df, "grp", "item").collect()
    }
    assert set(got) == {"g0", "g1", "g2"}
    for g in got:
        solo = hll_estimate(
            hll_registers(df.filter(F.col("grp") == g), "item")
        ).collect()[0]
        assert got[g] == (solo.n_present, solo.raw_estimate)  # bit-equal
    # and the estimates track the true per-group cardinalities
    truth = {
        r.grp: r.n
        for r in df.groupBy("grp")
        .agg(F.count_distinct("item").alias("n"))
        .collect()
    }
    for g, n in truth.items():
        assert abs(got[g][1] - n) / n < 0.4


def test_hll_estimate_empty_sketch_is_defined_constant(spark):
    """Zero items seen is a defined input: the estimate is the
    all-zero-registers constant alpha_m * m (never NULL) — the coalesce
    contract on operators/sketch.hll_estimate."""
    from pimdb_spark.operators.sketch import (
        HLL_BUCKETS,
        hll_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "item string")
    row = hll_estimate(hll_registers(empty, "item")).collect()[0]
    m = HLL_BUCKETS
    assert row.m == m and row.n_present == 0
    assert row.raw_estimate is not None
    # same expression shape the operator evaluates: alpha * m^2 / (0 + m)
    assert row.raw_estimate == (0.7213 / (1.0 + 1.079 / m)) * m * m / m


# ---------------------------------------------------------------- EH quantile


def _eh_model(vals, sub_bits=3):
    """Python replica of eh_buckets: (bkey, lo) -> cnt."""
    cells = {}
    for v in vals:
        assert v > 0
        bl = v.bit_length()
        shift = max(bl - (sub_bits + 1), 0)
        s = v >> shift
        key = (bl * (2 ** (sub_bits + 1)) + s, s << shift)
        cells[key] = cells.get(key, 0) + 1
    return cells


def test_eh_buckets_match_python_model(spark):
    import random

    from pimdb_spark.operators.sketch import eh_buckets

    rng = random.Random(13)
    vals = [rng.randint(1, 10**9) for _ in range(500)] + [1, 2, 15, 16, 17]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {(r.bkey, r.lo): r.cnt for r in eh_buckets(df, "v").collect()}
    assert got == _eh_model(vals)
    # hard-bounded cells: <= 64 octaves x 2^sub_bits sub-buckets
    assert len(got) <= 64 * 16


def test_eh_quantiles_bounds_and_exactness(spark):
    """est <= exact < est * (1 + 2^-sub_bits) for every quantile; small
    values (singleton buckets) read back EXACT."""
    import random

    from pimdb_spark.operators.sketch import eh_buckets, eh_quantiles

    rng = random.Random(17)
    vals = [rng.randint(1, 10**7) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [1000, 5000, 9000, 9900]
    got = {
        r.q_bp: r for r in eh_quantiles(eh_buckets(df, "v"), qs).collect()
    }
    sv = sorted(vals)
    n = len(vals)
    for q in qs:
        rank = (q * n + 9999) // 10000
        exact = sv[rank - 1]
        r = got[q]
        assert r.rank == rank
        assert r.est <= exact < r.est + max(r.est >> 3, 1) + 1, (q, r, exact)
    # estimates are monotone in the quantile
    ests = [got[q].est for q in qs]
    assert all(a <= b for a, b in zip(ests, ests[1:]))
    # singleton-bucket regime: values < 16 are exact
    small = spark.createDataFrame([(v % 15 + 1,) for v in vals], "v long")
    gs = {
        r.q_bp: r
        for r in eh_quantiles(eh_buckets(small, "v"), [5000]).collect()
    }
    ssv = sorted(v % 15 + 1 for v in vals)
    assert gs[5000].est == ssv[(5000 * n + 9999) // 10000 - 1]


def test_eh_merge_disjoint_slices_equal_union(spark):
    from pimdb_spark.operators.sketch import eh_buckets, eh_merge

    vals = list(range(1, 401))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    a = eh_buckets(df.filter(F.col("v") % 2 == 0), "v")
    b = eh_buckets(df.filter(F.col("v") % 2 == 1), "v")
    merged = {(r.bkey, r.lo): r.cnt for r in eh_merge(a, b).collect()}
    union = {(r.bkey, r.lo): r.cnt for r in eh_buckets(df, "v").collect()}
    assert merged == union


def test_eh_rejects_nonpositive_values(spark):
    import pytest as _pytest

    from pimdb_spark.operators.sketch import eh_buckets

    df = spark.createDataFrame([(5,), (0,)], "v long")
    with _pytest.raises(Exception, match="positive"):
        eh_buckets(df, "v").collect()


def test_eh_empty_sketch_yields_no_quantiles(spark):
    from pimdb_spark.operators.sketch import eh_buckets, eh_quantiles

    df = spark.createDataFrame([], "v long")
    assert eh_quantiles(eh_buckets(df, "v"), [5000]).collect() == []


def test_eh_group_quantiles_match_per_group_global(spark):
    """Group isolation: each group's quantiles equal the ungrouped
    sketch run on that group's slice alone (the hll_group_estimate
    bit-equality discipline)."""
    import random

    from pimdb_spark.operators.sketch import (
        eh_buckets,
        eh_group_buckets,
        eh_group_quantiles,
        eh_quantiles,
    )

    rng = random.Random(23)
    rows = [(f"g{i % 3}", rng.randint(1, 10**6)) for i in range(600)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r.grp, r.q_bp): (r.rank, r.est)
        for r in eh_group_quantiles(
            eh_group_buckets(df, "grp", "v"), [5000, 9000]
        ).collect()
    }
    for g in ("g0", "g1", "g2"):
        lone = {
            r.q_bp: (r.rank, r.est)
            for r in eh_quantiles(
                eh_buckets(df.filter(F.col("grp") == g), "v"), [5000, 9000]
            ).collect()
        }
        for q in (5000, 9000):
            assert got[(g, q)] == lone[q], (g, q)


def test_eh_rejects_null_values(spark):
    """NULL is rejected like non-positive values — a silently-admitted
    NULL bucket would inflate N and shift every rank."""
    import pytest as _pytest

    from pimdb_spark.operators.sketch import eh_buckets

    df = spark.createDataFrame([(5,), (None,)], "v long")
    with _pytest.raises(Exception, match="positive"):
        eh_buckets(df, "v").collect()

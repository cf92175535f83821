"""Every catalog query must hash-match its DuckDB oracle at sf0.001 —
the local replica of the driver's correctness gate."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _entries():
    from pimdb_spark import entrypoints  # noqa: F401
    from pimdb_spark.catalog import (
        _EXTRA_BENCH,
        _EXTRA_BENCH_ORACLE,
        _REGISTRY,
        CatalogEntry,
    )

    # bench-only entries that carry their own oracle (distinct contract,
    # consolidated out of the driver window) keep the local hash gate here
    extras = {
        name: CatalogEntry(
            name=name, fn=_EXTRA_BENCH[name], oracle=_EXTRA_BENCH_ORACLE[name]
        )
        for name in _EXTRA_BENCH_ORACLE
    }
    return list({**_REGISTRY, **extras}.items())


@pytest.mark.parametrize("name,entry", _entries(), ids=[n for n, _ in _entries()])
def test_catalog_query_matches_oracle(spark, name, entry):
    from pimdb_spark.oracle import compare

    if entry.oracle is None:
        df = entry.fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    result = compare(spark, entry.fn, entry.oracle, SF_DIR)
    assert result["ok"], {k: v for k, v in result.items() if k != "ok"}

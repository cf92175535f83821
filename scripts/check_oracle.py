"""Dev loop: run every catalog query against its DuckDB oracle.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pimdb_spark import entrypoints  # noqa: E402  (registers all catalog modules)
from pimdb_spark.catalog import (  # noqa: E402
    _EXTRA_BENCH,
    _EXTRA_BENCH_ORACLE,
    _REGISTRY,
    CatalogEntry,
)
from pimdb_spark.oracle import compare  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    failures = 0
    # bench-only entries with a pytest-gated oracle are part of the sweep
    # (same set tests/test_catalog_oracle.py parametrizes)
    entries = dict(_REGISTRY)
    for name in _EXTRA_BENCH_ORACLE:
        entries[name] = CatalogEntry(
            name=name, fn=_EXTRA_BENCH[name], oracle=_EXTRA_BENCH_ORACLE[name]
        )
    for name, entry in entries.items():
        if only and name not in only:
            continue
        if entry.oracle is None:
            df = entry.fn(spark, sf_dir)
            n = df.count()
            print(f"{name:32s} rows-only  rows={n}")
            continue
        try:
            r = compare(spark, entry.fn, entry.oracle, sf_dir)
        except Exception as e:
            print(f"{name:32s} ERROR      {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        status = "OK" if r["ok"] else "FAIL"
        print(
            f"{name:32s} {status:10s} rows={r['spark_rows']}/{r['oracle_rows']}"
            f" schema={r['schema_match']} values={r['value_match']}"
        )
        if not r["ok"]:
            failures += 1
            if r.get("first_diffs"):
                for a, b in r["first_diffs"]:
                    print(f"    spark : {a[:160]}")
                    print(f"    oracle: {b[:160]}")
            elif not r["schema_match"]:
                print(f"    spark cols : {r['spark_cols']}")
                print(f"    oracle cols: {r['oracle_cols']}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Audit the Arrow-level type of every oracle column against the Spark
result schema.  The driver's value hash normalizes Spark and DuckDB results
independently, so a DuckDB HUGEINT (Arrow decimal128(38,0)) against a Spark
BIGINT hash-mismatches even when every value is equal (seen in round 1:
all five hash_match=false rows were uncast ``sum(int)`` in the oracle SQL).

Usage: python scripts/audit_types.py [sf_dir] [query ...]
Prints one line per query; MISMATCH lines show the differing columns.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pimdb_spark import entrypoints  # noqa: E402,F401
from pimdb_spark.catalog import _REGISTRY, TABLE_NAMES  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402

# Map Spark simpleString -> acceptable Arrow type names (prefix match).
# Integer widths are one equivalence class: round 1 showed the driver's hash
# normalizes int32/int64 identically (q_window_rank int-vs-int64 passed),
# while decimal128(38,0) (DuckDB HUGEINT) against Spark BIGINT fails.
_INTS = ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64")
_OK = {
    "tinyint": _INTS,
    "smallint": _INTS,
    "int": _INTS,
    "bigint": _INTS,
    "double": ("double", "float64"),
    "float": ("float", "float32"),
    "string": ("string", "large_string"),
    "boolean": ("bool",),
    "date": ("date32",),
    "binary": ("binary", "large_binary"),
}


def arrow_matches(spark_t: str, arrow_t: str) -> bool:
    if spark_t.startswith("decimal"):
        # decimal(p,s) -> decimal128(p, s)
        inner = spark_t[len("decimal") :].strip("()")
        return arrow_t.replace(" ", "") == f"decimal128({inner})"
    if spark_t.startswith("timestamp"):
        return arrow_t.startswith("timestamp")
    if spark_t.startswith("array"):
        return arrow_t.startswith(("list", "large_list"))
    return arrow_t.startswith(_OK.get(spark_t, (spark_t,)))


def main() -> int:
    # argv[1] is the sf_dir only if it IS a directory — otherwise it's the
    # first query-name filter (`audit_types.py q_set_ops` must not silently
    # audit nothing by eating the name as a path)
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.001", set(args)
    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    bad = 0
    for name, entry in _REGISTRY.items():
        if only and name not in only:
            continue
        if entry.oracle is None:
            print(f"{name:32s} no-oracle")
            continue
        try:
            spark_schema = {
                f.name: f.dataType.simpleString()
                for f in entry.fn(spark, sf_dir).schema.fields
            }
            arrow = con.execute(entry.oracle).fetch_arrow_table().schema
            oracle_schema = {f.name: str(f.type) for f in arrow}
        except Exception as e:  # pragma: no cover - dev tool
            print(f"{name:32s} ERROR      {type(e).__name__}: {str(e)[:160]}")
            bad += 1
            continue
        diffs = []
        if set(spark_schema) != set(oracle_schema):
            diffs.append(
                f"cols spark={sorted(spark_schema)} oracle={sorted(oracle_schema)}"
            )
        else:
            for col, st in spark_schema.items():
                if not arrow_matches(st, oracle_schema[col]):
                    diffs.append(f"{col}: spark={st} oracle={oracle_schema[col]}")
        if diffs:
            bad += 1
            print(f"{name:32s} MISMATCH   {'; '.join(diffs)}")
        else:
            print(f"{name:32s} ok")
    print(f"\n{bad} queries with type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified tuple) — the same contract CORRECTNESS_r{N}.json is built from.
"""

from __future__ import annotations

import math

import duckdb


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from pimdb_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _rows_to_canonical(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["\t".join(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, fn, sql: str, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb_connect(sf_dir)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()

    result = {
        "spark_rows": len(srows),
        "oracle_rows": len(orows),
        "spark_cols": sorted(scols),
        "oracle_cols": sorted(ocols),
        "count_match": len(srows) == len(orows),
        "schema_match": sorted(scols) == sorted(ocols),
    }
    if result["count_match"] and result["schema_match"]:
        s_canon = _rows_to_canonical(scols, srows)
        o_canon = _rows_to_canonical(ocols, orows)
        result["value_match"] = s_canon == o_canon
        if not result["value_match"]:
            diffs = [
                (a, b) for a, b in zip(s_canon, o_canon) if a != b
            ][:5]
            result["first_diffs"] = diffs
    else:
        result["value_match"] = False
    result["ok"] = result["count_match"] and result["schema_match"] and result["value_match"]
    return result

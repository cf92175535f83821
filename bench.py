"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed but never collected to the driver: the drain
is max(xxhash64(*columns)) — a one-row aggregate that REFERENCES every
output column, so Catalyst cannot prune the projection expressions.  A
bare count() would let the optimizer drop unreferenced projections
entirely (e.g. q_simhash's hash computation — the one projection the
query exists to time) and report a parquet row-count scan instead.  This
is the same drain as scripts/bench_scale.py::_drain; switched here in
round 9 (the r1-r8 BENCH files used count(), so projection-only entries
were understated — see SCALE.md "Bench drain change").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pimdb_spark import entrypoints as _ep  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def _drain(df) -> None:
    df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("pimdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench = _ep.bench_queries()
    timings: dict[str, float] = {}
    # Warm-up pass: run every query once untimed so the timed pass measures
    # steady-state execution (whole-stage-codegen compilation, JIT, parquet
    # footer/file-listing caches are one-time JVM costs, not query work).
    spark.range(1).count()
    for name, fn in bench.items():
        _drain(fn(spark, sf_dir))
    spark.catalog.clearCache()  # drop warm-up persists; keep JIT/codegen warm
    # Three timed iterations, report the min: local[32] on a shared box has
    # multi-hundred-ms scheduler/GC jitter that would otherwise dominate
    # sub-second queries (r7 drifted q1/q5 +29%/+28% with zero code change
    # under min-of-2; min-of-3 makes round-over-round regressions
    # attributable to plans, not the scheduler).  Queries run strictly
    # serially — each .count() blocks — so no cross-query stage overlap.
    for name, fn in bench.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _drain(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    # The driver tail-captures stdout with a bounded budget (~2.4 KB); the
    # full line above grew past it once the per-query map crossed ~70
    # entries, so BENCH_r14 recorded parsed:null.  Emit a second, SHORT
    # summary line LAST — no per-query map — so the tail always ends with
    # a complete JSON object the driver can parse.  Committed bench pairs
    # under bench_runs/ keep using the full line.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )
    # ADDITIONS-ONLY per-query artifact (r19 optimization round, per the
    # r18 verdict "Next round: do this" #2): the stdout tail capture
    # truncates the full per-query line, leaving PERF's per_query/geomean/
    # scaling blocks empty, so ALSO write the identical payload to a
    # fixed-name file beside this script.  Written after the timed loop
    # and after both stdout lines — zero effect on methodology or on the
    # printed contract (both lines above are byte-identical to r18's).
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_perquery.json"), "w") as f:
            json.dump(
                {
                    "metric": "headline_queries_total",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                },
                f,
            )
            f.write("\n")
    except OSError:
        pass  # a read-only checkout must never fail the bench
    spark.stop()


if __name__ == "__main__":
    main()

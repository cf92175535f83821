"""Capture .explain("formatted") for named bench queries into a plans
directory — the optimization-round evidence files (plans/rNN/<q>_<tag>.txt).

Usage: python scripts/capture_plans.py --out plans/r18 --tag before [--sf sf_dir] q1 q2 ...
       (no query names = every bench query)

Plans are captured lazily (no execution), so this is cheap; with AQE on
they show the initial plan (isFinalPlan=false), which is the committed
plan-shape evidence (Exchange count, join strategy, PushedFilters,
ReadSchema, Python-eval nodes).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pimdb_spark import entrypoints as _ep  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("pimdb-spark-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    bench = _ep.bench_queries()
    names = args.names or list(bench)
    os.makedirs(args.out, exist_ok=True)
    bad = 0
    for name in names:
        if name not in bench:
            print(f"SKIP {name}: not a bench query", file=sys.stderr)
            bad += 1
            continue
        df = bench[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Audit every catalog entry in its OWN fresh process/SparkSession.

Why this exists: Spark 4.1's optimizer has attribute-id-dependent bugs
(Union constraint rewrite, self-join HOF lambda rebind — see
operators/similarity.py docstrings) that only surface when a query runs
FIRST in a session; the full check_oracle sweep shares one session, so
in-sweep success proves nothing for those shapes.  The grading driver may
run any subset in any order, so every entry must pass standalone.

Usage: python scripts/check_standalone.py [sf_dir] [query ...]
Runs one `check_oracle.py <sf_dir> <query>` subprocess per entry and
prints a per-entry verdict plus a failure summary.  Exit 1 on any failure.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pimdb_spark import entrypoints  # noqa: E402,F401
from pimdb_spark.catalog import _EXTRA_BENCH_ORACLE, _REGISTRY  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)
    failures = []
    for name in list(_REGISTRY) + list(_EXTRA_BENCH_ORACLE):
        if only and name not in only:
            continue
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"), sf_dir, name],
            capture_output=True,
            text=True,
            timeout=600,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if (" OK " in ln or "FAIL" in ln or "ERROR " in ln or "rows-only" in ln)
            ),
            f"{name:32s} NO-OUTPUT rc={proc.returncode}",
        )
        print(line.strip(), flush=True)
        ok = (" OK " in line or "rows-only" in line) and proc.returncode == 0
        if not ok:
            failures.append(name)
    print(f"\nstandalone: {len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

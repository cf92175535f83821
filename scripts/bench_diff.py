"""Diff two bench JSON files (bench.py's full line or bench_subset.py's
output): per-query before/after seconds and ratio, sorted by absolute
saving.  Usage: python scripts/bench_diff.py before.json after.json [min_abs]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        return json.load(f)["queries"]


def main() -> int:
    before, after = load(sys.argv[1]), load(sys.argv[2])
    min_abs = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    common = sorted(
        (n for n in before if n in after),
        key=lambda n: after[n] - before[n],
    )
    tb = ta = 0.0
    print(f"{'query':40s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
    for n in common:
        b, a = before[n], after[n]
        tb += b
        ta += a
        if abs(a - b) >= min_abs:
            print(f"{n:40s} {b:8.3f} {a:8.3f} {a / b if b else float('nan'):6.2f}")
    print(f"{'TOTAL (common)':40s} {tb:8.3f} {ta:8.3f} {ta / tb:6.3f}")
    only_b = [n for n in before if n not in after]
    only_a = [n for n in after if n not in before]
    if only_b:
        print("only in before:", only_b)
    if only_a:
        print("only in after:", only_a)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

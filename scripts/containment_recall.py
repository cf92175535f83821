"""Measure the banded containment twin's candidate-generation recall
against the brute capped-shingle form on the shared planted-excerpt
fixture.  Both entries verify EXACT containment, so each output is a
subset of the TRUE pair set; the brute twin's candidates are complete
for any pair sharing an under-cap shingle, which on this fixture is
every true pair (max shingle df 4 << cap 40), so here brute is the
ground truth and the interesting number is how much of it the 16
single-hash probes keep (the LSH-Ensemble high-recall endpoint,
p = 1-(1-j)^16).  NOTE the subset direction is empirical, not
structural: a pair whose every shared shingle exceeds the cap gets no
brute candidate yet can still collide in a band — on a corpus with
heavy cross-source boilerplate lsh_only can be positive, and such
pairs are real (the banded form catching what the cap dropped).
Prints one JSON line per entry plus the recall line — the source of
SCALE.md's containment row.

Usage: python scripts/containment_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pimdb_spark import entrypoints  # noqa: E402,F401
from pimdb_spark.catalog import _EXTRA_BENCH  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("containment-recall")
    spark.sparkContext.setLogLevel("ERROR")
    sets, times = {}, {}
    for name in ("q_containment_pairs", "q_containment_lsh_pairs"):
        t0 = time.time()
        rows = _EXTRA_BENCH[name](spark, sf).select("id_a", "id_b").collect()
        times[name] = round(time.time() - t0, 2)
        sets[name] = {(r.id_a, r.id_b) for r in rows}
        print(json.dumps({"entry": name, "sf": sf, "pairs": len(sets[name]),
                          "sec": times[name]}))
    brute, lsh = sets["q_containment_pairs"], sets["q_containment_lsh_pairs"]
    print(json.dumps({
        "sf": sf,
        "recall": round(len(brute & lsh) / len(brute), 4) if brute else None,
        "lsh_only": len(lsh - brute),  # 0 here (cap never binds); see module docstring
    }))


if __name__ == "__main__":
    main()

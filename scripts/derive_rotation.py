"""Derive the round-N `_CHECK_FIRST` list (pimdb_spark/catalog.py) from the
rotation invariant documented in COVERAGE.md "Attestation rotation":

    _CHECK_FIRST = (new entries) + (changed entries) + (non-green last
    round) + (entries outside last round's window, STALEST FIRST — ties
    in registration order)

and mechanically verify the three-round invariant: with a 50-entry driver
window, registry \\ (window_{N-2} ∪ window_{N-1} ∪ window_N) must be empty
and every entry outside the last two windows must be green in round N-2.

Usage: python scripts/derive_rotation.py NEW1 NEW2 ... -- CHANGED1 ...
(new/changed entry names supplied by the round's change list; everything
else is derived from CORRECTNESS_r{N}.json files.)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


# round number -> actual globbed path (filled by main): reading back
# through the discovered filename itself means a non-zero-padded file
# (CORRECTNESS_r9.json) can neither crash the reader nor double-count a
# round against its padded twin.
_ROUND_PATHS: dict[int, str] = {}


def correctness(round_no: int) -> dict:
    path = _ROUND_PATHS.get(
        round_no, os.path.join(REPO, f"CORRECTNESS_r{round_no:02d}.json")
    )
    with open(path) as f:
        return json.load(f)


def green_names(round_no: int) -> set[str]:
    return {
        k
        for k, v in correctness(round_no).items()
        if isinstance(v, dict) and v.get("hash_match") and not v.get("err")
    }


def main() -> int:
    args = sys.argv[1:]
    if "--" in args:
        sep = args.index("--")
        new, changed = args[:sep], args[sep + 1 :]
    else:
        new, changed = args, []

    from pimdb_spark import entrypoints  # noqa: F401  (registers catalog)
    from pimdb_spark.catalog import _REGISTRY

    reg_order = list(_REGISTRY)  # registration order (dict insert order)
    registry = set(reg_order)

    for n in new + changed:
        if n not in registry:
            print(f"ERROR: {n} not in registry")
            return 1

    # Glob rather than a consecutive scan: a round whose driver artifacts
    # never landed (r14) must not hide every LATER round's file from the
    # derivation — the lookback is over rounds that actually recorded a
    # window, in order.
    import glob as _glob
    import re as _re

    for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rn = int(m.group(1))
        if rn in _ROUND_PATHS:
            print(f"ERROR: duplicate CORRECTNESS files for round {rn}: "
                  f"{_ROUND_PATHS[rn]} and {p}")
            return 1
        _ROUND_PATHS[rn] = p
    rounds = sorted(_ROUND_PATHS)
    # The K-round invariant generalizes with registry size: the union of
    # K consecutive 50-entry windows must cover the registry, so
    # K = ceil(N / WINDOW).  Because stale entries are ordered oldest
    # attestation first, any entry bumped from round N's window heads
    # round N+1's stale group — the same derivation rule yields the
    # K-round bound automatically; only the lookback widens.
    k_rounds = max(2, -(-len(registry) // WINDOW))
    lookback = rounds[-(k_rounds - 1):]
    latest_green: dict[str, int] = {}
    for rn in lookback:
        for name in green_names(rn):
            latest_green[name] = rn
    last = rounds[-1]
    last_window = set(correctness(last))  # the entries the driver checked

    failed_last = {
        k
        for k, v in correctness(last).items()
        if not (isinstance(v, dict) and v.get("hash_match") and not v.get("err"))
    }

    front = list(dict.fromkeys(new + changed + sorted(failed_last)))
    stale = [
        n
        for n in sorted(
            (n for n in reg_order if n not in last_window and n not in front),
            key=lambda n: (latest_green.get(n, 0), reg_order.index(n)),
        )
    ]
    check_first = front + stale

    # Entries the upcoming round attests = first WINDOW of (check_first +
    # rest in registration order).
    emitted = check_first + [n for n in reg_order if n not in set(check_first)]
    window_n = set(emitted[:WINDOW])

    prev_windows: set[str] = set()
    for rn in lookback:
        prev_windows |= set(correctness(rn))
    uncovered = registry - (window_n | prev_windows)
    ok = not uncovered
    # every entry outside the upcoming + most-recent window must hold a
    # green attestation somewhere in the lookback
    older = registry - window_n - set(correctness(rounds[-1]))
    not_attested = {n for n in older if n not in latest_green}

    union_label = "∪".join(f"r{rn}" for rn in lookback)
    print(f"# registry: {len(registry)} entries; window {WINDOW}; "
          f"{k_rounds}-round invariant (lookback {union_label})")
    print(f"# new: {len(new)}  changed: {len(changed)}  failed-last: {len(failed_last)}")
    print(f"# upcoming window covers {len(window_n)}; stale overflow {len(check_first) - WINDOW if len(check_first) > WINDOW else 0}")
    print(f"# invariant {union_label}∪next covers registry: {ok}")
    if uncovered:
        print(f"# UNCOVERED: {sorted(uncovered)}")
    if not_attested:
        print(f"# entries outside next∪r{rounds[-1]} windows lacking a lookback green: {sorted(not_attested)}")
    print()
    print("_CHECK_FIRST: list[str] = [")
    for group, names in [
        ("new this round", new),
        ("changed this round", changed),
        ("failed last round", sorted(failed_last)),
        ("stalest attestation first", stale),
    ]:
        if names:
            print(f"    # -- {group} --")
            for n in names:
                tag = latest_green.get(n)
                print(f'    "{n}",' + (f"  # last green r{tag}" if tag and group.startswith("stale") else ""))
    print("]")
    return 0 if ok and not not_attested else 1


if __name__ == "__main__":
    sys.exit(main())

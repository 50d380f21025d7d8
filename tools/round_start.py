#!/usr/bin/env python
"""Scripted round-start hygiene (r15 verdict Next #1: "consider making
'compare the driver pair' a scripted part of round-start so this stops
recurring").

Two boundary lessons drove this script existing at all:

- r14 start: the in-repo r13->r14 drift check had been run on the
  builder's OWN sweep, not the driver's truly-final artifacts (the
  driver writes BENCH_r{N}.json AFTER the builder's last commit), so
  the closed flag list was the wrong list.
- r15 close: the same divergence recurred — the builder's sweep
  flagged q15/q13/q7 (correctly washed) while the final artifact pair
  flagged the two PQ entries + q17.

So round start is now ONE command:

    python tools/round_start.py

which (1) regenerates FRESHNESS.json from all driver CORRECTNESS
artifacts (clears the designed round-boundary tripwire in
tests/test_tools.py and snapshots BENCH_DETAIL_r{N}.json), then
(2) reruns tools/compare_bench.py on the two NEWEST driver
BENCH_r*.json files — the final pair, by construction — and prints
the both-probes flag list that constitutes this round's
repeat-or-A/B watch list.  The builder still closes the flags by
hand (analytic diff + repeat-check or worktree A/B); the script just
makes it impossible to close the wrong list.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_bench_pair() -> tuple[str, str]:
    rounds = []
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
    rounds.sort()
    if len(rounds) < 2:
        raise SystemExit("need two BENCH_r*.json artifacts to compare")
    return rounds[-2][1], rounds[-1][1]


def main() -> int:
    py = sys.executable
    print("== step 1/3: gen_freshness ==", flush=True)
    subprocess.run([py, os.path.join(REPO, "tools", "gen_freshness.py")], check=True)
    old, new = newest_bench_pair()
    print(
        f"== step 2/3: compare_bench on the driver's final pair "
        f"({os.path.basename(old)} -> {os.path.basename(new)}) ==",
        flush=True,
    )
    subprocess.run(
        [py, os.path.join(REPO, "tools", "compare_bench.py"), old, new], check=True
    )
    # step 3: what the freshly-folded window will actually verify this
    # round, plus the capacity arithmetic — the r15 boundary showed the
    # fronting claim ("the stale cohort gets slots 1-N") must be READ
    # from the computed window, not asserted from the tier policy.
    print("== step 3/3: verify window front + capacity ==", flush=True)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import json

    from exosql_spark import catalog

    acct = catalog.staleness_accounting()
    print(json.dumps(acct, default=str))
    fresh = catalog.load_freshness()
    last = fresh.get("last_green", {})
    win = catalog.verify_window()
    for i, name in enumerate(win[:20], 1):
        print(f"  slot {i:2d}: {name} (last_green r{last.get(name, '-')})")
    if len(win) > 20:
        print(f"  ... {len(win) - 20} more slots")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

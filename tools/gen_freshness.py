#!/usr/bin/env python
"""Regenerate FRESHNESS.json mechanically from the driver's
CORRECTNESS_r*.json artifacts.

    python tools/gen_freshness.py

FRESHNESS.json records, for every catalog entry the driver has ever
verified, the LATEST round in which it was green, plus the latest
round seen at all:

    {"latest_round": 9, "last_green": {"scan_project_filter": 9, ...}}

This file is the input to the catalog's COMPUTED verify window
(exosql_spark.catalog.compute_verify_window): the driver truncates its
correctness run after 50 entries, so with 170+ exact-oracle entries
the window must rotate — new registrations first, then the rested
streaming-parity block, then oldest-green-first fill.  Through round 9
that rotation was a hand-maintained tuple plus prose arithmetic; the
round-9 verdict (Next #3) asked for the bound the code enforces
instead: regenerate this file each round, and tests/test_tools.py
asserts the checked-in copy matches a fresh fold (no stale window) and
that the computed window fronts exactly what the policy says.

Green = the row has no error and every recorded match flag that is
present is true (exact entries need hash_match; rows-only entries
record rows_match only — they never influence window ORDER, which is
computed over exact-oracle entries, but are kept here for the record).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def row_is_green(row: dict) -> bool:
    if row.get("err") is not None:
        return False
    flags = [
        row.get(k)
        for k in ("rows_match", "schema_match", "hash_match")
        if row.get(k) is not None
    ]
    return bool(flags) and all(flags)


def fold(repo: str = REPO) -> dict:
    latest = 0
    last_green: dict[str, int] = {}
    # last_seen: latest round the driver EXECUTED the entry at all,
    # green or not (ADVICE r15): the rows-only tier-1 "one shot" is
    # budgeted on attempts, not successes — last_green alone would
    # re-front a rows-only entry whose one shot errored, every round,
    # forever.
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            if row_is_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return {
        "latest_round": latest,
        "last_green": dict(sorted(last_green.items())),
        "last_seen": dict(sorted(last_seen.items())),
    }


def fingerprints(repo: str = REPO) -> dict[str, str]:
    """Per-entry source fingerprints at regen time (r11 verdict Next
    #3): compute_verify_window compares the code currently on disk
    against these and fronts any entry whose implementing source
    changed since its last driver-green row — the fold alone cannot
    see a rewrite (the r11 asof.py rewrite shipped while join_asof's
    last driver row was r7).  Kept OUT of fold(): the fold is a pure
    function of the CORRECTNESS artifacts and its tripwire test must
    stay green while code changes mid-round — stale fingerprints
    mid-round are the mechanism, not an error."""
    import sys

    if repo not in sys.path:
        sys.path.insert(0, repo)
    from exosql_spark import catalog

    return dict(sorted(catalog.current_fingerprints(catalog.all_queries()).items()))


def snapshot_bench_detail(repo: str = REPO) -> str | None:
    """Copy BENCH_DETAIL.json → BENCH_DETAIL_r{N}.json for the latest
    round with a BENCH_r{N}.json driver artifact (r12 verdict Next #1:
    the live detail file is overwritten every bench run, so without a
    per-round snapshot there is no durable per-query record for
    tools/compare_bench.py to fall back on when a driver artifact's
    tail capture overflows).  Run at round start — the detail on disk
    then IS the previous round's sf0.1 sweep.  Never overwrites an
    existing snapshot (a mid-round local bench run would clobber the
    round record otherwise)."""
    import shutil

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    src = os.path.join(repo, "BENCH_DETAIL.json")
    if not rounds or not os.path.exists(src):
        return None
    dest = os.path.join(repo, f"BENCH_DETAIL_r{max(rounds):02d}.json")
    if os.path.exists(dest):
        return None
    shutil.copyfile(src, dest)
    return dest


def merge_fingerprints(
    current: dict[str, str], prior: dict, folded: dict
) -> dict[str, str]:
    """An entry's recorded fingerprint must be the fingerprint of the
    code its LAST DRIVER-GREEN row verified — not whatever is on disk
    whenever the tool happens to run (r16 lesson: the old
    record-current-for-everything rule meant (a) a mid-round rerun
    silently erased the changed-tier signal for every entry edited
    that round, and (b) the window's documented overflow-carry never
    actually worked — a changed entry that missed the window had its
    fingerprint refreshed at the next round start and went back to
    "unchanged" without ever being re-verified).

    Rule: refresh an entry's fingerprint to the current-disk value
    ONLY when the fold shows a green row in a round the prior file
    had not seen yet (the driver runs after the builder's last commit,
    so the disk at the NEXT round start is exactly the code that green
    row verified).  Entries without a newer green keep their prior
    recorded fingerprint; entries the prior file never recorded
    (new registrations, first migration) take the current value.
    Reruns within a round are therefore idempotent."""
    prior_fps = prior.get("fingerprints", {})
    prior_latest = prior.get("latest_round", -1)
    last_green = folded.get("last_green", {})
    merged = {}
    for name, fp in current.items():
        if name not in prior_fps:
            merged[name] = fp  # newly registered / first migration
        elif last_green.get(name, 0) > prior_latest:
            merged[name] = fp  # fresh green since the prior record
        else:
            merged[name] = prior_fps[name]
    return merged


def main() -> None:
    out = fold()
    prior = {}
    dest = os.path.join(REPO, "FRESHNESS.json")
    if os.path.exists(dest):
        with open(dest) as f:
            prior = json.load(f)
    out["fingerprints"] = merge_fingerprints(fingerprints(), prior, out)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {dest}: latest_round={out['latest_round']}, "
        f"{len(out['last_green'])} entries with a green row, "
        f"{len(out['fingerprints'])} fingerprints"
    )
    snap = snapshot_bench_detail()
    if snap:
        print(f"snapshotted {snap}")


if __name__ == "__main__":
    main()

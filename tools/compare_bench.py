#!/usr/bin/env python
"""Drift-normalized round-over-round bench comparison.

    python tools/compare_bench.py BENCH_r08.json BENCH_r09.json

This box is a VM with persistent scheduling-latency drift (SCALE.md
"environment drift"): raw cross-round totals moved 1.24× between
rounds 7 and 8 with zero code change, proven by a worktree A/B. Every
bench run since round 8 therefore records ``calibration_sec`` — a
data-free whole-stage-codegen scalar (sum over range(10⁹), min of 3)
measured in the same session as the sweep. Dividing the raw
per-query ratio by the calibration ratio separates box drift from
code changes mechanically, which is what this tool prints:

    normalized_ratio(q) = (new_sec(q) / old_sec(q))
                        / (new_calibration / old_calibration)

Caveats it enforces rather than assumes:
- totals are only compared when ``query_set_sha1`` matches (otherwise
  per-query over the set intersection);
- a missing calibration scalar (pre-round-9 artifacts) falls back to
  1.0 with a loud note — the comparison is then RAW, not normalized;
- calibration captures CPU-side drift only; shuffle/scheduling-latency
  drift (the round-8 kind) shows up as a uniform residual across
  untouched queries, which the per-query table makes visible.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver artifacts wrap the bench line under "parsed" — which can
    # be null (tail-capture overflow, e.g. BENCH_r05.json)
    if isinstance(d, dict) and d.get("parsed") is not None:
        return d["parsed"]
    if isinstance(d, dict) and "parsed" in d:
        sys.exit(f"{path}: 'parsed' is null (tail overflow) - no bench data")
    return d


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    cal_old, cal_new = old.get("calibration_sec"), new.get("calibration_sec")
    if cal_old is not None and cal_new is not None and cal_old > 0 and cal_new > 0:
        cal_ratio = cal_new / cal_old
        note = f"calibration {cal_old} -> {cal_new} (box ratio {cal_ratio:.2f})"
    else:
        cal_ratio = 1.0
        note = "NO calibration scalar in one input - ratios are RAW, not normalized"

    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    rows, skipped = [], []
    for name in shared:
        # explicit None/zero test: per_query values are round(min, 3),
        # so a sub-millisecond query legitimately records 0.0 — a
        # truthiness test would silently drop it from the comparison
        if qo[name] is None or qn[name] is None:
            skipped.append(name)
        elif qo[name] == 0:
            # old time 0.0 → ratio undefined; report, don't hide
            skipped.append(f"{name} (old 0.0 -> new {qn[name]})")
        else:
            raw = qn[name] / qo[name]
            rows.append((name, qo[name], qn[name], raw, raw / cal_ratio))
    rows.sort(key=lambda r: -r[4])

    same_set = old.get("query_set_sha1") == new.get("query_set_sha1")
    print(note)
    if same_set and old.get("value") and new.get("value"):
        raw_total = new["value"] / old["value"]
        print(
            f"total {old['value']} -> {new['value']} s: raw {raw_total:.2f}x, "
            f"drift-normalized {raw_total / cal_ratio:.2f}x "
            f"(query_set_sha1 {new.get('query_set_sha1')} matches)"
        )
    else:
        print(
            "query sets differ - totals not comparable; "
            f"per-query over the {len(rows)}-entry intersection:"
        )
    print(f"{'query':42s} {'old_s':>8s} {'new_s':>8s} {'raw':>6s} {'norm':>6s}")
    for name, o, n, raw, norm in rows:
        print(f"{name:42s} {o:8.3f} {n:8.3f} {raw:6.2f} {norm:6.2f}")
    worse = [r for r in rows if r[4] > 1.25]
    better = [r for r in rows if r[4] < 0.8]
    print(
        f"\nsummary: {len(rows)} shared queries; "
        f"{len(worse)} slower >1.25x normalized, {len(better)} faster <0.8x"
    )
    if skipped:
        print(f"skipped (no ratio possible): {', '.join(skipped)}")


if __name__ == "__main__":
    main()

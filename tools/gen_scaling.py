#!/usr/bin/env python
"""Regenerate BENCH_SCALING.json mechanically: run the full bench-tagged
query set at 1×/10×/100× data back-to-back in one session each
(subprocess-per-scale so every point gets a fresh JVM), and assemble the
per-query rows, ratios, top-decade exponents, and column-sum totals.

    python tools/gen_scaling.py [--skip-generate]

Replaces the hand-assembled artifact that let round 8 ship a stale
pre-fix row for dedup_jaccard_exact_pairs (tests/test_tools.py now pins
table/note agreement and totals-as-column-sums). The scaled inputs come
from tools/gen_scaled.py (derived from sf0.1 — NOT driver testdata);
they are regenerated if absent. Run counts mirror the round-8 protocol:
min-of-5 at sf0.1, min-of-3 at 10×, min-of-2 at 100× (each point also
records bench.py's data-free calibration_sec for drift normalization).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = (
    # (label, data dir, bench runs, gen factor or None for driver data)
    ("sf0.1", "/root/testdata/sf0.1", 5, None),
    ("sf1", os.path.join(REPO, ".scaled", "sf1"), 3, 10),
    ("sf10", os.path.join(REPO, ".scaled", "sf10"), 2, 100),
)


def _generator_fingerprint(factor: int) -> str:
    """Identity of the data a scaled dir SHOULD hold: the replication
    factor + a hash of the generator source. A stale dir (pre-fix
    generator, or a different --factor experiment written to the same
    path) must force regeneration — otherwise the 'mechanical' sweep
    silently publishes curves measured on the wrong distribution."""
    import hashlib

    with open(os.path.join(REPO, "tools", "gen_scaled.py"), "rb") as f:
        src_sha = hashlib.sha1(f.read()).hexdigest()[:12]
    return f"factor={factor} gen_scaled_sha={src_sha}"


def _ensure_data(path: str, factor: int) -> None:
    manifest = os.path.join(path, "MANIFEST.txt")
    want = _generator_fingerprint(factor)
    if os.path.exists(manifest):
        with open(manifest) as f:
            if f.read().strip() == want:
                return
        print(f"stale scaled data at {path} (manifest mismatch)", flush=True)
    print(f"generating {path} (factor {factor})...", flush=True)
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_scaled.py"),
         "--factor", str(factor), "--out", path],
        check=True, cwd=REPO,
    )
    with open(manifest, "w") as f:
        f.write(want + "\n")


def _run_point(label: str, sf_dir: str, runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    # a lingering exclude (e.g. the documented round-8 100x protocol)
    # would silently shrink every point while the artifact claims full
    # coverage — this sweep always runs the whole bench set
    env.pop("SPARK_GRAFT_BENCH_EXCLUDE", None)
    # keep the repo's BENCH_DETAIL.json reserved for the driver's sf0.1
    # record — scale points write their detail to a scratch path
    env["SPARK_GRAFT_DETAIL_PATH"] = os.path.join(
        "/tmp", f"bench_detail_scaling_{label.replace('.', '_')}.json"
    )
    print(f"running {label} ({sf_dir}, min-of-{runs})...", flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, check=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    ).stdout
    # last JSON line WITH the per-query map (bench.py's final line is
    # the compact no-map summary since round 13)
    return next(
        parsed
        for line in reversed(out.strip().splitlines())
        if (parsed := json.loads(line)).get("queries")
    )


def _live_bench_names() -> set[str]:
    """The current catalog's bench-tagged entry names — the remeasure
    exclude list must come from HERE, not from the artifact's recorded
    set (which lags behind newly bench-tagged entries)."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from exosql_spark.catalog import all_queries

    return {n for n, q in all_queries().items() if q.bench}


def _recompute_row(row: dict) -> None:
    row.pop("ratio_10x", None)
    row.pop("ratio_100x", None)
    row.pop("exponent_top_decade", None)
    if "sf1_sec" in row and row.get("sf0.1_sec"):
        row["ratio_10x"] = round(row["sf1_sec"] / row["sf0.1_sec"], 2)
    if "sf10_sec" in row and row.get("sf0.1_sec"):
        row["ratio_100x"] = round(row["sf10_sec"] / row["sf0.1_sec"], 2)
    if "sf10_sec" in row and row.get("sf1_sec"):
        row["exponent_top_decade"] = round(
            math.log10(row["sf10_sec"] / row["sf1_sec"]), 2
        )


def _remeasure(spec: str) -> None:
    """``--remeasure name:point:runs`` — re-run ONE query at ONE scale
    point with a higher run count and rewrite the artifact mechanically
    (row seconds, derived ratios/exponent, totals, dependent notes).
    For when a min-of-2 point lands in one of this box's documented
    CPU-steal windows (SCALE.md "environment drift"): the re-measure is
    recorded in the row's ``remeasured`` map so the mixed estimator is
    visible, never silent."""
    name, label, runs_s = spec.split(":")
    runs = int(runs_s)
    points = {p[0]: p for p in POINTS}
    if label not in points:
        raise SystemExit(f"unknown point {label!r} (have {sorted(points)})")
    _, sf_dir, _, factor = points[label]
    if factor:
        _ensure_data(sf_dir, factor)

    path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(path) as f:
        art = json.load(f)
    if name not in art["queries"]:
        raise SystemExit(f"unknown query {name!r}")

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    # exclude = the LIVE catalog's bench set minus the target (ADVICE
    # r12: building it from the artifact's recorded set silently RAN —
    # and discarded the timings of — any bench entry added since the
    # artifact was generated, multiplying remeasure cost at sf10)
    env["SPARK_GRAFT_BENCH_EXCLUDE"] = ",".join(_live_bench_names() - {name})
    env["SPARK_GRAFT_DETAIL_PATH"] = "/tmp/bench_detail_remeasure.json"
    print(f"re-measuring {name} at {label} (min-of-{runs})...", flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, check=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    ).stdout
    # bench.py prints two JSON lines (r13 contract): the LAST is the
    # compact summary without the per-query map — take the last line
    # that carries one
    sec = next(
        parsed["queries"][name]
        for line in reversed(out.strip().splitlines())
        if (parsed := json.loads(line)).get("queries")
    )

    row = art["queries"][name]
    row[f"{label}_sec"] = sec
    row.setdefault("remeasured", {})[label] = f"min_of_{runs}"
    _recompute_row(row)
    art["totals"] = {
        lab: round(
            sum(r[f"{lab}_sec"] for r in art["queries"].values() if f"{lab}_sec" in r),
            2,
        )
        for lab, _, _, _ in POINTS
    }
    note = art.get("jaccard_ppjoin_note")
    if note and name == "dedup_jaccard_exact_pairs":
        note["post_filter_sec"] = {
            "sf0.1": row.get("sf0.1_sec"),
            "sf1": row.get("sf1_sec"),
            "sf10": row.get("sf10_sec"),
        }
    snote = art.get("semdedup_autok_note")
    if snote and name == "dedup_semantic":
        snote["table_row_sec"] = {
            "sf0.1": row.get("sf0.1_sec"),
            "sf1": row.get("sf1_sec"),
            "sf10": row.get("sf10_sec"),
        }
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(json.dumps({name: row}))


def _add(names_csv: str) -> None:
    """Measure ONLY the named (newly bench-tagged) queries at every
    scale point and merge their rows into BENCH_SCALING.json — totals
    and per-row ratios/exponents recomputed, everything else left
    alone.  The full three-point sweep costs ~an hour at 62 entries;
    adding two entries must not."""
    names = {n.strip() for n in names_csv.split(",") if n.strip()}
    live = _live_bench_names()
    unknown = names - live
    if unknown:
        raise SystemExit(f"not bench-tagged in the live catalog: {sorted(unknown)}")

    path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(path) as f:
        art = json.load(f)

    for label, sf_dir, runs, factor in POINTS:
        if factor:
            _ensure_data(sf_dir, factor)
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
        env["SPARK_GRAFT_BENCH_EXCLUDE"] = ",".join(sorted(live - names))
        env["SPARK_GRAFT_DETAIL_PATH"] = "/tmp/bench_detail_add.json"
        print(f"measuring {sorted(names)} at {label} (min-of-{runs})...", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, check=True,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        ).stdout
        measured = next(
            parsed["queries"]
            for line in reversed(out.strip().splitlines())
            if (parsed := json.loads(line)).get("queries")
        )
        for name in names:
            row = art["queries"].setdefault(name, {})
            row[f"{label}_sec"] = measured[name]
            row.setdefault("remeasured", {})[label] = f"min_of_{runs}"

    for name in names:
        _recompute_row(art["queries"][name])
    art["totals"] = {
        lab: round(
            sum(r[f"{lab}_sec"] for r in art["queries"].values() if f"{lab}_sec" in r),
            2,
        )
        for lab, _, _, _ in POINTS
    }
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(json.dumps({n: art["queries"][n] for n in sorted(names)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument("--remeasure", metavar="NAME:POINT:RUNS")
    ap.add_argument("--add", metavar="NAME[,NAME...]")
    args = ap.parse_args()

    if args.remeasure:
        _remeasure(args.remeasure)
        return
    if args.add:
        _add(args.add)
        return

    if not args.skip_generate:
        for _, path, _, factor in POINTS:
            if factor:
                _ensure_data(path, factor)

    results = {label: _run_point(label, d, r) for label, d, r, _ in POINTS}

    names = sorted(results["sf0.1"]["queries"])
    queries: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for label, _, _, _ in POINTS:
            sec = results[label]["queries"].get(name)
            if sec is not None:
                row[f"{label}_sec"] = sec
        if "sf1_sec" in row and row.get("sf0.1_sec"):
            row["ratio_10x"] = round(row["sf1_sec"] / row["sf0.1_sec"], 2)
        if "sf10_sec" in row and row.get("sf0.1_sec"):
            row["ratio_100x"] = round(row["sf10_sec"] / row["sf0.1_sec"], 2)
        if "sf10_sec" in row and row.get("sf1_sec"):
            row["exponent_top_decade"] = round(
                math.log10(row["sf10_sec"] / row["sf1_sec"]), 2
            )
        queries[name] = row

    totals = {
        label: round(
            sum(r[f"{label}_sec"] for r in queries.values() if f"{label}_sec" in r),
            2,
        )
        for label, _, _, _ in POINTS
    }
    out = {
        "basis": (
            "tools/gen_scaling.py: full bench-tagged set at sf0.1 (driver "
            "testdata, min_of_5), sf1-equivalent (10x, min_of_3) and "
            "sf10-equivalent (100x, min_of_2), one fresh JVM per point, "
            "back-to-back on one box. Scaled inputs derived from sf0.1 by "
            "tools/gen_scaled.py key-offset replication (NOT driver "
            "testdata). No entry excluded at any point. totals = column "
            "sums over all rows; calibration_sec per point for drift "
            "normalization."
        ),
        # recorded from each point's actual bench output, not assumed
        "excluded_at_sf10": sorted(results["sf10"].get("excluded", [])),
        "excluded_by_point": {
            label: sorted(results[label].get("excluded", []))
            for label, _, _, _ in POINTS
        },
        "calibration_sec": {
            label: results[label].get("calibration_sec")
            for label, _, _, _ in POINTS
        },
        "estimators": {label: f"min_of_{r}" for label, _, r, _ in POINTS},
        "queries": queries,
        "totals": totals,
    }

    # carry forward the historical pre/post-fix notes, refreshed to the
    # new run so tests/test_tools.py's table↔note agreement holds
    prev_path = os.path.join(REPO, "BENCH_SCALING.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        jrow = queries.get("dedup_jaccard_exact_pairs", {})
        note = prev.get("jaccard_ppjoin_note")
        if note and jrow:
            note["post_filter_sec"] = {
                "sf0.1": jrow.get("sf0.1_sec"),
                "sf1": jrow.get("sf1_sec"),
                "sf10": jrow.get("sf10_sec"),
            }
            out["jaccard_ppjoin_note"] = note
        if "semdedup_autok_note" in prev:
            snote = prev["semdedup_autok_note"]
            srow = queries.get("dedup_semantic", {})
            if srow:
                # the sweep's own row is mechanical — embed it as data,
                # never as prose numbers that go stale on the next run
                snote["table_row_sec"] = {
                    "sf0.1": srow.get("sf0.1_sec"),
                    "sf1": srow.get("sf1_sec"),
                    "sf10": srow.get("sf10_sec"),
                }
            out["semdedup_autok_note"] = snote

    with open(prev_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"totals": totals, "calibration": out["calibration_sec"]}))


if __name__ == "__main__":
    main()

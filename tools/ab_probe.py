#!/usr/bin/env python
"""Single-shot A/B probe: run the named catalog queries from whichever
repo root is first on sys.path (caller sets PYTHONPATH to HEAD or a
worktree), warmup + min-of-N each, print ONE JSON line.

Process-level interleaving is the only honest A/B on this box: two
code versions can't share a SparkSession, and the r7→r8 drift episode
(SCALE.md "environment drift") showed single-process sequencing is
confounded by arrival-time CPU-steal storms.  The driver script runs
HEAD and the snapshot worktree ALTERNATELY several times and takes the
min over iterations per side, which cancels slow-varying box drift.

Usage: PYTHONPATH=/path/to/repo python tools/ab_probe.py q1 q2 ...
"""
import json
import os
import sys
import time

from exosql_spark.cache import release_caches
from exosql_spark.catalog import all_queries
from exosql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def main(names):
    spark = get_spark(
        app_name="ab_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    out = {}
    for name in names:
        fn = qs[name].fn
        release_caches(spark)
        fn(spark, SF_DIR).count()  # warmup
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
    release_caches(spark)
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main(sys.argv[1:])

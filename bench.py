#!/usr/bin/env python
"""Headline benchmark: runs the catalog's bench-tagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = sum of per-query wall seconds (post-warmup, best of 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

from exosql_spark.catalog import all_queries
from exosql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _run_once(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()  # materialize the full result
    assert n >= 0
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="exosql_spark_bench")
    bench = {n: q for n, q in all_queries().items() if q.bench}

    # Warm up the JVM/codegen/parquet footer caches on the smallest query.
    for q in bench.values():
        q.fn(spark, SF_DIR).count()
        break

    per_query: dict[str, float] = {}
    for name, q in bench.items():
        best = min(_run_once(q.fn, spark, SF_DIR) for _ in range(2))
        per_query[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

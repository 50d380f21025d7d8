"""Time named catalog queries in isolation with the bench methodology
(one untimed warm run, then MIN of N timed runs of build+count).

Usage: python tools/time_queries.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RUNS (default 5).
Prints one line per query: name  min  median  all-runs.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exosql_spark.cache import release_caches  # noqa: E402
from exosql_spark.catalog import all_queries  # noqa: E402
from exosql_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))


def main():
    names = sys.argv[1:]
    spark = get_spark(
        app_name="time_queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    for name in names:
        q = qs[name]
        release_caches(spark)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        q.fn(spark, SF_DIR).count()
        times = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"run{i}:{name}")
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}  min={min(times):.3f}  med={statistics.median(times):.3f}  "
            f"runs={[round(t, 3) for t in times]}",
            flush=True,
        )
    release_caches(spark)
    spark.stop()


if __name__ == "__main__":
    main()

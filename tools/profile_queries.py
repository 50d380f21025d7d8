"""Profile named catalog queries: wall seconds + Spark job count per
run (a high job count on a small input marks an entry as
scheduling/iteration-overhead-bound rather than data-bound — guide §1).

Usage: python tools/profile_queries.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RUNS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exosql_spark.cache import release_caches  # noqa: E402
from exosql_spark.catalog import all_queries  # noqa: E402
from exosql_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "3"))


def main():
    names = sys.argv[1:]
    spark = get_spark(
        app_name="profile_queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    qs = all_queries()
    for name in names:
        q = qs[name]
        release_caches(spark)
        q.fn(spark, SF_DIR).count()  # warm
        best = None
        for i in range(RUNS):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            if best is None or dt < best[0]:
                best = (dt, n_jobs)
        print(f"{name}  min={best[0]:.3f}s  jobs/run={best[1]}", flush=True)
    release_caches(spark)
    spark.stop()


if __name__ == "__main__":
    main()

"""Dump .explain("formatted") for named catalog queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX name1 name2 ...
Writes OUTDIR/<name>_<SUFFIX>.txt — the r18 optimization round's
before/after plan evidence (run once from the pre-change worktree with
SUFFIX=before, once from the optimized tree with SUFFIX=after).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exosql_spark.catalog import all_queries  # noqa: E402
from exosql_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="dump_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, len(txt), "chars")
    spark.stop()


if __name__ == "__main__":
    main()

"""Profile registry queries: dump .explain("formatted") and time them
with the bench's methodology (min-of-REPS of df.count() on a warm
session).

Usage::

    python tools/profile_query.py q1 q2 ...            # time + plan
    SPARK_GRAFT_PLAN_DIR=plans/r12 SPARK_GRAFT_PLAN_SUFFIX=_before \
        python tools/profile_query.py q1               # also write plan file

Plans go to $SPARK_GRAFT_PLAN_DIR/<name>$SPARK_GRAFT_PLAN_SUFFIX.txt when
SPARK_GRAFT_PLAN_DIR is set.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatasearchpro_spark.registry import QUERIES  # noqa: E402
from bigdatasearchpro_spark.session import get_spark  # noqa: E402
from bigdatasearchpro_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_query.py <query> [query ...]")
    spark = get_spark("profile")
    load_table(spark, SF_DIR, "nation").count()  # warm up
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        fn = QUERIES[name]
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}{suffix}.txt"), "w",
                      encoding="utf-8") as f:
                f.write(plan)
        times = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            n = fn(spark, SF_DIR).count()
            times.append(time.time() - t0)
        print(f"{name}: min={min(times):.3f} rows={n} "
              f"all={[round(t, 3) for t in times]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

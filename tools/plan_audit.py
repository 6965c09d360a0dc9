"""Mechanical anti-pattern audit over the bench suite's plans.

For every BENCH_QUERIES entry, builds the DataFrame (no execution
unless the entry itself materializes) and flags, from the formatted
plan string:

- BatchEvalPython           (row-at-a-time Python UDF in the plan)
- CartesianProduct / BroadcastNestedLoopJoin
- SortMergeJoin             (worth a look when a side is tiny)
- global Sort without a TakeOrdered/limit above it
- parquet scans whose ReadSchema lists every column (no pruning)

Output: one line per query with its flags (empty = clean). Plans with
a localCheckpoint scan at the root are marked [ckpt] — their internal
plan is not visible here (see the dedicated *_before/_after captures).
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatasearchpro_spark.registry import QUERIES  # noqa: E402
from bigdatasearchpro_spark.session import get_spark  # noqa: E402
from bigdatasearchpro_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    import bench

    spark = get_spark("plan-audit")
    load_table(spark, SF_DIR, "nation").count()
    names = sys.argv[1:] or bench.BENCH_QUERIES
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: MISSING")
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        flags = []
        if "ExistingRDD" in plan.split("\n", 3)[2]:
            flags.append("ckpt")
        for pat in ("BatchEvalPython", "CartesianProduct",
                    "BroadcastNestedLoopJoin"):
            n = plan.count(pat)
            if n:
                flags.append(f"{pat}x{n}")
        n_smj = plan.count("SortMergeJoin")
        if n_smj:
            flags.append(f"SortMergeJoinx{n_smj}")
        # global sorts: Sort nodes marked as global (Exchange rangepartitioning)
        n_range = plan.count("rangepartitioning")
        has_tops = "TakeOrderedAndProject" in plan
        if n_range and not has_tops:
            flags.append(f"globalSortx{n_range}")
        n_arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        if n_arrow:
            flags.append(f"arrowx{n_arrow}")
        wide = len(re.findall(r"ReadSchema: struct<[^>]{400,}", plan))
        if wide:
            flags.append(f"wideScanx{wide}")
        print(f"{name}: {' '.join(flags) if flags else 'clean'}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Print the physical plan of any registry query.

Usage::

    python tools/explain.py <query_name> [sf_dir]

Shows the formatted plan (scans with PushedFilters/ReadSchema, exchanges,
codegen spans) plus the parsed plan facts the test suite gates on —
the fastest way to audit whether an operator still has the plan shape
SCALING.md claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatasearchpro_spark.plans import (  # noqa: E402
    partition_filters,
    pushed_filters,
    read_schema,
    shuffle_count,
    wholestage_codegen_count,
)
from bigdatasearchpro_spark.registry import QUERIES  # noqa: E402
from bigdatasearchpro_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in QUERIES:
        names = "\n  ".join(sorted(QUERIES))
        print(f"usage: python tools/explain.py <query> [sf_dir]\nqueries:\n  {names}")
        raise SystemExit(1)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark("explain")
    df = QUERIES[name](spark, sf_dir)
    # parse before explain: the first plan render caches scan metadata
    # strings, so parse while the widened-metadata conf is in effect
    facts = {
        "shuffles": shuffle_count(df),
        "codegen spans": wholestage_codegen_count(df),
        "pushed filters": pushed_filters(df),
        "partition filters": [p for p in partition_filters(df) if p],
        "read schemas": read_schema(df),
    }
    df.explain("formatted")
    print("— parsed plan facts —")
    for k, v in facts.items():
        print(f"{k:<18} {v}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``bigdatasearchpro_spark``; this module is
a thin adapter over its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatasearchpro_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the COMPOSED end-user search path at sf0.001 —
    an ES query string (field scoping + boolean grouping, the
    reference's `?q=` UX, indexView.html:13-19) filters the corpus,
    the survivors BM25-rank with statistics over the filtered set,
    and the page collapses to one hit per source.  Analyzer +
    query_string + BM25 + collapse in one plan, DuckDB-oracled as
    l3_flagship_search."""
    return QUERIES["l3_flagship_search"](spark, "/root/testdata/sf0.001")


# Driver-coverage ordering (the driver checks the FIRST 50 entries of
# queries() each round): the round's FIXES, NEW entries, and flagship
# never-checked picks are guaranteed a verdict via the front list;
# every other entry is ordered STALEST-FIRST — never-driver-checked
# entries (no verdict in any CORRECTNESS_r*.json) come before checked
# ones, then ascending by last-verdict round.  Ages are computed from
# ALL CORRECTNESS_r*.json files on disk, so the rotation stays honest
# without hand-maintained lists.
#
# INVARIANT (enforced by tools/check_window.py AND
# tests/test_window.py): outside the front list, no younger entry may
# precede a staler one — the round-7 back-pinning list that silently
# displaced st5_stateful_sessionize is gone.  The front list is the
# only reviewed exception; run `python tools/check_window.py` after
# ANY registry or front-list change.
#
# Round-11 budget (the final drain): FRONT carries ONLY this round's
# fixes/new entries (5 slots), so the 21 never-driver-checked
# survivors from r10 fill the first non-front slots stalest-first and
# r11 reaches never-checked = 0 with ~24 slots left over for
# freshness re-verdicts of the stalest green entries (r10 verdict
# ask #7).
# ROUND-12 NOTE: REPLACE this list with that round's fixes/new
# entries (keeping green r11 names here would waste window slots
# re-verifying them); run `python tools/check_window.py` after any
# change.
_R11_FIXED_OR_NEW = (
    # r10 verdict ask #1: the one red r10 row — oracle typing artifact
    # (CAST(sum(n_chars) AS BIGINT)); values were already identical
    "l3_agg_multi_terms",
    # r10 verdict ask #4: bounded percolation — per-query match counts
    # aggregated map-side, no doc x query pair set anywhere
    "l3_percolate_counts",
    # r10 verdict ask #5: the radius-7 listing entry now caps emission
    # at each canonical-left doc's 10 nearest pairs (exact two-stage
    # top-k pruned BEFORE the dedup exchange)
    "l2_simhash_pairs",
    # r10 ADVICE fixes ride the rollup entries back through the
    # driver: one-job-per-rollup-index guard (put), week-over-day
    # calendar nesting, tolerance-based histogram multiples, and
    # term/terms value flooring onto stored buckets (search)
    "s49_rollup_job",
    "s51_rollup_search",
)

def _verdict_ages() -> dict[str, int]:
    """name → round number of the entry's most recent driver verdict,
    scanned from every CORRECTNESS_r*.json in the repo.  Entries never
    checked are absent (treated as age 0 → checked first)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    ages: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as f:
                names = json.load(f)
        except (OSError, ValueError):
            continue
        for n in names:
            ages[n] = max(ages.get(n, 0), rnd)
    return ages


FRONT = _R11_FIXED_OR_NEW


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, front
    list first, then pure stalest-first (never-checked before checked,
    then ascending last-verdict round; registry order breaks ties)."""
    front = [n for n in FRONT if n in QUERIES]
    ages = _verdict_ages()
    order = list(QUERIES)
    rest = sorted(
        (n for n in order if n not in front),
        key=lambda n: (ages.get(n, 0), order.index(n)),
    )
    return {n: QUERIES[n] for n in (*front, *rest)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)

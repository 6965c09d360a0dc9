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
# Round-12 budget: with never-checked at 0 (r11), FRONT carries ONLY
# this round's fixes/new entries (9 slots); the remaining ~41 window
# slots are all freshness re-verdicts of the stalest green entries
# (r11 verdict ask #5: >= 40 re-verdicts of r<=5-aged entries —
# stalest-first ordering delivers that by construction).
# ROUND-13 NOTE: REPLACE this list with that round's fixes/new
# entries (keeping green r12 names here would waste window slots
# re-verifying them); run `python tools/check_window.py` after any
# change.
_R12_FIXED_OR_NEW = (
    # r11 verdict ask #7: the composed flagship entry() now smokes —
    # query_string filter + BM25-over-subset + collapse, oracled
    "l3_flagship_search",
    # r11 verdict ask #2: the bounded ngram listing — per-doc cap with
    # in-join verification, bucket-local pruning, QUALIFY oracle
    "l2_ngram_jaccard_topk",
    # r11 verdict ask #3: DSL percolation — term+range+phrase rules
    # through the listing AND the bounded counts kernel
    "l3_percolate_mixed",
    "l3_percolate_mixed_counts",
    # r12 follow-through: the per-doc top-k form of the mixed kernel
    # (residual gate before slot assignment) — completes the family
    "l3_percolate_mixed_topk",
    # r12 grammar extension: must_not / exists / prefix clauses through
    # the listing and both bounded kernels (new entries, never checked)
    "l3_percolate_dsl",
    "l3_percolate_dsl_counts",
    "l3_percolate_dsl_topk",
    # r12: streaming alerting over the full DSL — the mixed top-k
    # kernel per micro-batch, zero shuffle/state, append-exact
    "st17_streaming_percolate_dsl",
    # r12: minimum_should_match term-clause grammar (int + percentage)
    # through the listing and both term-set kernels
    "l3_percolate_msm",
    "l3_percolate_msm_counts",
    "l3_percolate_msm_topk",
    # r12: bool.should residual composition (clause-level msm) through
    # the listing and the counts kernel
    "l3_percolate_should",
    "l3_percolate_should_counts",
    # r12: the percolate highlight surface (which terms matched)
    "l3_percolate_highlight",
    # r11 ADVICE: unrounded-threshold fix changed this entry's
    # predicate AND its oracle — re-verdict both
    "l2_ngram_jaccard_pairs",
    # r11 ADVICE + ask #4: null-text guard, duplicate-registration
    # dedup, and the chunked registered side in both bounded kernels
    "l3_percolate_counts",
    "l3_percolate_topk",
    # r11 verdict ask #1: the loser-set anti-join dropped its
    # mandatory broadcast hint (plan change in the production path)
    "l2_dedup_resolution",
    # r11 ADVICE: histogram-multiple tolerance now scales with both
    # intervals (api.py rollup search)
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


FRONT = _R12_FIXED_OR_NEW


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

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
    """Flagship query: BM25-scored top-10 keyword search over the
    documents table at sf0.001 — the reference's end-user query path
    (ES-delegated `?q=` search, indexView.html:13-19) run natively."""
    return QUERIES["l3_search_bm25_topk"](spark, "/root/testdata/sf0.001")


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
# Round-8 budget (the r7-verdict drain plan): 152 entries have never
# had a driver verdict.  Front = this round's new/fixed entries +
# st5_stateful_sessionize (the r3-stale entry the r7 tool flagged as
# displaced) + the judge's flagship never-checked picks; the rest of
# the window auto-fills with never-checked entries in registry order.
# ~44 backlog entries drain this round; the remainder drains over
# rounds 9-10 (never-checked sort first until the class is empty, then
# the r3 cohort is next).
# ROUND-9 NOTE: REPLACE this list with that round's fixes/new entries.
# Leaving these names here after they get their r8 verdicts would waste
# 37 window slots re-verifying green entries — the stalest-first tail
# already handles everything else (the ~107 remaining never-checked
# entries fill the r9 window automatically when FRONT shrinks).
_R8_FIXED_OR_NEW = (
    # the r3-stale entry displaced from the r7 window (verdict ask #2)
    "st5_stateful_sessionize",
    # round-8 new operators (verdict asks #4, #6, #7, #9)
    "s43_ingest_grok_dissect",
    "s44_bulk_op_types",
    "l3_eql_until",
    "s45_cluster_introspection",
    "l4_knn_num_candidates",
    "st16_streaming_eql",
    # code-touched this round, never driver-checked: ingest append/
    # fingerprint NULL semantics (ADVICE) and the sql_query guard
    # rewrite (ADVICE) feed these two entries
    "s42_ingest_kv_fingerprint",
    "s26_sql_endpoint",
    # the judge's flagship never-checked picks (verdict ask #2):
    # highest-blast-radius families first
    "l5_pipeline_curation_v3",
    "l5_pipeline_curation_v4",
    "l5_pipeline_curation_v5",
    "l5_pipeline_curation_v6",
    "l3_has_child",
    "l3_has_parent",
    "l3_script_score",
    "l3_runtime_field",
    "l3_eql_sequence",
    "l3_nested_query",
    "s31_transform_pivot",
    "l5_substring_dedup",
    "l4_rrf_hybrid_topk",
    "l4_sparse_vector_topk",
    "l3_span_near_query",
    "l3_span_not_query",
    "q2_min_cost_supplier",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "l3_pinned_query",
    "s35_index_resize",
    "l3_agg_terms_partition",
    "l1_fingerprint_dedup",
    "l3_synonym_search",
    "s37_downsample_tsdb",
    "l6_video_scene_cuts",
    "l5_url_dedup",
    "l5_curriculum_order",
    "l3_agg_change_point",
    "l3_analyzer_phonetic",
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


FRONT = _R8_FIXED_OR_NEW


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

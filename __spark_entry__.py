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


# Driver-coverage ordering (the driver checks entries in queries()
# order and may stop early on a budget): the round's FIXES and NEW
# entries are guaranteed a verdict, then every other entry is ordered
# by verdict AGE — the entry whose last driver verdict is oldest goes
# first.  Ages are computed from ALL CORRECTNESS_r*.json files on
# disk, so the rotation stays honest without hand-maintained lists
# (the r4-verdict ask: prioritize by verdict age, not by membership in
# the last window).
#
# Round-5 note: 22 NEW entries + 5 code-changed entries outrank the
# age queue this round, so a 50-slot window carries 23 of the 33
# r1-latest entries; the remaining 10 r1 carries are the window's
# overflow (they lead the age queue next round).  First-ever verdicts
# for new operators > refreshing old-but-valid verdicts.
_R5_FIXED_OR_NEW = (
    # q12's oracle typing fix (the sole r4 red row — ::BIGINT casts)
    "q12_shipmode_priority",
    # round-5 additions
    "l6_decode_jpeg",
    "l3_analyzer_stemmed",
    "l3_nested_field_query",
    "l4_ann_ivfpq_topk",
    "l3_analyzer_whitespace",
    "s14_delete_by_query",
    "s15_update_by_query",
    "s16_cat_indices",
    "l5_ngram_repetition",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q15_top_supplier",
    "s17_orc_text_roundtrip",
    "w6_distribution_funcs",
    "l3_exists_query",
    "l3_analyzer_cjk",
    "l3_mapped_analyzer_search",
    "ts4_resample_ffill",
    "l2_semantic_dedup",
    "l3_function_score",
    "l5_quality_logit",
    "l6_decode_video",
    "l3_boosting_query",
    "l3_terms_lookup",
    "l3_percolate",
    "s18_rollover",
    "l3_agg_terms_subagg",
    "l3_agg_nested_terms",
    "l3_field_collapse",
    "q6_forecast_revenue",
    "s19_schema_evolution",
    "l3_percolate_many",
    "l5_blocklist_filter",
    "f7_hash_funcs",
    "l4_batch_query_topk",
    "l3_highlight_fragments",
    "l5_dataset_card",
    # entries whose implementing code changed this round
    "l5_segment_dedup",
    "s12_force_merge",
    "l3_scroll_export",
    "s11_alias_scroll",
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    front = [n for n in _R5_FIXED_OR_NEW if n in QUERIES]
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

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
# order and may stop early on a budget): every entry should get a fresh
# verdict at least every other round, with the round's FIXES and NEW
# entries guaranteed a verdict.
#
# Round-4 priority:
# (1) the two oracled entries whose oracle the driver has NEVER run
#     (their only verdicts predate the r2 oracle addition — VERDICT r3
#     "what's wrong" #1);
# (2) entries new or code-changed this round (per-field boosts,
#     multi-field sort, portable split twin, the now-oracled _all
#     scatter-gather, the real-codec decode, the CDC determinism +
#     crash-safety rework, and everything the near-dup cache rework
#     touches);
# (3) every entry NOT in the previous round's 50-slot window (their
#     verdicts are stale r1/r2 carries) — computed from the latest
#     CORRECTNESS_r*.json so the rotation stays honest without
#     hand-maintaining lists;
# (4) the remaining (freshly-r3-verified) entries, registration order.
_R4_NEVER_DRIVER_RUN = (
    "l2_ngram_jaccard_pairs",
    "l5_lang_id",
)
_R4_NEW_OR_CHANGED = (
    # session-3 additions: ES query-DSL extensions and the
    # corpus-curation ring
    "l3_agg_significant_terms",
    "l3_agg_composite",
    "l3_more_like_this",
    "l3_rescore_topk",
    "l3_suggest_term",
    "l3_suggest_completion",
    "l5_segment_dedup",
    "l5_decontaminate",
    "l5_pack_sequences",
    "l3_scroll_export",
    "s10_reindex",
    "s11_alias_scroll",
    "q7_volume_shipping",
    "q18_large_orders",
    "st9_stream_static_join",
    "l3_phrase_prefix_match",
    "p7_quarantine_ingest",
    "s12_force_merge",
    "l3_msearch",
    "ts3_gap_detection",
    "s13_snapshot_restore",
    "q12_shipmode_priority",
    "q19_disjunctive_predicate_revenue",
    # session-2 additions: ES aggregations surface, search_after,
    # correlated subqueries — and the rewritten LWW dedup (narrow
    # winner selection; l1 + every bulk-sink path runs through it)
    "l3_agg_terms",
    "l3_agg_date_histogram",
    "l3_agg_histogram",
    "l3_agg_range_filters",
    "l3_agg_extended_stats",
    "l3_agg_percentiles",
    "l3_agg_top_hits",
    "l3_search_after",
    "q4_exists_order_priority",
    "q17_scalar_correlated",
    "q22_anti_global_scalar",
    "l1_dedup_last_write_wins",
    "l3_multifield_boosted",
    "l3_search_sorted_multi",
    "l5_dataset_split_md5",
    "l3_search_all_indices",
    "l6_decode_real_codec",
    "st8_streaming_cdc_apply",
    "s4_s6_ddl_lifecycle",
    "s3_bulk_sink_roundtrip",
    "l5_dataset_split",
    "l6_decode_features",
    "l2_minhash_lsh_pairs",
    "l2_simhash_pairs",
    "l5_pipeline_end_to_end",
)


def _last_round_window() -> set[str]:
    """Entry names checked in the most recent driver round (the keys of
    the latest CORRECTNESS_r*.json) — these have the freshest verdicts
    and therefore go LAST this round."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    reports = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not reports:
        return set()
    try:
        with open(reports[-1], encoding="utf-8") as f:
            return set(json.load(f))
    except (OSError, ValueError):
        return set()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    front = [
        n for n in (*_R4_NEVER_DRIVER_RUN, *_R4_NEW_OR_CHANGED) if n in QUERIES
    ]
    recent = _last_round_window()
    stale = [n for n in QUERIES if n not in front and n not in recent]
    fresh = [n for n in QUERIES if n not in front and n in recent]
    return {n: QUERIES[n] for n in (*front, *stale, *fresh)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)

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
# Round-3 priority: (1) the three entries that failed in r2 (reshaped
# this round — a6/l6 array-cell canonicalizer errors, l5 hash
# mismatch), (2) entries new this round, (3) the rows-only entries
# (weakest standing evidence), (4) everything else in registration
# order.
_R3_FIXED = (
    "a6_exact_quantiles",
    "l6_decode_features",
    "l5_repetition_stats",
)
_R3_NEW = (
    "l3_qs_fuzzy",
    "l3_qs_proximity",
    "l3_qs_boost_topk",
    "l5_chunk_documents",
    "l5_stratified_sample",
    "l5_pipeline_end_to_end",
    "l3_search_all_indices",
    "l2_simhash_pairs_md5",
    "l2_dedup_resolution_md5",
    "l5_vocab_topk",
    "a9_kll_quantiles",
    "a10_hll_segment_distinct",
    "a11_hll_overlap",
    "ts2_resample_interpolate",
    "l3_qs_min_should_match",
    "st7_windowed_distinct",
    "s9_upsert_merge",
    "l4_quantize_int8",
    "l5_bigram_lm_scores",
    "st8_streaming_cdc_apply",
    "w5_ntile_percent_rank",
    "l6_patch_grid",
    "set2_multiset_ops",
    "f6_null_handling_funcs",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    front = [n for n in (*_R3_FIXED, *_R3_NEW) if n in QUERIES]
    rows_only = [n for n in QUERIES if n not in ORACLES and n not in front]
    rest = [n for n in QUERIES if n not in front and n not in rows_only]
    return {n: QUERIES[n] for n in (*front, *rows_only, *rest)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)

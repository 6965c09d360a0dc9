"""Deduplication operators (SURVEY.md L1 + the sink's LWW semantics).

The reference's only merge semantics is Elasticsearch's index-op
last-write-wins on ``_id`` (``BulkProcessImpl.java:124``): repeated ids
overwrite, null ids auto-generate (duplicates survive). Expressed
Spark-side as window/group dedup *before* the write so the sink itself
stays append-only and idempotent.

Scale notes: all variants are a single hash-shuffle on the key. At
100 TB the key shuffle is unavoidable (semantic requirement); skewed
keys are handled by AQE skew-join/agg splitting, and
``dedup_exact_by_hash`` pre-hashes wide payloads down to a 32-byte key
so shuffle volume is keys + row ids, not documents.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal — ``dropDuplicates`` (hash shuffle + first
    row per key, map-side partial aggregation applies)."""
    return df.dropDuplicates(list(cols) if cols else None)


def dedup_last_write_wins(
    df: DataFrame,
    key: str,
    order_by: Sequence[str],
    *,
    keep: str = "last",
) -> DataFrame:
    """Keep exactly one row per ``key``, deterministically.

    ``keep='last'`` by ``order_by`` descending reproduces ES
    last-write-wins for repeated ``_id``; ``keep='first'`` gives
    keep-oldest. Deterministic tie-break: callers must pass a total
    order in ``order_by`` (the oracle uses the same ORDER BY).

    Implemented as ``max_by/min_by(struct(row), struct(order))`` hash
    aggregation rather than a row_number window: the agg gets map-side
    partial reduction (each task pre-collapses its duplicates, so the
    shuffle carries one candidate row per key per task, not every row)
    and needs no per-partition sort — on a duplicate-heavy 100 TB load
    that is the difference between shuffling the corpus and shuffling
    the survivors.
    """
    agg_fn = F.max_by if keep == "last" else F.min_by
    row = agg_fn(
        F.struct(*df.columns), F.struct(*[F.col(c) for c in order_by])
    ).alias("__row")
    return df.groupBy(key).agg(row).select("__row.*")


def dedup_exact_by_hash(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Content-hash exact dedup: one row per distinct ``content_col``,
    keeping the smallest ``id_col`` (deterministic winner).

    ``sha2(content, 256)`` runs map-side; the shuffle then moves only
    (hash, id) pairs for the aggregation and a semi-join recovers the
    surviving rows — at 100 TB this avoids shuffling full documents.
    """
    hashed = df.withColumn("__h", F.sha2(F.col(content_col), 256))
    winners = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(winners, ["__h", id_col], "left_semi")
        .drop("__h")
    )

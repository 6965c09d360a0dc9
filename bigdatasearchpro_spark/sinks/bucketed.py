"""Bucketed tables: co-located joins and aggregations (SURVEY.md §4).

``df.write.bucketBy(n, key)`` hash-partitions rows into ``n`` buckets
*at write time* and records the layout in the catalog. A join or
aggregation on the bucket key then reuses that layout: Catalyst plans
no Exchange for the bucketed side — at 100 TB that deletes the single
most expensive stage of a fact-fact join (shuffling both fact tables).

This is the Spark-native answer to the reference's "shards": its ES
indices are 5-way hash-sharded by doc id (reference
``BulkProcessImpl.java:64-68``) so lookups touch one shard; a bucketed
table is the same contract, made visible to the optimizer.

Rules for the layout to be reused (asserted in tests/test_scale.py):
- both join sides bucketed by the join key with the SAME bucket count
  (or a divisor — Spark 3.1+ coalesces), and
- bucket columns = join columns exactly.

``sortBy`` additionally pre-sorts within buckets, turning sort-merge
joins into merge-only (no per-task sort).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 32,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> str:
    """Save ``df`` as a bucketed (optionally bucket-sorted) table; the
    table name is lowercased and identifier-validated (the reference's
    index-name normalization, ``BulkProcessImpl.java:64``). Returns the
    saved name."""
    from bigdatasearchpro_spark.operators.transform import normalize_index_name

    name = normalize_index_name(table)
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(format).mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(name)
    return name


def drop_table(spark: SparkSession, table: str) -> None:
    from bigdatasearchpro_spark.operators.transform import normalize_index_name

    spark.sql(f"DROP TABLE IF EXISTS {normalize_index_name(table)}")

"""File sources (SURVEY.md S7): parquet / CSV / JSON scans.

The driver fixtures are one parquet file per table under
``/root/testdata/sf*/``. ``load_table`` is the single entry point the
query registry uses; schema comes from the files (S2 schema inference —
the Spark reader materializes it the way the reference read
``ResultSetMetaData``, reference ``BulkProcessImpl.java:102``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied by the caller
    are pushed into the parquet scan by Catalyst (check via
    ``df.explain`` -> ``PushedFilters`` / ``ReadSchema``).

    The ``events`` fixture stores ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark cannot read natively — we read it as nanos-since-epoch
    (``nanosAsLong``) and truncate to a microsecond ``timestamp_ntz``,
    the same truncation DuckDB applies, so oracle values match.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Integer division: ns-since-epoch (~1.7e18) exceeds double's 53-bit
        # mantissa, so `/ 1000` + cast would be off by up to ~hundreds of ns.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def fan_out(df: DataFrame, *, multiple: int = 1) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism —
    but ONLY when the input has fewer partitions than that.

    Why: per-row-expensive narrow operators (tokenize/shingle/hash/vector
    math) inherit the scan's partitioning. The local fixtures are single
    parquet files under ``spark.sql.files.maxPartitionBytes``, i.e. ONE
    partition — the whole operator would serialize on one core while 31
    idle. At 100 TB a table has thousands of splits, the gate is false,
    and no shuffle is added; this is the standard "repartition before
    expensive narrow work" pattern, applied adaptively.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def load_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true", **options}
    return spark.read.options(**opts).csv(path)


def load_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)

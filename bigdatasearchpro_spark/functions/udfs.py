"""Pandas-UDF implementations for the §2.11 surface.

Every function here is deliberately also SQL-expressible so the DuckDB
oracle can verify the UDF *plumbing* (Arrow round-trip, grouping
semantics, batch iteration) — the point of the entries is the execution
path, not the arithmetic. Production UDFs (codec decode, model
inference) plug into the same four shapes; see
``bigdatasearchpro_spark.multimodal`` for the mapInPandas codec hook.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.IntegerType())
def pandas_token_count(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: whitespace token count, one Arrow batch at a
    time (identical semantics to ``str.split()`` / SQL regex split)."""
    return text.fillna("").str.split().str.len().astype("int32")


@pandas_udf(T.DoubleType())
def weighted_mean_udaf(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: sum(v*w)/sum(w) per group (UDAF
    shape — called under ``groupBy(...).agg(...)``)."""
    denom = weight.sum()
    return float((value * weight).sum() / denom) if denom else 0.0


def group_zscore(orders: DataFrame) -> DataFrame:
    """Grouped-map ``applyInPandas``: z-score of o_totalprice within each
    o_orderpriority group (population stddev, ddof=0, to match SQL
    ``stddev_pop``).

    Scale note: each group must fit in one executor's memory — fine for
    low-cardinality grouping keys like priority (5 groups); for
    high-cardinality keys use a window-function formulation instead
    (same math, no per-group materialization).
    """
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=0)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "zscore": ((pdf["o_totalprice"] - mu) / sd if sd else 0.0),
            }
        )

    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(z, schema)
        .withColumn("zscore", F.round("zscore", 4))
    )


def batch_quality_filter(docs: DataFrame, min_words: int = 30) -> DataFrame:
    """UDTF-ish ``mapInPandas``: stream Arrow batches, emit a filtered
    projection (0..n rows out per row in). The batch boundary is where a
    model-based quality classifier would run; here the predicate is a
    deterministic word-count threshold so the oracle can check the
    plumbing."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["text"].fillna("").str.split().str.len().astype("int32")
            keep = n >= min_words
            yield pd.DataFrame(
                {
                    "doc_id": pdf.loc[keep, "doc_id"],
                    "n_words": n[keep],
                    "lang": pdf.loc[keep, "lang"],
                }
            )

    from bigdatasearchpro_spark.sources.files import fan_out

    narrow = fan_out(docs.select("doc_id", "text", "lang"))
    return narrow.mapInPandas(gen, schema)

"""Scale-technique gates: salting and bucketing must (a) keep results
bit-identical to the naive plan and (b) produce the plan shape that
makes them worth doing (no Exchange on bucketed sides)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators.skew import salted_join, top_keys
from bigdatasearchpro_spark.plans import executed_plan
from bigdatasearchpro_spark.sinks.bucketed import drop_table, write_bucketed
from bigdatasearchpro_spark.sources.files import load_table


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def skewed(spark, sf_dir):
    """orders with one artificially hot customer: ~25% of rows get
    o_custkey=1 — the celebrity-key shape."""
    o = load_table(spark, sf_dir, "orders")
    return o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(1)).otherwise(F.col("o_custkey")),
    )


def test_salted_join_equals_plain_inner(spark, sf_dir, skewed):
    c = load_table(spark, sf_dir, "customer")
    plain = skewed.join(c, skewed.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )
    salted = salted_join(
        skewed, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", n_salts=8
    ).select("o_orderkey", F.col("o_custkey").alias("c_custkey"), "c_mktsegment")
    assert _norm(plain) == _norm(salted)


def test_salted_join_equals_plain_left(spark, sf_dir, skewed):
    # left join keeps orders with no matching customer exactly once
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    r = c.withColumnRenamed("c_custkey", "o_custkey")
    plain = skewed.join(r, "o_custkey", "left").select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    salted = salted_join(skewed, r, "o_custkey", n_salts=8, how="left").select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    assert _norm(plain) == _norm(salted)


def test_salted_join_hot_keys_only(spark, sf_dir, skewed):
    c = load_table(spark, sf_dir, "customer")
    r = c.withColumnRenamed("c_custkey", "o_custkey")
    hot = top_keys(skewed, "o_custkey", min_count=50)
    assert hot.count() >= 1  # the planted celebrity key is detected
    plain = skewed.join(r, "o_custkey").select("o_orderkey", "o_custkey", "c_mktsegment")
    salted = salted_join(skewed, r, "o_custkey", n_salts=8, hot_keys=hot).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    assert _norm(plain) == _norm(salted)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "bkt_orders", bucket_cols="o_orderkey", n_buckets=8,
                   sort_cols="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem", bucket_cols="o_orderkey", n_buckets=8,
        sort_cols="o_orderkey",
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bo, bl = spark.table("bkt_orders"), spark.table("bkt_lineitem")
            joined = bo.join(bl, "o_orderkey").select("o_orderkey", "l_quantity")
            plan = executed_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # both sides co-located by bucket
            # correctness: same rows as the shuffling plan on raw parquet
            raw = o.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).select("o_orderkey", "l_quantity")
            assert joined.count() == raw.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        drop_table(spark, "bkt_orders")
        drop_table(spark, "bkt_lineitem")


def test_bucketed_agg_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(li, "bkt_li_agg", bucket_cols="l_orderkey", n_buckets=8)
    try:
        agg = (
            spark.table("bkt_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in executed_plan(agg)
    finally:
        drop_table(spark, "bkt_li_agg")


def test_salted_join_hot_keys_left_join(spark, sf_dir, skewed):
    """LEFT join + hot-key split: hot orders with no matching customer
    survive exactly once with nulls; cold path unaffected."""
    # remove the hot customer from the dim so the hot slice has no match
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") != 1)
    r = c.withColumnRenamed("c_custkey", "o_custkey")
    hot = top_keys(skewed, "o_custkey", min_count=50)
    plain = skewed.join(r, "o_custkey", "left").select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    salted = salted_join(skewed, r, "o_custkey", n_salts=8, how="left", hot_keys=hot).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    assert _norm(plain) == _norm(salted)

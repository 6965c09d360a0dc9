"""Mergeable-sketch operators: error bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import sketches
from bigdatasearchpro_spark.sources.files import load_table


def test_kll_quantiles_rank_error_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    probs = [0.25, 0.5, 0.75]
    approx = {
        (r[0], r["q"]): r["value"]
        for r in sketches.kll_quantiles_by_group(
            li, "l_extendedprice", "l_returnflag", probs
        ).collect()
    }
    exact = {
        (r[0], p): r[f"e{i}"]
        for r in li.groupBy("l_returnflag")
        .agg(*[
            F.percentile("l_extendedprice", F.lit(p)).alias(f"e{i}")
            for i, p in enumerate(probs)
        ])
        .collect()
        for i, p in enumerate(probs)
    }
    # rank error ~0.6% at k=800: the approx quantile's RANK must be
    # within ~2% of the target rank (checked via value-rank lookup)
    for (g, p), v in approx.items():
        grp = li.filter(F.col("l_returnflag") == g)
        n = grp.count()
        rank = grp.filter(F.col("l_extendedprice") <= v).count() / n
        assert abs(rank - p) < 0.02, (g, p, rank)
        assert v > 0 and exact[(g, p)] > 0


def test_hll_segment_distinct_accuracy_and_merge(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    per_seg, merged = sketches.hll_segment_distinct(li, "l_partkey", "l_returnflag")
    exact_global = li.select("l_partkey").distinct().count()
    assert abs(merged - exact_global) / exact_global < 0.05
    exact_seg = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for r in per_seg.collect():
        assert abs(r["n_distinct_est"] - exact_seg[r["l_returnflag"]]) / exact_seg[
            r["l_returnflag"]
        ] < 0.05


def test_hll_overlap_inclusion_exclusion(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = sketches.hll_overlap_estimate(
        e, "user_id",
        F.col("event_type") == "purchase",
        F.col("event_type") == "view",
    )
    pa = {r[0] for r in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    pv = {r[0] for r in e.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    exact = {"a": len(pa), "b": len(pv), "union": len(pa | pv), "overlap": len(pa & pv)}
    for key in ("a", "b", "union"):
        assert abs(got[key] - exact[key]) / max(exact[key], 1) < 0.05, key
    # overlap inherits three estimates' error; generous bound
    assert abs(got["overlap"] - exact["overlap"]) / max(exact["overlap"], 1) < 0.15

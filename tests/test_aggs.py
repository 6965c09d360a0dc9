"""ES aggregations surface (`operators/aggs.py`), search_after keyset
pagination, and the correlated-subquery shapes: semantic invariants
beyond the DuckDB oracles, plus the plan gates that make them scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import aggs, search
from bigdatasearchpro_spark.plans import has_take_ordered, shuffle_count
from bigdatasearchpro_spark.sources.files import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# terms
# ---------------------------------------------------------------------------


def test_terms_agg_order_and_truncation(docs):
    out = aggs.terms_agg(docs, "lang", size=3).collect()
    assert len(out) == 3
    counts = [r["doc_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    # top bucket is the majority language of the fixture
    assert out[0]["key"] == "en"


def test_terms_agg_metrics_match_direct_groupby(docs):
    via_agg = {
        r["key"]: (r["doc_count"], r["avg_chars"])
        for r in aggs.terms_agg(
            docs, "lang", size=100,
            metrics={"avg_chars": F.round(F.avg("n_chars"), 4)},
        ).collect()
    }
    direct = {
        r["lang"]: (r["n"], r["a"])
        for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n"), F.round(F.avg("n_chars"), 4).alias("a"))
        .collect()
    }
    assert via_agg == direct


def test_terms_agg_is_takeordered(docs):
    # bucket truncation must never global-sort
    assert has_take_ordered(aggs.terms_agg(docs, "lang", size=3))


# ---------------------------------------------------------------------------
# histogram / date_histogram dense fill
# ---------------------------------------------------------------------------


def test_histogram_dense_grid_contiguous(docs):
    out = aggs.histogram_agg(docs, "n_chars", 50).collect()
    keys = sorted(r["key"] for r in out)
    # ES min_doc_count=0: every interval between first and last bucket
    assert keys == list(range(keys[0], keys[-1] + 1, 50))
    # doc_counts over all buckets == matched rows
    assert sum(r["doc_count"] for r in out) == docs.count()


def test_histogram_min_doc_count_1_drops_empties(docs):
    dense = aggs.histogram_agg(docs, "n_chars", 50, min_doc_count=0).collect()
    sparse = aggs.histogram_agg(docs, "n_chars", 50, min_doc_count=1).collect()
    assert {r["key"] for r in sparse} == {
        r["key"] for r in dense if r["doc_count"] > 0
    }


def test_date_histogram_empty_buckets_zero_with_null_metrics(events):
    few = events.filter(F.dayofmonth("ts") % 7 == 0)  # guarantees gaps
    out = aggs.date_histogram_agg(
        few, "ts", "day", metrics={"sv": F.round(F.sum("value"), 2)}
    ).collect()
    empties = [r for r in out if r["doc_count"] == 0]
    assert empties, "expected empty day buckets"
    assert all(r["sv"] is None for r in empties)
    assert sum(r["doc_count"] for r in out) == few.count()


def test_date_histogram_keys_are_truncated(events):
    out = aggs.date_histogram_agg(events, "ts", "day", min_doc_count=1).collect()
    assert all(
        r["key"].hour == 0 and r["key"].minute == 0 and r["key"].second == 0
        for r in out
    )


# ---------------------------------------------------------------------------
# range / filters — overlap semantics and one-pass plan
# ---------------------------------------------------------------------------


def test_range_agg_overlapping_and_empty_buckets(docs):
    n = docs.count()
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.range_agg(
            docs, "n_chars",
            [("all", None, None), ("low", None, 300), ("also_low", 0, 300),
             ("none", 100000, None)],
        ).collect()
    }
    assert out["all"] == n
    assert out["low"] == out["also_low"]  # overlapping buckets both count
    assert out["none"] == 0  # empty bucket still present (ES contract)


def test_filters_agg_single_pass_plan(docs):
    out = aggs.filters_agg(
        docs,
        {"en": F.col("lang") == "en", "big": F.col("n_chars") > 300},
    )
    # one scan, conditional counts aggregate to ONE row: the only
    # exchange is the single-row final aggregation — N buckets must not
    # become N scans or a bucket-key shuffle
    assert shuffle_count(out) <= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("scan parquet") == 1


# ---------------------------------------------------------------------------
# stats / percentiles
# ---------------------------------------------------------------------------


def test_extended_stats_identities(docs):
    r = aggs.extended_stats_agg(docs, "n_chars", round_to=6).collect()[0]
    assert r["count_v"] == docs.count()
    assert r["min_v"] <= r["avg_v"] <= r["max_v"]
    assert abs(r["std_dev_v"] ** 2 - r["variance_v"]) < 1e-2
    assert abs(r["avg_v"] * r["count_v"] - r["sum_v"]) < 1.0


def test_percentiles_monotone_and_bounded(docs):
    rows = aggs.percentiles_agg(docs, "n_chars").collect()
    by_p = {r["percent"]: r["value"] for r in rows}
    vals = [by_p[p] for p in (25.0, 50.0, 75.0, 95.0, 99.0)]
    assert vals == sorted(vals)
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).first()
    assert lo <= vals[0] and vals[-1] <= hi


# ---------------------------------------------------------------------------
# top_hits
# ---------------------------------------------------------------------------


def test_terms_top_hits_matches_bruteforce(docs):
    got = {
        (r["key"], r["hit_rank"], r["doc_id"])
        for r in aggs.terms_top_hits(
            docs, "lang", hits=2, sort=[F.desc("n_chars")]
        ).collect()
    }
    import itertools

    rows = sorted(
        docs.select("lang", "doc_id", "n_chars").collect(),
        key=lambda r: (r["lang"], -r["n_chars"], r["doc_id"]),
    )
    want = set()
    for lang, grp in itertools.groupby(rows, key=lambda r: r["lang"]):
        for i, r in enumerate(list(grp)[:2], start=1):
            want.add((lang, i, r["doc_id"]))
    assert got == want


# ---------------------------------------------------------------------------
# search_after
# ---------------------------------------------------------------------------


def test_search_after_pages_tile_the_ranking(docs):
    q = "spark join window"
    full = search.search_topk(docs, q, 30).collect()
    p1 = search.search_topk(docs, q, 10).collect()
    c1 = p1[-1]
    p2 = search.search_topk(docs, q, 10, after=(c1["score"], c1["doc_id"])).collect()
    c2 = p2[-1]
    p3 = search.search_topk(docs, q, 10, after=(c2["score"], c2["doc_id"])).collect()
    tiled = [(r["doc_id"], r["score"]) for r in (*p1, *p2, *p3)]
    assert tiled == [(r["doc_id"], r["score"]) for r in full]


def test_search_after_excludes_cursor_even_on_score_tie(docs):
    q = "spark join window"
    p1 = search.search_topk(docs, q, 10).collect()
    cursor = p1[-1]
    p2 = search.search_topk(
        docs, q, 10, after=(cursor["score"], cursor["doc_id"])
    ).collect()
    seen1 = {r["doc_id"] for r in p1}
    assert all(r["doc_id"] not in seen1 for r in p2)
    # keyset total order: nothing in p2 ranks before the cursor
    assert all(
        (r["score"], -_num(r["doc_id"])) <= (cursor["score"], -_num(cursor["doc_id"]))
        for r in p2
    )


def _num(x):
    return x if isinstance(x, (int, float)) else hash(x)


# ---------------------------------------------------------------------------
# correlated subqueries — Catalyst decorrelation plan shapes
# ---------------------------------------------------------------------------


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    from bigdatasearchpro_spark.registry import QUERIES

    df = QUERIES["q4_exists_order_priority"](spark, sf_dir)
    # the entry materializes (collect->createDataFrame) for view cleanup;
    # recreate the plan directly to inspect it
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o.createOrReplaceTempView("pt_orders")
    li.createOrReplaceTempView("pt_lineitem")
    plan = (
        spark.sql(
            """
        SELECT o_orderpriority, count(*) AS order_count FROM pt_orders o
        WHERE EXISTS (SELECT 1 FROM pt_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    assert df.count() == 5  # all five priorities appear


def test_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("pt_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("pt_ord")
    plan = (
        spark.sql(
            """
        SELECT count(*) FROM pt_cust c
        WHERE NOT EXISTS (SELECT 1 FROM pt_ord o WHERE o.o_custkey = c.c_custkey)
        """
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan


# ---------------------------------------------------------------------------
# adjacency_matrix / rare_terms / sampler / weighted_avg
# ---------------------------------------------------------------------------
def test_adjacency_matrix_counts_and_empty_buckets(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 5), ("c", 9)], "tag string, v int"
    )
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.adjacency_matrix_agg(
            df,
            {
                "is_a": F.col("tag") == "a",
                "big": F.col("v") >= 5,
                "is_c": F.col("tag") == "c",
            },
        ).collect()
    }
    assert out == {
        "is_a": 2, "big": 3, "is_c": 1,
        "is_a&big": 1, "big&is_c": 1,
        # "is_a&is_c" is empty and omitted, like ES
    }
    keys = [
        r["key"]
        for r in aggs.adjacency_matrix_agg(
            df, {"is_a": F.col("tag") == "a", "big": F.col("v") >= 5}
        ).collect()
    ]
    assert keys == sorted(keys)
    with pytest.raises(ValueError):
        aggs.adjacency_matrix_agg(df, {})


def test_adjacency_matrix_single_pass_plan(spark):
    df = spark.createDataFrame([("a", 1)], "tag string, v int")
    out = aggs.adjacency_matrix_agg(
        df, {"x": F.col("v") > 0, "y": F.col("tag") == "a"}
    )
    # one aggregate over one scan — no join between bucket arms
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()


def test_rare_terms_tail_only_and_order(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["x"] * 5 + ["y"] * 2 + ["z"] * 2 + ["w"]],
        "term string",
    )
    rows = aggs.rare_terms_agg(df, "term", max_doc_count=2).collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [
        ("w", 1), ("y", 2), ("z", 2)
    ]
    with pytest.raises(ValueError):
        aggs.rare_terms_agg(df, "term", max_doc_count=0)


def test_sampler_sample_deterministic_cutoff(spark):
    df = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(20)], "doc_id long, score double"
    )
    top = aggs.sampler_sample(df, shard_size=5, sort=[F.desc("score")])
    got = [(r["doc_id"], r["score"]) for r in top.collect()]
    # ties on score are broken by id asc — stable across runs
    assert got == [(2, 2.0), (5, 2.0), (8, 2.0), (11, 2.0), (14, 2.0)]
    assert has_take_ordered(top)
    with pytest.raises(ValueError):
        aggs.sampler_sample(df, shard_size=0)


def test_weighted_avg_integer_path_exact(spark):
    # values on a cent grid: wavg = (0.10*2 + 0.40*6) / 8 = 0.325
    df = spark.createDataFrame(
        [("a", 0.10, 2.0), ("a", 0.40, 6.0), ("b", 0.20, 1.0)],
        "g string, v double, w double",
    )
    rows = {
        r["g"]: r
        for r in aggs.weighted_avg_agg(
            df, value="v", weight="w", group_cols=["g"],
            value_scale=100, weight_scale=100,
        ).collect()
    }
    assert rows["a"]["w_avg_scaled"] == 325_000  # 0.325 in 1e-6 units
    assert rows["a"]["sum_weight_scaled"] == 800
    assert rows["a"]["doc_count"] == 2
    assert rows["b"]["w_avg_scaled"] == 200_000


def test_weighted_avg_float_path(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (3.0, 3.0)], "v double, w double"
    )
    r = aggs.weighted_avg_agg(df, value="v", weight="w").collect()[0]
    assert abs(r["w_avg"] - 2.5) < 1e-12
    assert r["sum_weight"] == 4.0 and r["doc_count"] == 2


# ---------------------------------------------------------------------------
# pipeline aggregations (derivative / cumsum / moving avg / script / selector)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def buckets(spark):
    rows = [(i, c) for i, c in enumerate([4, 7, 1, 0, 9, 5])]
    return spark.createDataFrame(rows, "key int, doc_count long")


def test_derivative_first_bucket_null(buckets):
    out = aggs.derivative_agg(buckets, "doc_count").orderBy("key").collect()
    assert [r["doc_count_deriv"] for r in out] == [None, 3, -6, -1, 9, -4]


def test_cumulative_sum_running_total(buckets):
    out = aggs.cumulative_sum_agg(buckets, "doc_count").orderBy("key").collect()
    assert [r["doc_count_cumsum"] for r in out] == [4, 11, 12, 12, 21, 26]


def test_moving_avg_trailing_excludes_current(buckets):
    out = aggs.moving_avg_agg(
        buckets, "doc_count", window=3
    ).orderBy("key").collect()
    got = [r["doc_count_mavg"] for r in out]
    # frame = up to 3 buckets strictly before the current one
    assert got[0] is None
    assert got[1] == 4.0
    assert got[2] == (4 + 7) / 2
    assert got[3] == (4 + 7 + 1) / 3
    assert got[4] == (7 + 1 + 0) / 3
    inc = aggs.moving_avg_agg(
        buckets, "doc_count", window=2, include_current=True
    ).orderBy("key").collect()
    assert inc[0]["doc_count_mavg"] == 4.0  # one-row frame, itself
    assert inc[1]["doc_count_mavg"] == (4 + 7) / 2
    with pytest.raises(ValueError):
        aggs.moving_avg_agg(buckets, "doc_count", window=0)


def test_serial_diff_lag(buckets):
    out = aggs.serial_diff_agg(
        buckets, "doc_count", lag=2
    ).orderBy("key").collect()
    assert [r["doc_count_sdiff_2"] for r in out] == [
        None, None, -3, -7, 8, 5
    ]
    with pytest.raises(ValueError):
        aggs.serial_diff_agg(buckets, "doc_count", lag=0)


def test_bucket_script_and_selector_compose(buckets):
    scripted = aggs.bucket_script_agg(
        buckets, "double_count", F.col("doc_count") * 2
    )
    kept = aggs.bucket_selector_agg(
        scripted, F.col("double_count") >= 10
    ).orderBy("key").collect()
    assert [(r["key"], r["double_count"]) for r in kept] == [
        (1, 14), (4, 18), (5, 10)
    ]


def test_auto_date_histogram_ladder_and_echo(spark):
    assert aggs.choose_auto_interval(30 * 60, 100) == "minute"
    assert aggs.choose_auto_interval(30 * 86400, 1000) == "hour"
    assert aggs.choose_auto_interval(30 * 86400, 100) == "day"
    assert aggs.choose_auto_interval(30 * 86400, 10) == "week"
    assert aggs.choose_auto_interval(7 * 365 * 86400, 100) == "month"
    assert aggs.choose_auto_interval(36500 * 86400, 20) == "year"
    with pytest.raises(ValueError):
        aggs.choose_auto_interval(100, 0)
    df = spark.createDataFrame(
        [("2024-01-01 00:00:30",), ("2024-01-01 00:05:10",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    out = aggs.auto_date_histogram_agg(df, "ts", target_buckets=100).collect()
    # 5-minute span -> minute buckets, densified to 6 rows
    assert all(r["interval"] == "minute" for r in out)
    assert len(out) == 6
    assert sum(r["doc_count"] for r in out) == 2


def test_sibling_bucket_stats_one_row(buckets):
    r = aggs.sibling_bucket_stats(buckets, "doc_count").collect()[0]
    assert r["n_buckets"] == 6
    assert r["min_bucket"] == 0 and r["max_bucket"] == 9
    assert r["sum_bucket"] == 26
    assert r["avg_bucket"] == 26 / 6


def test_percentile_ranks_exact_grid(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "x double")
    out = aggs.percentile_ranks_agg(df, "x", [2.5, 5.0, 100.0]).collect()
    got = {r["value"]: (r["n_le"], r["rank_scaled"]) for r in out}
    assert got[2.5] == (2, 200_000)
    assert got[5.0] == (5, 500_000)
    assert got[100.0] == (10, 1_000_000)
    assert [r["value"] for r in out] == [2.5, 5.0, 100.0]
    with pytest.raises(ValueError):
        aggs.percentile_ranks_agg(df, "x", [])


def test_percentile_ranks_single_pass_plan(docs):
    out = aggs.percentile_ranks_agg(docs, "n_chars", [100.0, 300.0, 500.0])
    assert shuffle_count(out) <= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("scan parquet") == 1


def test_matrix_stats_matches_numpy(spark):
    import numpy as np

    xs = [1.00, 2.50, 3.25, 4.75, 0.25]
    ys = [2.00, 1.50, 5.00, 3.25, 4.50]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = {
        (r["field_x"], r["field_y"]): r
        for r in aggs.matrix_stats_agg(df, {"x": 100, "y": 100}).collect()
    }
    assert set(out) == {("x", "x"), ("x", "y"), ("y", "y")}
    r = out[("x", "y")]
    assert r["doc_count"] == 5
    assert r["sum_x"] == sum(round(v * 100) for v in xs)
    # population covariance / Pearson correlation vs numpy
    assert abs(r["covariance"] - np.cov(xs, ys, bias=True)[0][1]) < 1e-9
    assert abs(r["correlation"] - np.corrcoef(xs, ys)[0][1]) < 1e-9
    var_x = out[("x", "x")]["covariance"]
    assert abs(var_x - np.var(xs)) < 1e-9
    # one scan: the matrix must not re-aggregate per pair
    plan = (
        aggs.matrix_stats_agg(df, {"x": 100, "y": 100})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") <= 4  # partial+final, one agg
    with pytest.raises(ValueError):
        aggs.matrix_stats_agg(df, {})


def test_boxplot_identities(docs):
    r = aggs.boxplot_agg(docs, "n_chars").collect()[0]
    assert r["min_v"] <= r["q1"] <= r["q2"] <= r["q3"] <= r["max_v"]
    assert abs(r["iqr"] - round(r["q3"] - r["q1"], 4)) < 1e-9


def test_diversified_sampler_caps_per_key(spark):
    rows = [(i, "a" if i < 8 else "b", float(100 - i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, k string, score double")
    out = aggs.diversified_sampler_sample(
        df, shard_size=5, field="k", max_docs_per_value=2,
        sort=[F.desc("score")],
    ).collect()
    assert len(out) == 4  # 2 per key x 2 keys < shard_size cap
    per_key = {}
    for r in out:
        per_key[r["k"]] = per_key.get(r["k"], 0) + 1
    assert all(v <= 2 for v in per_key.values())
    # best-scoring docs per key survive
    assert {r["doc_id"] for r in out} == {0, 1, 8, 9}
    with pytest.raises(ValueError):
        aggs.diversified_sampler_sample(df, shard_size=0, field="k")
    with pytest.raises(ValueError):
        aggs.diversified_sampler_sample(
            df, shard_size=5, field="k", max_docs_per_value=0
        )


def test_terms_agg_metric_order(docs):
    out = aggs.terms_agg(
        docs, "lang", size=100,
        metrics={"ac": F.round(F.avg("n_chars"), 4)},
        order_by="ac", ascending=True,
    ).collect()
    vals = [r["ac"] for r in out]
    assert vals == sorted(vals)
    with pytest.raises(ValueError):
        aggs.terms_agg(docs, "lang", order_by="missing")


def test_filters_agg_other_bucket(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 9)], "tag string, v int"
    )
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.filters_agg(
            df,
            {"is_a": F.col("tag") == "a", "big": F.col("v") >= 5},
            other_bucket=True,
        ).collect()
    }
    # row b has a NULL predicate (v is null) -> non-matching -> _other_
    assert out == {"is_a": 1, "big": 1, "_other_": 1}
    with pytest.raises(ValueError):
        aggs.filters_agg(
            df, {"_other_": F.col("v") > 0}, other_bucket=True
        )


def test_multi_terms_ranks_composite_pairs(spark):
    from bigdatasearchpro_spark.operators.aggs import multi_terms_agg

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 2), ("a", "y", 3), ("b", "x", 4)],
        "f1 string, f2 string, v long",
    )
    out = multi_terms_agg(
        df, ["f1", "f2"], size=2, metrics={"sum_v": F.sum("v")}
    ).collect()
    assert [(r["key_f1"], r["key_f2"], r["doc_count"], r["sum_v"])
            for r in out] == [("a", "x", 2, 3), ("a", "y", 1, 3)]
    import pytest as pt

    with pt.raises(ValueError):
        multi_terms_agg(df, ["f1"])


def test_top_metrics_argmax_with_tiebreak(spark):
    from bigdatasearchpro_spark.operators.aggs import top_metrics_agg

    df = spark.createDataFrame(
        [("a", 5, 10.0, 1), ("a", 5, 20.0, 2), ("a", 3, 30.0, 3),
         ("b", 9, 40.0, 4)],
        "g string, s long, m double, id long",
    )
    out = {r["key"]: r for r in top_metrics_agg(
        df, "g", "s", ["m"], tie_col="id").collect()}
    # ties on s=5 resolve by id: id=2 wins
    assert out["a"]["s"] == 5 and out["a"]["m"] == 20.0
    assert out["b"]["m"] == 40.0
    low = {r["key"]: r for r in top_metrics_agg(
        df, "g", "s", ["m"], descending=False, tie_col="id").collect()}
    assert low["a"]["s"] == 3 and low["a"]["m"] == 30.0


def test_string_stats_entropy_matches_python(spark):
    import math

    from bigdatasearchpro_spark.operators.aggs import string_stats_agg

    rows = [("abca",), ("bb",), (None,)]
    df = spark.createDataFrame(rows, "t string")
    base = string_stats_agg(df, "t").collect()[0]
    assert (base["count"], base["min_length"], base["max_length"]) == (2, 2, 4)
    assert base["avg_length"] == 6.0 / 2.0

    ent_row = string_stats_agg(df, "t", with_entropy=True).collect()[0]
    text = "abcabb"
    n = len(text)
    freq = {c: text.count(c) for c in set(text)}
    expect = -sum((v / n) * math.log2(v / n) for v in freq.values())
    assert abs(ent_row["entropy"] - expect) < 1e-4


def test_mad_t_test_normalize_hand_fixtures(spark):
    import math

    from bigdatasearchpro_spark.operators.aggs import (
        median_absolute_deviation_agg,
        missing_agg,
        normalize_agg,
        t_test_agg,
    )

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (10.0,)], "v double"
    )
    # median = 2.5; deviations {1.5, .5, .5, 7.5} -> median 1.0
    assert median_absolute_deviation_agg(df, "v").collect()[0]["mad"] == 1.0

    g = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0),
         ("b", 9.0)],
        "g string, v double",
    )
    r = t_test_agg(g, "v", "g", "a", "b").collect()[0]
    m1, m2 = 2.0, 7.0
    v1 = sum((x - m1) ** 2 for x in (1, 2, 3)) / 2
    v2 = sum((x - m2) ** 2 for x in (5, 7, 9)) / 2
    expect = (m1 - m2) / math.sqrt(v1 / 3 + v2 / 3)
    assert (r["n1"], r["n2"]) == (3, 3)
    assert abs(r["t_value"] - expect) < 1e-9

    b = spark.createDataFrame(
        [("x", 10), ("y", 20), ("z", 30)], "k string, doc_count long"
    )
    norm = {r["k"]: r["normalized"]
            for r in normalize_agg(b, "doc_count").collect()}
    assert norm == {"x": 0.0, "y": 0.5, "z": 1.0}
    pct = {r["k"]: r["normalized"]
           for r in normalize_agg(b, "doc_count",
                                  method="percent_of_sum").collect()}
    assert abs(pct["z"] - 0.5) < 1e-9
    const = spark.createDataFrame([("x", 5), ("y", 5)], "k string, doc_count long")
    assert {r["normalized"] for r in
            normalize_agg(const, "doc_count").collect()} == {0.0}

    m = spark.createDataFrame([(None,), ("a",), ("b",)], "f string")
    row = missing_agg(m, "f").collect()[0]
    assert (row["missing_count"], row["value_count"]) == (1, 2)
    import pytest as pt

    with pt.raises(ValueError):
        normalize_agg(b, "doc_count", method="zscore")


def test_date_range_agg_date_math_bounds(spark):
    import datetime as dt

    from bigdatasearchpro_spark.operators.aggs import date_range_agg

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, d, 12, 0, 0),) for d in (5, 14, 19, 25)],
        "ts timestamp",
    )
    now = dt.datetime(2024, 1, 20, 15, 30, 0)
    out = {
        r.key: r.doc_count
        for r in date_range_agg(
            df, "ts",
            [("old", None, "now-1w/d"),
             ("week", "now-1w/d", "now/d"),
             ("empty", "2024-02-01", "2024-02-02"),
             ("recent", "now/d", None)],
            now=now,
        ).collect()
    }
    # now-1w/d = 2024-01-13 00:00, now/d = 2024-01-20 00:00
    assert out == {"old": 1, "week": 2, "empty": 0, "recent": 1}
    import pytest as pt

    with pt.raises(ValueError, match="now"):
        date_range_agg(df, "ts", [("x", "now-1d", None)]).collect()


def test_significant_text_duplicate_filter(spark):
    from bigdatasearchpro_spark.operators.aggs import significant_text_agg

    # 6 copies of the same boilerplate doc + 3 distinct docs sharing
    # 'signal'; background has 'noise' everywhere.
    boiler = "copy paste boilerplate signal"
    fg_rows = [(i, boiler) for i in range(6)] + [
        (10, "signal alpha noise"), (11, "signal beta noise"),
        (12, "signal gamma noise"),
    ]
    bg_rows = fg_rows + [(100 + i, "noise filler words") for i in range(20)]
    fg = spark.createDataFrame(fg_rows, "doc_id long, text string")
    bg = spark.createDataFrame(bg_rows, "doc_id long, text string")

    with_filter = {
        r.key: r.doc_count
        for r in significant_text_agg(fg, bg, min_doc_count=1).collect()
    }
    # the 6 boilerplate copies collapse to one: signal appears in 4
    # deduped fg docs, and boilerplate-only terms in just 1
    assert with_filter["signal"] == 4
    assert with_filter.get("boilerplate", 1) == 1

    without = {
        r.key: r.doc_count
        for r in significant_text_agg(
            fg, bg, min_doc_count=1, filter_duplicate_text=False
        ).collect()
    }
    assert without["signal"] == 9


def test_frequent_item_sets_apriori(spark):
    from bigdatasearchpro_spark.operators.aggs import frequent_item_sets_agg

    rows = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "bread"), (3, "beer"),
        (4, "beer"),
        (5, "milk"), (5, "milk"),  # duplicate item in a basket: once
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = [(r.item_a, r.item_b, r.support) for r in
           frequent_item_sets_agg(df, "basket", "item",
                                  min_support=2).collect()]
    # (bread, milk) in 3 baskets; beer appears twice as an ITEM but
    # (beer, milk)/(beer, bread) pairs only once -> pruned
    assert out == [("bread", "milk", 3)]
    import pytest as pt

    with pt.raises(ValueError):
        frequent_item_sets_agg(df, "basket", "item", min_support=0)


def test_children_agg_matches_manual_join(spark, sf_dir):
    from bigdatasearchpro_spark.operators.parentchild import children_agg
    from bigdatasearchpro_spark.sources.files import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.o_orderpriority: (r.n, r.s)
        for r in children_agg(
            orders, li, "o_orderkey", "o_orderpriority",
            [F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")],
            child_on="l_orderkey",
        ).collect()
    }
    manual = {
        r.o_orderpriority: (r.n, r.s)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    assert got == manual


def test_graph_explore_walk(spark):
    from bigdatasearchpro_spark.operators.aggs import graph_explore

    # seed 'alpha' connects strongly to 'beta'; 'beta' to 'gamma';
    # 'noise' is background everywhere so never significant
    rows = (
        [(i, "alpha beta noise") for i in range(6)]
        + [(10 + i, "beta gamma noise") for i in range(6)]
        + [(20 + i, "noise filler words here") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = [(r.hop, r.source, r.term) for r in
             graph_explore(df, "alpha", hops=2, top_per_hop=2,
                           min_doc_count=2).collect()]
    assert (1, "alpha", "beta") in edges
    # hop 2 reaches gamma THROUGH beta, and never re-reports a prior
    # vertex (alpha/beta excluded from hop-2 expansions)
    assert (2, "beta", "gamma") in edges
    assert not any(t in ("alpha",) for _, _, t in edges)
    hops = {h for h, _, _ in edges}
    assert hops <= {1, 2}


def test_rate_agg_calendar_span(spark):
    import datetime as dt

    from bigdatasearchpro_spark.operators.aggs import rate_agg

    # 48 events in one day + 31 in one MONTH bucket: divisors differ
    rows = [(dt.datetime(2024, 1, 1, h % 24, 0, 0),) for h in range(48)]
    df = spark.createDataFrame(rows, "ts timestamp")
    day = rate_agg(df, "ts", bucket_interval="day",
                   unit_seconds=3600).first()
    assert day.doc_count == 48 and day.rate == 2.0  # 48 / 24h

    feb = [(dt.datetime(2024, 2, d % 28 + 1, 0, 0, 0),) for d in range(29)]
    m = rate_agg(spark.createDataFrame(feb, "ts timestamp"), "ts",
                 bucket_interval="month", unit_seconds=86400).first()
    # leap February 2024: 29 days in the bucket
    assert m.doc_count == 29 and m.rate == 1.0
    import pytest as pt

    with pt.raises(ValueError):
        rate_agg(df, "ts", bucket_interval="fortnight")


def test_random_sampler_deterministic_estimates(spark, docs):
    from bigdatasearchpro_spark.operators.aggs import random_sampler_agg

    r1 = random_sampler_agg(
        docs, 25, {"est": F.count(F.lit(1)).cast("double")}).first()
    r2 = random_sampler_agg(
        docs, 25, {"est": F.count(F.lit(1)).cast("double")}).first()
    assert (r1.sample_docs, r1.est) == (r2.sample_docs, r2.est)
    n = docs.count()
    # the scaled estimate is in the right ballpark of the true count
    assert 0.5 * n <= r1.est <= 1.5 * n
    full = random_sampler_agg(
        docs, 100, {"est": F.count(F.lit(1)).cast("double")}).first()
    assert full.sample_docs == n and full.est == float(n)
    import pytest as pt

    with pt.raises(ValueError):
        random_sampler_agg(docs, 0, {"est": F.count(F.lit(1))})


def test_change_point_agg_step_fixture(spark):
    """Hand-computable step series 2,2,2,10,10: the change point is the
    4th bucket, left mean 2.0, right mean 10.0, delta 8.0."""
    from bigdatasearchpro_spark.operators import aggs

    rows = [(k, v) for k, v in zip(range(1, 6), (2, 2, 2, 10, 10))]
    buckets = spark.createDataFrame(rows, "key long, doc_count long")
    [r] = aggs.change_point_agg(buckets, "doc_count").collect()
    assert r["key"] == 4
    assert r["left_mean"] == 2.0
    assert r["right_mean"] == 10.0
    assert r["mean_delta"] == 8.0
    assert r["change_type"] == "step_change"


def test_change_point_agg_tie_breaks_on_key(spark):
    """A symmetric series admits two equal-delta splits: the earlier
    bucket key must win deterministically."""
    from bigdatasearchpro_spark.operators import aggs

    rows = [(1, 0), (2, 4), (3, 0)]
    buckets = spark.createDataFrame(rows, "key long, doc_count long")
    [r] = aggs.change_point_agg(buckets, "doc_count").collect()
    assert r["key"] == 2  # split after bucket 1 ties split after 2; earlier wins


def test_downsample_tsdb_hand_fixture(spark):
    """Two series, one bucket each: doc_count/min/max/sum roll up and
    v_last is the latest (ts, id) sample's value."""
    import datetime as dt

    from bigdatasearchpro_spark.operators import aggs

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), 7, "click", 1.5),
        (2, dt.datetime(2024, 1, 1, 10, 20), 7, "click", 2.5),
        (3, dt.datetime(2024, 1, 1, 10, 20), 7, "click", 9.0),  # id tie-break
        (4, dt.datetime(2024, 1, 1, 10, 59), 3, "view", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, host long, event_type string, value double"
    )
    out = {
        (r["event_type"], r["host"]): r
        for r in aggs.downsample_tsdb(ev, ["event_type", "host"]).collect()
    }
    c = out[("click", 7)]
    assert (c["doc_count"], c["v_min"], c["v_max"], c["v_sum"]) == (3, 1.5, 9.0, 13.0)
    assert c["v_last"] == 9.0  # ts tie at 10:20 -> higher event_id wins
    v = out[("view", 3)]
    assert (v["doc_count"], v["v_last"]) == (1, 4.0)

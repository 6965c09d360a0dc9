"""ES ``nested`` surface: within-one-object query semantics vs the
cross-object flat match, the nested/reverse_nested aggregation counts,
and the bucket_sort / percentiles_bucket / pinned additions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import aggs, nested, search
from bigdatasearchpro_spark.sources.files import load_table


@pytest.fixture(scope="module")
def ndocs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return nested.build_nested_docs(
        orders.select("o_orderkey"),
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
        "o_orderkey",
        "l_orderkey",
        ["l_linenumber", "l_returnflag", "l_quantity"],
        path="lines",
        order_by=["l_linenumber"],
    )


def test_build_nested_docs_shape_and_determinism(ndocs, spark, sf_dir):
    # one row per parent; childless parents get an EMPTY array, not NULL
    orders = load_table(spark, sf_dir, "orders")
    assert ndocs.count() == orders.count()
    assert ndocs.filter(F.col("lines").isNull()).count() == 0
    # total nested objects == child table rows
    li = load_table(spark, sf_dir, "lineitem")
    total = ndocs.agg(F.sum(F.size("lines"))).first()[0]
    assert total == li.count()
    # array is sorted by l_linenumber => deterministic under shuffle
    row = (
        ndocs.filter(F.size("lines") >= 3)
        .select("lines")
        .orderBy("o_orderkey")
        .first()
    )
    nums = [o["l_linenumber"] for o in row["lines"]]
    assert nums == sorted(nums)
    # struct layout is the declared child_cols order
    fields = [f.name for f in ndocs.schema["lines"].dataType.elementType]
    assert fields == ["l_linenumber", "l_returnflag", "l_quantity"]


def test_nested_query_within_one_object_only(ndocs, spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = nested.nested_query(
        ndocs,
        "lines",
        lambda o: (o.getField("l_returnflag") == "R")
        & (o.getField("l_quantity") >= 49),
    )
    got = {r["o_orderkey"]: r["n_nested_hits"] for r in out.collect()}
    exp = {
        r["l_orderkey"]: r["n"]
        for r in li.filter(
            (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 49)
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_nested_query_is_shuffle_free_over_built_docs(ndocs):
    # the query itself adds NO exchange over the materialized docs:
    # cache the doc side, then assert the filter plan has no shuffle.
    ndocs.cache()
    try:
        out = nested.nested_query(
            ndocs, "lines", lambda o: o.getField("l_quantity") >= 49
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the cached relation's BUILD plan (inside InMemoryRelation)
        # contains the one construction shuffle; the query itself —
        # everything above the cache scan — must add none.
        above = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in above
        assert "Exchange" not in above
    finally:
        ndocs.unpersist()


def test_cross_object_strictly_weaker_than_nested(ndocs):
    mode = lambda o: o.getField("l_returnflag") == "R"  # noqa: E731
    qty = lambda o: o.getField("l_quantity") >= 45  # noqa: E731
    both = lambda o: mode(o) & qty(o)  # noqa: E731
    flagged = ndocs.select(
        "o_orderkey",
        nested.cross_object_match(ndocs, "lines", [mode, qty]).alias("x"),
        (F.size(F.filter("lines", both)) > 0).alias("n"),
    )
    # nested => cross (the converse fails on the false-positive set)
    assert flagged.filter(F.col("n") & ~F.col("x")).count() == 0
    assert flagged.filter(F.col("x") & ~F.col("n")).count() > 0


def test_nested_terms_agg_counts(ndocs, spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = nested.nested_terms_agg(
        ndocs, "lines", "l_returnflag", parent_id="o_orderkey"
    )
    got = {
        r["l_returnflag"]: (r["doc_count"], r["parent_count"])
        for r in out.collect()
    }
    exp = {
        r["l_returnflag"]: (r["n"], r["p"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_orderkey").alias("p"),
        )
        .collect()
    }
    assert got == exp
    # reverse_nested invariant: parents <= objects per bucket
    for n, p in got.values():
        assert p <= n


def test_bucket_sort_agg_offset_and_size(spark):
    rows = [(k, c) for k, c in zip("abcdefg", [7, 3, 9, 1, 5, 9, 2])]
    b = spark.createDataFrame(rows, "key string, doc_count int")
    out = aggs.bucket_sort_agg(
        b, [F.desc("doc_count"), F.asc("key")], from_=1, size=3
    ).collect()
    # full order: c9 f9 a7 e5 b3 g2 d1 -> skip 1, take 3
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("f", 9), ("a", 7), ("e", 5)
    ]


def test_percentiles_bucket_nearest_rank(spark):
    vals = [5, 1, 9, 3, 7]  # sorted: 1 3 5 7 9
    b = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                              "key int, m int")
    out = aggs.percentiles_bucket_agg(b, "m", [1, 25, 50, 75, 100])
    got = {r["percent"]: r["m_pct"] for r in out.collect()}
    # nearest rank ceil(p*n/100): 1%->rank1, 25%->rank2, 50%->rank3,
    # 75%->rank4, 100%->rank5
    assert got == {1: 1, 25: 3, 50: 5, 75: 7, 100: 9}


def test_pinned_query_order_and_skips(docs):
    out = search.pinned_query(
        docs, "spark join window", [42, 7, 10**9], 10
    ).collect()
    assert len(out) == 10
    # ranks are 1..10, pins first in the given order, missing id skipped
    assert [r["rank"] for r in out] == list(range(1, 11))
    assert [r["doc_id"] for r in out[:2]] == [42, 7]
    assert all(r["pinned"] for r in out[:2])
    assert not any(r["pinned"] for r in out[2:])
    # pinned rows carry NULL score; organic rows are score-desc sorted
    assert all(r["score"] is None for r in out[:2])
    organic = [r["score"] for r in out[2:]]
    assert organic == sorted(organic, reverse=True)
    # no pinned id repeats in the organic tail
    assert not any(r["doc_id"] in (42, 7) for r in out[2:])


def test_pinned_query_organic_matches_search_topk(docs):
    # with an empty pin list the page IS the ordinary top-k
    base = search.search_topk(docs, "spark join window", 10).collect()
    out = search.pinned_query(docs, "spark join window", [], 10).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (r["doc_id"], r["score"]) for r in base
    ]


def test_edge_ngram_analyzer_grams(spark):
    from bigdatasearchpro_spark.operators.analyzers import ANALYZERS

    idx_expr, q_analyze = ANALYZERS["edge_ngram"]
    df = spark.createDataFrame(
        [("Sparkly a win window",)], "text string"
    ).select(idx_expr(F.col("text")).alias("g"))
    got = df.first()["g"]
    # "sparkly" -> sp spa spar spark ; "a" (< min_gram) -> nothing ;
    # "win" -> wi win ; "window" -> wi win wind windo
    assert got == [
        "sp", "spa", "spar", "spark",
        "wi", "win",
        "wi", "win", "wind", "windo",
    ]
    # search side is plain standard analysis
    assert q_analyze("Spa Win!") == ["spa", "win"]


def test_edge_ngram_matches_prefix_semantics(docs):
    from bigdatasearchpro_spark.operators.analyzers import ANALYZERS
    from bigdatasearchpro_spark.operators.search import tokens_expr

    idx_expr, _ = ANALYZERS["edge_ngram"]
    grams = idx_expr(F.col("text"))
    via_grams = docs.filter(F.array_contains(grams, "spa")).select("doc_id")
    toks = tokens_expr("text", "standard")
    via_prefix = docs.filter(
        F.exists(toks, lambda t: t.startswith("spa"))
    ).select("doc_id")
    a = {r["doc_id"] for r in via_grams.collect()}
    b = {r["doc_id"] for r in via_prefix.collect()}
    assert a == b and a


def test_moving_percentiles_window_semantics(spark):
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5, 1, 9, 3, 7])], "key int, m int"
    )
    out = aggs.moving_percentiles_agg(b, "m", [50, 100], window=3)
    rows = {r["key"]: (r["m_p50"], r["m_p100"]) for r in out.collect()}
    # frames (trailing 3, ending BEFORE current): k0: [] -> NULL;
    # k1: [5]; k2: [1,5]; k3: [1,5,9]; k4: [1,3,9]
    assert rows[0] == (None, None)
    assert rows[1] == (5, 5)
    assert rows[2] == (1, 5)
    assert rows[3] == (5, 9)
    assert rows[4] == (3, 9)


def test_fingerprint_analyzer_canonicalizes(spark):
    from bigdatasearchpro_spark.operators.analyzers import ANALYZERS

    idx_expr, q_analyze = ANALYZERS["fingerprint"]
    df = spark.createDataFrame(
        [("The quick quick Fox, the FOX!",)], "text string"
    ).select(idx_expr(F.col("text")).alias("f"))
    assert df.first()["f"] == ["fox quick the"]
    # symmetric query-side twin; word order / repetition invariant
    assert q_analyze("fox THE quick") == ["fox quick the"]
    assert q_analyze("quick fox the the") == ["fox quick the"]


def test_resize_index_lifecycle_and_shard_lineage(spark, sf_dir):
    from bigdatasearchpro_spark import api

    ev = load_table(spark, sf_dir, "events")
    api.bulk_data_to_index(spark, ev, "rsz_t", id_col="event_id",
                           routing_col="user_id", n_shards=8)
    try:
        split = api.resize_index(spark, "rsz_t", "rsz_t16",
                                 op="_split", factor=2)
        assert split["shards"] == 16 and split["rows"] == ev.count()
        src = api.resolve_index(spark, "rsz_t").select(
            "event_id", F.col("__shard").alias("s"))
        tgt = api.resolve_index(spark, "rsz_t16").select(
            "event_id", F.col("__shard").alias("t"))
        j = src.join(tgt, "event_id")
        # ES split invariant: target shard ≡ source shard (mod n_src)
        assert j.filter(F.pmod(F.col("t"), F.lit(8)) != F.col("s")).count() == 0
        # shrink back down: 16 -> 4, lineage reversed
        shrink = api.resize_index(spark, "rsz_t16", "rsz_t4",
                                  op="_shrink", factor=4)
        assert shrink["shards"] == 4 and shrink["rows"] == ev.count()
        t4 = api.resolve_index(spark, "rsz_t4").select(
            "event_id", F.col("__shard").alias("q"))
        j2 = tgt.join(t4, "event_id")
        assert j2.filter(F.pmod(F.col("t"), F.lit(4)) != F.col("q")).count() == 0
        # clone preserves shard structure and content exactly
        clone = api.resize_index(spark, "rsz_t4", "rsz_tc", op="_clone")
        assert clone["shards"] == 4
        a = api.resolve_index(spark, "rsz_t4")
        b = api.resolve_index(spark, "rsz_tc")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # guards: shrink factor must divide; resize needs routing
        with pytest.raises(ValueError):
            api.resize_index(spark, "rsz_t4", "x", op="_shrink", factor=3)
        with pytest.raises(ValueError):
            api.resize_index(spark, "rsz_t4", "x", op="_resize")
    finally:
        for idx in ("rsz_t", "rsz_t16", "rsz_t4", "rsz_tc"):
            try:
                api.delete_index(spark, idx)
            except Exception:
                pass


def test_synonym_match_group_semantics(docs):
    from bigdatasearchpro_spark.operators.search import (
        expand_synonyms, synonym_match, tokens_expr,
    )

    assert expand_synonyms(["sort", "window"], [("sort", "order")]) == [
        ["order", "sort"], ["window"]
    ]
    out = synonym_match(docs, "sort window", [("sort", "order")], mode="all")
    toks = tokens_expr("text", "standard")
    exp = docs.filter(
        (F.array_contains(toks, "sort") | F.array_contains(toks, "order"))
        & F.array_contains(toks, "window")
    )
    assert out.count() == exp.count()
    # group match is strictly weaker than the surface-term AND match
    plain = docs.filter(
        F.array_contains(toks, "sort") & F.array_contains(toks, "window")
    )
    assert plain.count() < out.count()


def test_soft_dedup_weights_invariants(spark):
    from bigdatasearchpro_spark.operators import dedup

    rows = [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = dedup.soft_dedup_weights(df, "text")
    got = {r["doc_id"]: (r["n_dups"], r["weight_ppm"]) for r in out.collect()}
    assert got == {
        1: (3, 333333), 3: (3, 333333), 4: (3, 333333),
        2: (1, 1000000), 5: (1, 1000000),
    }
    # every row kept; expected contribution per unique text == 1 doc
    assert len(got) == len(rows)
    per_text = {}
    for r in out.collect():
        per_text.setdefault(r["text"], 0)
        per_text[r["text"]] += r["weight_ppm"]
    for text, tot in per_text.items():
        assert abs(tot - 1000000) <= 3  # floor rounding, <= n ppm off


def test_variable_width_histogram_twin_and_invariants(spark, sf_dir):
    from fractions import Fraction

    orders = load_table(spark, sf_dir, "orders")
    out = aggs.variable_width_histogram_agg(
        orders, "o_totalprice", 8, fine_buckets=50
    ).collect()
    assert len(out) == 8
    # buckets tile the value range in order, counts sum to the corpus
    assert sum(r["doc_count"] for r in out) == orders.count()
    for i in range(1, len(out)):
        assert out[i]["min"] >= out[i - 1]["max"]
    for r in out:
        assert r["min"] <= r["key"] <= r["max"]
    # pure-Python twin: same fine cells + same merge rule == same result
    vals = [r["o_totalprice"] for r in orders.select("o_totalprice").collect()]
    lo, hi = min(vals), max(vals)
    fine = {}
    for v in vals:
        c = min(49, int((v - lo) / (hi - lo) * 50))
        e = fine.setdefault(c, {"n": 0, "s": 0, "mn": v, "mx": v})
        e["n"] += 1
        # the engine's integer grid is floor(x*100 + 0.5)
        # (round-half-toward-+inf, cross-engine-stable) — NOT python
        # round() (half-even)
        e["s"] += math.floor(v * 100 + 0.5)
        e["mn"] = min(e["mn"], v)
        e["mx"] = max(e["mx"], v)
    cl = [fine[c] for c in sorted(fine)]
    while len(cl) > 8:
        best, gap = None, None
        for i in range(len(cl) - 1):
            a, b = cl[i], cl[i + 1]
            g = Fraction(b["s"] * a["n"] - a["s"] * b["n"], a["n"] * b["n"])
            if gap is None or g < gap:
                best, gap = i, g
        a, b = cl[best], cl[best + 1]
        cl[best:best + 2] = [{"n": a["n"] + b["n"], "s": a["s"] + b["s"],
                              "mn": min(a["mn"], b["mn"]),
                              "mx": max(a["mx"], b["mx"])}]
    twin = [((c["s"] / 100) / c["n"], c["mn"], c["mx"], c["n"]) for c in cl]
    got = [(r["key"], r["min"], r["max"], r["doc_count"]) for r in out]
    assert got == twin


def test_terms_partition_disjoint_exhaustive(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    total = li.select("l_partkey").distinct().count()
    seen = 0
    for variant in (aggs.terms_partition_filter,
                    aggs.terms_partition_filter_md5):
        parts = [
            li.filter(variant("l_partkey", p, 4))
            .select("l_partkey").distinct()
            for p in range(4)
        ]
        counts = [p.count() for p in parts]
        assert sum(counts) == total  # exhaustive
        assert all(c > 0 for c in counts)  # all slices populated
        # disjoint: pairwise intersections empty
        assert parts[0].intersect(parts[1]).count() == 0
        assert parts[2].intersect(parts[3]).count() == 0
        seen += 1
    assert seen == 2
    import pytest as _p
    with _p.raises(ValueError):
        aggs.terms_partition_filter("l_partkey", 4, 4)

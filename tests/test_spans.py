"""Span query algebra: combinator semantics on hand-checkable docs,
plan shape, honest-subset guards."""

from __future__ import annotations

import pytest

from bigdatasearchpro_spark.operators.spans import span_query


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark join window group"),
        (2, "spark x y join"),
        (3, "join spark"),
        (4, "spark a b c d join"),
        (5, "window spark join"),
        (6, "spark join"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def ids(df):
    return [r.doc_id for r in df.collect()]


NEAR = {"span_near": {"clauses": [{"span_term": "spark"},
                                  {"span_term": "join"}],
                      "slop": 2, "in_order": True}}


def test_span_near_ordered_and_unordered(corpus):
    assert ids(span_query(corpus, NEAR)) == [1, 2, 5, 6]
    un = {"span_near": {"clauses": [{"span_term": "spark"},
                                    {"span_term": "join"}],
                        "slop": 0, "in_order": False}}
    assert ids(span_query(corpus, un)) == [1, 3, 5, 6]


def test_span_near_three_clause_cumulative_slop(spark):
    rows = [(1, "a x b y c"),   # gaps 1 + 1 = 2
            (2, "a x x b c"),   # gaps 2 + 0 = 2
            (3, "a x x b y c")]  # gaps 2 + 1 = 3 > 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spec = {"span_near": {"clauses": [{"span_term": "a"},
                                      {"span_term": "b"},
                                      {"span_term": "c"}],
                          "slop": 2, "in_order": True}}
    assert ids(span_query(df, spec)) == [1, 2]


def test_span_first_or_not(corpus):
    first = {"span_first": {"match": {"span_term": "join"}, "end": 2}}
    assert ids(span_query(corpus, first)) == [1, 3, 6]
    orq = {"span_or": {"clauses": [{"span_term": "group"},
                                   {"span_term": "window"}]}}
    assert ids(span_query(corpus, orq)) == [1, 5]
    # exclude only kills OVERLAPPING spans: no doc here has 'window'
    # inside its spark..join span
    sn = {"span_not": {"include": NEAR, "exclude": {"span_term": "window"}}}
    assert ids(span_query(corpus, sn)) == [1, 2, 5, 6]


def test_span_not_kills_overlapping_span(spark):
    df = spark.createDataFrame(
        [(1, "spark window join"), (2, "spark join window")],
        "doc_id long, text string",
    )
    sn = {"span_not": {"include": NEAR, "exclude": {"span_term": "window"}}}
    assert ids(span_query(df, sn)) == [2]


def test_span_plan_is_single_scan(corpus):
    out = span_query(corpus, NEAR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode
    assert plan.count("Join") == 0
    assert "BatchEvalPython" not in plan


def test_span_guards(corpus):
    with pytest.raises(ValueError, match="one token"):
        span_query(corpus, {"span_term": "two words"})
    with pytest.raises(ValueError, match="exactly 2"):
        span_query(corpus, {"span_near": {
            "clauses": [{"span_term": "a"}, {"span_term": "b"},
                        {"span_term": "c"}],
            "slop": 1, "in_order": False}})
    with pytest.raises(ValueError, match=">= 2 clauses"):
        span_query(corpus, {"span_near": {"clauses": [{"span_term": "a"}]}})
    with pytest.raises(ValueError, match="one match clause"):
        span_query(corpus, {"span_multi": {}})
    with pytest.raises(ValueError, match="prefix/wildcard"):
        span_query(corpus, {"span_multi": {
            "match": {"fuzzy": {"value": "spark"}}}})
    with pytest.raises(ValueError, match="unsupported span"):
        span_query(corpus, {"span_nope": {}})
    with pytest.raises(ValueError, match="'little' and 'big'"):
        span_query(corpus, {"span_containing": {}})
    with pytest.raises(ValueError, match="end must be positive"):
        span_query(corpus, {"span_first": {"match": {"span_term": "a"},
                                           "end": 0}})


def test_span_multi_prefix_and_wildcard(corpus, spark):
    # prefix matcher alone: every doc with an sp* token
    pm = {"span_multi": {"match": {"prefix": {"value": "sp"}}}}
    assert ids(span_query(corpus, pm)) == [1, 2, 3, 4, 5, 6]
    # composed inside span_near it carries POSITIONS: sp* then join,
    # gap <= 2 — same doc set as the span_term form here since the
    # only sp* token is 'spark'
    near = {"span_near": {"clauses": [pm, {"span_term": "join"}],
                          "slop": 2, "in_order": True}}
    assert ids(span_query(corpus, near)) == [1, 2, 5, 6]
    # wildcard matcher distinguishes by pattern, not prefix
    df = spark.createDataFrame(
        [(1, "spork join"), (2, "spark join"), (3, "speak join")],
        "doc_id long, text string",
    )
    wc = {"span_near": {"clauses": [
        {"span_multi": {"match": {"wildcard": {"value": "sp?rk"}}}},
        {"span_term": "join"}], "slop": 0, "in_order": True}}
    assert ids(span_query(df, wc)) == [1, 2]


def test_span_multi_plan_is_single_scan(corpus):
    out = span_query(corpus, {"span_near": {
        "clauses": [{"span_multi": {"match": {"prefix": {"value": "sp"}}}},
                    {"span_term": "join"}],
        "slop": 2, "in_order": True}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert plan.count("Join") == 0
    assert "BatchEvalPython" not in plan


def test_span_containing_vs_within_span_sets(spark):
    from bigdatasearchpro_spark.operators.spans import span_spec_expr

    df = spark.createDataFrame(
        [("spark a join b window join extra",)], "text string"
    )
    base = {
        "big": {"span_near": {"clauses": [{"span_term": "spark"},
                                          {"span_term": "window"}],
                              "slop": 3, "in_order": True}},
        "little": {"span_term": "join"},
    }
    containing = df.select(
        span_spec_expr("text", {"span_containing": base}).alias("s")
    ).first()["s"]
    within = df.select(
        span_spec_expr("text", {"span_within": base}).alias("s")
    ).first()["s"]
    # one big span (spark@0 .. window@4) contains join@2; join@5 is
    # outside it. Containing returns the big span, within the little.
    assert [(s["s"], s["e"]) for s in containing] == [(0, 4)]
    assert [(s["s"], s["e"]) for s in within] == [(2, 2)]


def test_span_containing_no_cover_no_match(spark):
    from bigdatasearchpro_spark.operators.spans import span_spec_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("spark b window join",)], "text string"  # join AFTER the span
    )
    spec = {"span_containing": {
        "big": {"span_near": {"clauses": [{"span_term": "spark"},
                                          {"span_term": "window"}],
                              "slop": 3, "in_order": True}},
        "little": {"span_term": "join"},
    }}
    out = df.select(F.size(span_spec_expr("text", spec)).alias("n"))
    assert out.first()["n"] == 0

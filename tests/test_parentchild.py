"""Parent-child (ES ``join`` field) query semantics: has_child score
modes / children bounds, has_parent propagation, and the LeftSemi
fast paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import parentchild
from bigdatasearchpro_spark.sources.files import load_table


@pytest.fixture(scope="module")
def rel(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders, li


def test_has_child_existence_is_semi_join(rel):
    orders, li = rel
    pred = F.col("l_quantity") >= 49
    out = parentchild.has_child(orders, li, "o_orderkey", pred,
                                child_on="l_orderkey")
    # no extra columns in the pure-existence form
    assert out.columns == orders.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    expected = {
        r.l_orderkey
        for r in li.filter(pred).select("l_orderkey").distinct().collect()
    }
    got = {r.o_orderkey for r in out.select("o_orderkey").collect()}
    assert got == expected


def test_has_child_score_modes_agree_with_manual_agg(rel):
    orders, li = rel
    pred = (F.col("l_quantity") >= 48) & (F.col("l_returnflag") == "R")
    manual = {
        r.l_orderkey: (r.n, r.mn, r.mx, r.sm)
        for r in li.filter(pred)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
            F.sum("l_quantity").alias("sm"),
        )
        .collect()
    }
    for mode, pick in [
        ("min", lambda t: t[1]),
        ("max", lambda t: t[2]),
        ("sum", lambda t: t[3]),
        ("avg", lambda t: t[3] / t[0]),
    ]:
        out = parentchild.has_child(
            orders, li, "o_orderkey", pred, child_on="l_orderkey",
            score_col="l_quantity", score_mode=mode,
        )
        got = {r.o_orderkey: (r.n_children, r.score) for r in out.collect()}
        assert set(got) == set(manual)
        for k, (n, score) in got.items():
            assert n == manual[k][0]
            assert score == pick(manual[k])


def test_has_child_children_bounds(rel):
    orders, li = rel
    pred = F.col("l_quantity") >= 45
    counts = {
        r.l_orderkey: r.n
        for r in li.filter(pred).groupBy("l_orderkey")
        .agg(F.count("*").alias("n")).collect()
    }
    out = parentchild.has_child(
        orders, li, "o_orderkey", pred, child_on="l_orderkey",
        min_children=2, max_children=3,
    )
    got = {r.o_orderkey for r in out.collect()}
    assert got == {k for k, n in counts.items() if 2 <= n <= 3}


def test_has_parent_propagates_single_parent_score(rel):
    orders, li = rel
    pred = F.col("o_orderpriority") == "1-URGENT"
    out = parentchild.has_parent(
        li, orders, "l_orderkey", pred, parent_on="o_orderkey",
        score_col="o_totalprice",
    )
    parent_price = {
        r.o_orderkey: r.o_totalprice
        for r in orders.filter(pred).collect()
    }
    rows = out.select("l_orderkey", "score").collect()
    assert rows and all(r.score == parent_price[r.l_orderkey] for r in rows)


def test_has_parent_semi_form_adds_no_columns(rel):
    orders, li = rel
    out = parentchild.has_parent(
        li, orders, "l_orderkey",
        F.col("o_orderpriority") == "1-URGENT", parent_on="o_orderkey",
    )
    assert out.columns == li.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_has_child_guards(rel):
    orders, li = rel
    with pytest.raises(ValueError, match="score_mode"):
        parentchild.has_child(orders, li, "o_orderkey", F.lit(True),
                              score_mode="mean")
    with pytest.raises(ValueError, match="score_col"):
        parentchild.has_child(orders, li, "o_orderkey", F.lit(True),
                              score_mode="sum")

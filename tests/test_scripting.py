"""Scripting DSL: parser coverage, emitter agreement (Column vs SQL
on the same AST), and the ES-surface wrappers."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators.scripting import (
    Script,
    runtime_field,
    scripted_metric_agg,
)


def test_precedence_and_unary():
    s = Script("1 + 2 * 3 - -4")
    assert s.sql() == (
        "((CAST(1.0 AS DOUBLE) + (CAST(2.0 AS DOUBLE) * CAST(3.0 AS DOUBLE)))"
        " - (-CAST(4.0 AS DOUBLE)))"
    )
    assert duckdb.sql(f"SELECT {s.sql()} AS v").fetchone()[0] == 11.0


def test_params_fields_and_functions():
    s = Script(
        "Math.abs(doc['x'].value - params.mu) / Math.floor(params.d)",
        {"mu": 10, "d": 3.7},
    )
    assert s.fields == ["x"]
    got = duckdb.sql(
        f"SELECT {s.sql(field_map={'x': 'x'})} AS v FROM (SELECT 4 AS x)"
    ).fetchone()[0]
    assert got == 2.0


def test_parse_errors():
    with pytest.raises(ValueError, match="unexpected|unsupported"):
        Script("doc['x'].value ** 2")
    with pytest.raises(ValueError, match="unsupported"):
        Script("doc['x'].value % 2")
    with pytest.raises(ValueError, match="unbound"):
        Script("params.missing")
    with pytest.raises(ValueError, match="expected"):
        Script("Math.floor(1 + 2")
    with pytest.raises(ValueError, match="trailing|unexpected"):
        Script("1 2")


def test_score_binding():
    s = Script("_score * params.b", {"b": 2})
    with pytest.raises(ValueError, match="_score"):
        s.column()
    with pytest.raises(ValueError, match="_score"):
        s.sql()
    assert "my_score" in s.sql(score_sql="my_score")


def test_column_and_sql_agree_on_fixture(spark, docs):
    src = "params.w * doc['n_chars'].value / (doc['n_chars'].value + params.p)"
    s = Script(src, {"w": 2, "p": 200})
    rows = (
        docs.select("doc_id", "n_chars", s.column().alias("v"))
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    for r in rows:
        expected = duckdb.sql(
            f"SELECT {s.sql(field_map={'n_chars': 'n'})} "
            f"FROM (SELECT {r.n_chars} AS n)"
        ).fetchone()[0]
        assert r.v == expected  # bit-identical, no tolerance


def test_runtime_field_is_plain_expression(spark, sf_dir):
    from bigdatasearchpro_spark.sources.files import load_table

    orders = load_table(spark, sf_dir, "orders")
    rt = runtime_field(orders, "tier",
                       "Math.floor(doc['o_totalprice'].value / params.b)",
                       {"b": 50000})
    plan = rt._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    row = rt.select(F.min("tier"), F.max("tier")).first()
    assert row[0] >= 0 and row[1] >= row[0]


def test_scripted_metric_matches_builtin_sum(spark, sf_dir):
    from bigdatasearchpro_spark.sources.files import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: r.value
        for r in scripted_metric_agg(
            li, ["l_returnflag"], "doc['l_quantity'].value * params.f",
            {"f": 3}, reduce="sum",
        ).collect()
    }
    want = {
        r.l_returnflag: r.v
        for r in li.groupBy("l_returnflag")
        .agg((F.sum("l_quantity") * 3).alias("v"))
        .collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="reduce"):
        scripted_metric_agg(li, ["l_returnflag"],
                            "doc['l_quantity'].value", reduce="median")


def test_stored_script_lifecycle(spark):
    import pytest as pt

    from bigdatasearchpro_spark import api

    sid = "unit-stored-script"
    api.delete_script(spark, sid)  # clean slate
    with pt.raises(ValueError, match="invalid script id"):
        api.put_script(spark, "Bad Id!", "1 + 1")
    # mustache became a SUPPORTED lang in r10 (stored search templates
    # for _render/template) — the unsupported-lang guard now needs a
    # genuinely unknown lang
    with pt.raises(ValueError, match="unsupported script lang"):
        api.put_script(spark, sid, "1 + 1", lang="expression")
    with pt.raises(ValueError):  # parse-validated at PUT
        api.put_script(spark, sid, "doc['x'].value %% 2")
    stored = api.put_script(
        spark, sid, "doc['x'].value * params.m + params.b")
    assert stored["lang"] == "painless" and stored["id"] == sid
    # unbound at use time raises; bound evaluates
    with pt.raises(ValueError, match="unbound|still unbound"):
        col = api.stored_script_column(spark, sid, {"m": 2})
    col = api.stored_script_column(spark, sid, {"m": 2, "b": 7})
    df = spark.createDataFrame([(10,)], "x long").select(col.alias("v"))
    assert df.first().v == 27.0
    assert api.delete_script(spark, sid) is True
    assert api.delete_script(spark, sid) is False
    assert api.get_script(spark, sid) is None
    with pt.raises(ValueError, match="no stored script"):
        api.stored_script_column(spark, sid, {})


def test_unbound_param_placeholder_roundtrip():
    s = Script("params.a + doc['x'].value", strict=False)
    import pytest as pt

    with pt.raises(ValueError, match="still unbound"):
        s.sql(field_map={"x": "x"})
    bound = s.bind({"a": 5})
    assert "5.0" in bound.sql(field_map={"x": "x"})

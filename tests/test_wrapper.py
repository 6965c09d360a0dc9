"""wrapper query: decode errors, dispatcher kinds, plan equivalence
with the unwrapped inner query."""

from __future__ import annotations

import base64
import json

import pytest

from bigdatasearchpro_spark.operators.wrapper import compile_dsl, wrapper_query


def _enc(node) -> str:
    return base64.b64encode(json.dumps(node).encode()).decode()


def test_wrapper_equals_unwrapped(docs):
    node = {"query_string": {"query": "spark AND join"}}
    a = sorted(r.doc_id for r in
               wrapper_query(docs, _enc(node)).select("doc_id").collect())
    b = sorted(r.doc_id for r in
               compile_dsl(docs, node).select("doc_id").collect())
    assert a == b and a


def test_dispatcher_kinds(docs):
    n = docs.count()
    assert compile_dsl(docs, {"match_all": {}}).count() == n
    en = compile_dsl(docs, {"term": {"lang": "en"}})
    assert en.count() == docs.filter("lang = 'en'").count()
    two = compile_dsl(docs, {"terms": {"lang": ["en", "de"]}})
    assert two.count() == docs.filter("lang IN ('en','de')").count()
    rng = compile_dsl(docs, {"range": {"n_chars": {"gte": 100, "lt": 200}}})
    assert rng.count() == docs.filter(
        "n_chars >= 100 AND n_chars < 200").count()
    m_any = compile_dsl(docs, {"match": {"text": "spark join"}})
    m_all = compile_dsl(
        docs, {"match": {"text": {"query": "spark join", "operator": "and"}}})
    assert m_all.count() <= m_any.count()


def test_wrapper_errors(docs):
    with pytest.raises(ValueError, match="base64"):
        wrapper_query(docs, "!!!not-base64!!!")
    with pytest.raises(ValueError, match="base64"):
        wrapper_query(docs, base64.b64encode(b"not json").decode())
    with pytest.raises(ValueError, match="unsupported"):
        compile_dsl(docs, {"fuzzy_like_this": {}})
    with pytest.raises(ValueError, match="single"):
        compile_dsl(docs, {"a": {}, "b": {}})
    with pytest.raises(ValueError, match="range bound"):
        compile_dsl(docs, {"range": {"n_chars": {"between": [1, 2]}}})


def test_constant_score_filter_context(docs):
    out = compile_dsl(
        docs,
        {"constant_score": {"filter": {"term": {"lang": "en"}},
                            "boost": 3.5}},
    )
    rows = out.select("lang", "score").collect()
    assert rows and all(r.lang == "en" and r.score == 3.5 for r in rows)
    # default boost is 1.0
    d = compile_dsl(docs, {"constant_score": {"filter": {"match_all": {}}}})
    assert d.select("score").first().score == 1.0
    # no BM25 machinery: plan is a plain filter + literal projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_search_template_render(docs):
    from bigdatasearchpro_spark.operators.wrapper import (
        render_template,
        search_template,
    )

    node = render_template(
        '{"range": {"n_chars": {"gte": {{lo}}, "lt": {{hi}}}}}',
        {"lo": 1, "hi": 9},
    )
    assert node == {"range": {"n_chars": {"gte": 1, "lt": 9}}}
    out = search_template(docs, '{"term": {"lang": "{{l}}"}}', {"l": "de"})
    assert out.count() == docs.filter("lang = 'de'").count()
    with pytest.raises(ValueError, match="missing template param"):
        render_template('{"term": {"lang": "{{l}}"}}', {})
    with pytest.raises(ValueError, match="not valid JSON"):
        render_template('{"term": {{v}}', {"v": "}{"})


def test_render_template_endpoint_and_stored_mustache(spark, docs):
    """ES `_render/template`: inline and stored (`PUT _scripts/{id}`
    lang=mustache) renders agree and return `{"template_output": ...}`;
    the stored payload survives the catalog round trip even though
    JSON-escaping puts backslashes in the property value (Spark's
    C-style literal parser eats unescaped backslashes); lang guards
    fire both ways (a mustache template is not executable painless,
    a painless script is not renderable)."""
    import uuid

    from bigdatasearchpro_spark import api

    src = ('{"bool": {"must": [{"term": {"lang": "{{l}}"}}, '
           '{"range": {"n_chars": {"gte": {{lo}}}}}]}}')
    tid = f"tpl-{uuid.uuid4().hex[:8]}"
    api.put_script(spark, tid, src, lang="mustache")
    try:
        # catalog round trip is byte-exact (the backslash-escape fix)
        assert api.get_script(spark, tid)["source"] == src
        out = api.render_search_template(
            spark, template_id=tid, params={"l": "en", "lo": 10})
        assert out == api.render_search_template(
            spark, source=src, params={"l": "en", "lo": 10})
        node = out["template_output"]
        assert node["bool"]["must"][1]["range"]["n_chars"]["gte"] == 10
        got = compile_dsl(docs, node)
        assert got.count() == docs.filter(
            "lang = 'en' AND n_chars >= 10").count()
        with pytest.raises(ValueError, match="not an executable painless"):
            api.stored_script_column(spark, tid, {})
    finally:
        assert api.delete_script(spark, tid)
    pid = f"pl-{uuid.uuid4().hex[:8]}"
    api.put_script(spark, pid, "doc['n_chars'].value * 2")
    try:
        with pytest.raises(ValueError, match="not a mustache"):
            api.render_search_template(spark, template_id=pid, params={})
    finally:
        assert api.delete_script(spark, pid)
    with pytest.raises(ValueError, match="exactly one of"):
        api.render_search_template(spark, source="{}", template_id="x")
    with pytest.raises(ValueError, match="no stored template"):
        api.render_search_template(spark, template_id="absent-tpl")


def test_bool_wrapper_clauses(docs):
    """Conjunctive bool in the wrapper/template dispatcher: must/filter
    chain as native filters over one scan; scoring-context clauses are
    refused honestly."""
    node = {"bool": {"must": [{"term": {"lang": "de"}}],
                     "filter": {"range": {"n_chars": {"gte": 50}}}}}
    got = compile_dsl(docs, node)
    assert got.count() == docs.filter(
        "lang = 'de' AND n_chars >= 50").count()
    from bigdatasearchpro_spark.plans import file_scan_count, pushed_filters

    assert file_scan_count(got) == 1
    pushed = " ".join(pushed_filters(got))
    assert "lang" in pushed and "n_chars" in pushed, \
        "bool must/filter predicates did not reach the scan"
    with pytest.raises(ValueError, match="unsupported bool clauses"):
        compile_dsl(docs, {"bool": {"should": [{"match_all": {}}]}})

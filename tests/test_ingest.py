"""Ingest pipelines: processor semantics, PUT-time validation, the
stored-pipeline bulk path, and the single-projection plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark import api
from bigdatasearchpro_spark.operators.ingest import (
    apply_pipeline,
    validate_pipeline,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "  Hello World  ", "A-1", 2.5), (2, "BYE", "B-2", 3.0)],
        "id long, msg string, code string, v double",
    )


def test_column_processors(frame):
    out = apply_pipeline(frame, [
        {"trim": {"field": "msg"}},
        {"lowercase": {"field": "msg"}},
        {"gsub": {"field": "code", "pattern": "-", "replacement": ""}},
        {"set": {"field": "src", "value": "etl"}},
        {"rename": {"field": "v", "target_field": "value"}},
        {"script": {"source": "doc['value'].value * params.w",
                    "params": {"w": 2}, "target_field": "v2"}},
        {"convert": {"field": "v2", "type": "long"}},
        {"split": {"field": "msg", "separator": " "}},
        {"remove": {"field": "id"}},
    ])
    rows = {tuple(r.msg): r for r in out.collect()}
    r = rows[("hello", "world")]
    assert r.code == "A1" and r.src == "etl" and r.v2 == 5
    assert "id" not in out.columns and "v" not in out.columns
    # pure column processors: a single projection over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_enrich_is_broadcast_join(spark, frame):
    lookup = spark.createDataFrame(
        [("A-1", "alpha"), ("B-2", "beta")], "code string, label string"
    )
    out = apply_pipeline(frame, [
        {"enrich": {"lookup": lookup, "match_field": "code",
                    "target_fields": ["label"]}},
    ])
    got = {r.code: r.label for r in out.collect()}
    assert got == {"A-1": "alpha", "B-2": "beta"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_put_time_validation(spark):
    for bad, msg in [
        ([], "at least one"),
        ([{"explode": {}}], "unknown processor"),
        ([{"set": {"field": "x"}}], "set needs"),
        ([{"convert": {"field": "x", "type": "bool"}}], "convert type"),
        ([{"script": {"source": "1 +"}}], "target_field"),
        ([{"enrich": {"match_field": "x", "target_fields": []}}],
         "lookup frame or an index"),
    ]:
        with pytest.raises(ValueError, match=msg):
            validate_pipeline(bad)
    # stored pipelines must be pure JSON (enrich by index name only)
    with pytest.raises(ValueError, match="reference an index"):
        api.put_ingest_pipeline(spark, "p", [
            {"enrich": {"lookup": object(), "match_field": "x",
                        "target_fields": ["y"]}}])


def test_stored_pipeline_bulk_roundtrip(spark, frame):
    import uuid

    pid = f"unit-pipe-{uuid.uuid4().hex[:6]}"
    idx = f"unit_pipe_idx_{uuid.uuid4().hex[:6]}"
    api.put_ingest_pipeline(spark, pid, [
        {"lowercase": {"field": "msg"}},
        {"trim": {"field": "msg"}},
    ])
    try:
        assert api.get_ingest_pipeline(spark, pid) is not None
        api.bulk_data_to_index(spark, frame, idx, id_col="id", pipeline=pid)
        vals = {r.msg for r in spark.table(idx).select("msg").collect()}
        assert vals == {"hello world", "bye"}
        with pytest.raises(ValueError, match="no ingest pipeline"):
            api.bulk_data_to_index(spark, frame, idx, pipeline="missing")
    finally:
        api.delete_index(spark, idx)
        assert api.delete_ingest_pipeline(spark, pid)
        assert api.get_ingest_pipeline(spark, pid) is None


def test_inference_processor_matches_quality_logit_scores(spark, sf_dir):
    """The inference processor's attach form is bit-equal to
    quality_logit_scores on the fixture, preserves every input column,
    and rejects undeployed model ids at PUT time."""
    import pytest
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark.operators.ingest import (
        apply_pipeline,
        validate_pipeline,
    )
    from bigdatasearchpro_spark.operators.textstats import (
        quality_logit_scores,
    )
    from bigdatasearchpro_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = apply_pipeline(
        docs,
        [{"inference": {"model_id": "quality-logit-v1",
                        "target_field": "q"}}],
    )
    assert set(docs.columns) <= set(out.columns)
    got = {r["doc_id"]: r["q"] for r in out.select("doc_id", "q").collect()}
    want = {r["doc_id"]: r["logit_scaled"]
            for r in quality_logit_scores(docs).collect()}
    assert got == want
    with pytest.raises(ValueError, match="model_id"):
        validate_pipeline([{"inference": {"model_id": "nope", "target_field": "q"}}])
    with pytest.raises(ValueError, match="target_field"):
        validate_pipeline([{"inference": {"model_id": "quality-logit-v1"}}])


def test_json_processor_infers_and_honors_explicit_schema(spark):
    """Inferred-schema parse structures the field; an explicit DDL
    schema wins; an all-null field fails loudly at apply."""
    import pytest

    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": "x"}'), (2, '{"a": 7, "b": "y"}')],
        "id long, payload string",
    )
    out = apply_pipeline(
        df, [{"json": {"field": "payload", "target_field": "o"}}]
    ).select("id", "o.a", "o.b").collect()
    assert {(r["id"], r["a"], r["b"]) for r in out} == {(1, 5, "x"), (2, 7, "y")}
    typed = apply_pipeline(
        df,
        [{"json": {"field": "payload", "target_field": "o",
                   "schema": "a string"}}],
    ).select("o.a").collect()
    assert {r["a"] for r in typed} == {"5", "7"}  # DDL schema wins
    nulls = spark.createDataFrame([(1, None)], "id long, payload string")
    with pytest.raises(ValueError, match="no non-null"):
        apply_pipeline(nulls, [{"json": {"field": "payload"}}])


def test_date_processor_walks_formats_and_nulls_unparseable(spark):
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "2024/01/05"), (2, "2024-01-06 10:00:00"), (3, "junk")],
        "id long, d string",
    )
    out = {r["id"]: r["@timestamp"] for r in apply_pipeline(
        df,
        [{"date": {"field": "d",
                   "formats": ["yyyy/MM/dd", "yyyy-MM-dd HH:mm:ss"]}}],
    ).collect()}
    assert out[1] is not None and out[1].day == 5
    assert out[2] is not None and out[2].hour == 10
    assert out[3] is None  # unparseable -> NULL, no throw (ANSI-safe)


def test_kv_append_fingerprint_processors(spark):
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "a=1&b=two%20words", ["t0"])],
        "id long, qs string, tags array<string>",
    )
    out = apply_pipeline(
        df,
        [
            {"kv": {"field": "qs", "target_field": "m",
                    "field_split": "&", "value_split": "="}},
            {"append": {"field": "tags", "value": "ingested"}},
            {"fingerprint": {"fields": ["id", "qs"], "target_field": "fp"}},
        ],
    ).withColumn("b_raw", __import__("pyspark.sql.functions", fromlist=["col"]).col("m")["b"])
    out = apply_pipeline(out, [{"urldecode": {"field": "b_raw", "target_field": "b"}}])
    [r] = out.collect()
    assert r["m"]["a"] == "1"
    assert r["b"] == "two words"
    assert r["tags"] == ["t0", "ingested"]
    import hashlib
    assert r["fp"] == hashlib.md5(b"id=1|qs=a=1&b=two%20words").hexdigest()


def test_append_creates_coerces_and_survives_null(spark):
    """ES append semantics (ADVICE r7): missing field -> created as
    [value]; scalar field -> coerced to array; NULL field -> fresh
    array, not NULL-poisoned concat."""
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    proc = [{"append": {"field": "tags", "value": "x"}}]
    # missing field: created
    df = spark.createDataFrame([(1,)], "id long")
    assert apply_pipeline(df, proc).collect()[0]["tags"] == ["x"]
    # scalar field: coerced to array then appended
    df = spark.createDataFrame([(1, "a")], "id long, tags string")
    assert apply_pipeline(df, proc).collect()[0]["tags"] == ["a", "x"]
    # NULL array field: fresh array (concat alone would yield NULL)
    df = spark.createDataFrame(
        [(1, None), (2, ["a"])], "id long, tags array<string>"
    )
    out = {r["id"]: r["tags"] for r in apply_pipeline(df, proc).collect()}
    assert out[1] == ["x"] and out[2] == ["a", "x"]
    # NULL scalar field: fresh array
    df = spark.createDataFrame([(1, None)], "id long, tags string")
    assert apply_pipeline(df, proc).collect()[0]["tags"] == ["x"]


def test_fingerprint_null_positions_hash_differently(spark):
    """ES fingerprint encodes field names and NULLs (ADVICE r7):
    {a:1,b:NULL} and {a:NULL,b:1} must not collide."""
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "1", None), (2, None, "1")], "id long, a string, b string"
    )
    out = {r["id"]: r["fp"] for r in apply_pipeline(
        df, [{"fingerprint": {"fields": ["a", "b"], "target_field": "fp"}}]
    ).collect()}
    assert out[1] != out[2]


# ---------------------------------------------------------------- grok


APACHE = ('%{IP:clientip} - %{USER:auth} \\[%{HTTPDATE:timestamp}\\] '
          '"%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}" '
          '%{INT:status:int} %{INT:bytes:long}')


def test_grok_apache_combined_typed_fields(spark):
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    line = ('10.0.0.7 - frank [10/Jan/2024:13:55:36 +0000] '
            '"GET /item/42?x=1 HTTP/1.1" 200 2326')
    df = spark.createDataFrame([(1, line), (2, "not a log line")],
                               "id long, msg string")
    out = {r["id"]: r for r in apply_pipeline(
        df, [{"grok": {"field": "msg", "pattern": APACHE}}]).collect()}
    r = out[1]
    assert r["clientip"] == "10.0.0.7"
    assert r["auth"] == "frank"
    assert r["timestamp"] == "10/Jan/2024:13:55:36 +0000"
    assert r["verb"] == "GET" and r["request"] == "/item/42?x=1"
    assert r["status"] == 200 and isinstance(r["status"], int)
    assert r["bytes"] == 2326
    # non-matching line -> NULL extractions (ignore_failure shape),
    # never empty strings
    bad = out[2]
    assert bad["clientip"] is None and bad["status"] is None


def test_grok_pattern_definitions_and_recursion(spark):
    from bigdatasearchpro_spark.operators.grok import (
        compile_grok,
        grok_columns,
    )

    # custom definition referencing a core pattern
    regex, fields = compile_grok(
        "%{TICKET:tid} %{LOGLEVEL:level}",
        {"TICKET": r"T-%{INT}"},
    )
    assert [f for f, _ in fields] == ["tid", "level"]
    df = spark.range(1).select(
        __import__("pyspark.sql.functions", fromlist=["lit"])
        .lit("T-991 ERROR disk full").alias("m"))
    row = df.select(
        *[c.alias(k) for k, c in grok_columns(
            df["m"], "%{TICKET:tid} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
            {"TICKET": r"T-%{INT}"}).items()]
    ).first()
    assert row["tid"] == "T-991" and row["level"] == "ERROR"
    assert row["msg"] == "disk full"


def test_grok_validation_rejects_unknowns():
    import pytest as pt

    from bigdatasearchpro_spark.operators.grok import compile_grok
    from bigdatasearchpro_spark.operators.ingest import validate_pipeline

    with pt.raises(ValueError, match="unknown grok pattern"):
        compile_grok("%{NO_SUCH_THING:x}")
    with pt.raises(ValueError, match="extracts no fields"):
        compile_grok("%{INT} plain")
    with pt.raises(ValueError, match="grok needs"):
        validate_pipeline([{"grok": {"field": "m"}}])
    # user capture groups in literal segments must not shift field
    # group numbering
    regex, fields = compile_grok(r"(a|b) %{INT:n}")
    assert regex.startswith("(?:")


def test_grok_pattern_definitions_decapture():
    """Bare capture groups in user pattern_definitions bodies must be
    de-captured (ADVICE r8): with a capturing '(foo|bar)' body, every
    LATER field would extract the wrong group."""
    import re

    from bigdatasearchpro_spark.operators.grok import compile_grok

    pat, fields = compile_grok("%{MY:x} %{WORD:y}", {"MY": "(foo|bar)"})
    assert [f for f, _ in fields] == ["x", "y"]
    m = re.match(pat, "foo hello")
    assert m and m.groups() == ("foo", "hello")
    # '(' inside a character class is a literal, not a group — the
    # decapture must NOT rewrite it (that would inject '?:' into the
    # class and change what it matches)
    pat2, _ = compile_grok("%{P:a}=%{WORD:b}", {"P": "[()x]+"})
    m2 = re.match(pat2, "(x(=w")
    assert m2 and m2.groups() == ("(x(", "w")


def test_grok_rejects_nested_set():
    """A bare '[' inside a character class compiles differently on
    Java (class union) vs Python (literal, with a FutureWarning) — the
    PUT-time gate must reject it, warning-free."""
    import warnings

    import pytest as pt

    from bigdatasearchpro_spark.operators.grok import compile_grok

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        with pt.raises(ValueError, match="does not compile"):
            compile_grok("[[ab] %{WORD:w}")


def test_dissect_positional_parse(spark):
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "alpha beta   [x=1] tail end")], "id long, msg string")
    out = apply_pipeline(df, [{
        "dissect": {"field": "msg",
                    "pattern": "%{a->} %{?skip} [%{kv}] %{rest}"},
    }]).first()
    # '->' pad: the repeated spaces after the skipped key collapse
    assert out["a"] == "alpha"
    assert out["kv"] == "x=1"
    assert out["rest"] == "tail end"
    assert "skip" not in out.asDict()


def test_dissect_validation():
    import pytest as pt

    from bigdatasearchpro_spark.operators.grok import compile_dissect

    with pt.raises(ValueError, match="separator between consecutive"):
        compile_dissect("%{a}%{b}")
    with pt.raises(ValueError, match="no %{key}"):
        compile_dissect("plain text")
    with pt.raises(ValueError, match="extracts no named"):
        compile_dissect("%{} - %{?x}")


def test_grok_patterns_list_first_match_wins(spark):
    """The ES grok 'patterns' array: each line parses with the FIRST
    matching pattern; fields defined only by other patterns are NULL."""
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "ERROR disk full"), (2, "GET /x 200"), (3, "???")],
        "id long, msg string",
    )
    out = {r["id"]: r for r in apply_pipeline(df, [{
        "grok": {"field": "msg", "patterns": [
            "%{LOGLEVEL:level} %{GREEDYDATA:text}",
            "%{WORD:verb} %{NOTSPACE:path} %{INT:status:int}",
        ]},
    }]).collect()}
    assert out[1]["level"] == "ERROR" and out[1]["text"] == "disk full"
    assert out[1]["verb"] is None and out[1]["status"] is None
    assert out[2]["verb"] == "GET" and out[2]["status"] == 200
    assert out[2]["level"] is None
    assert out[3]["level"] is None and out[3]["verb"] is None
    # pattern-1 ambiguity guard: a line matching BOTH uses pattern 1
    both = spark.createDataFrame([(9, "WARN something")], "id long, msg string")
    r = apply_pipeline(both, [{
        "grok": {"field": "msg", "patterns": [
            "%{LOGLEVEL:level} %{GREEDYDATA:text}",
            "%{WORD:verb} %{GREEDYDATA:rest}",
        ]},
    }]).first()
    assert r["level"] == "WARN" and r["verb"] is None


def test_grok_composite_combinedapachelog(spark):
    """Bare %{COMBINEDAPACHELOG} expands its named fields, like ES."""
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    line = ('203.0.113.9 - alice [10/Jan/2024:13:55:36 +0000] '
            '"POST /login HTTP/1.1" 302 154 '
            '"http://example.test/ref" "curl/8.0"')
    df = spark.createDataFrame([(1, line)], "id long, msg string")
    r = apply_pipeline(df, [{
        "grok": {"field": "msg", "pattern": "%{COMBINEDAPACHELOG}"},
    }]).first()
    assert r["clientip"] == "203.0.113.9"
    assert r["auth"] == "alice"
    assert r["verb"] == "POST" and r["request"] == "/login"
    assert r["response"] == 302 and r["bytes"] == 154
    assert r["referrer"] == '"http://example.test/ref"'
    assert r["agent"] == '"curl/8.0"'
    # a NAMED composite reference captures the whole match instead
    from bigdatasearchpro_spark.operators.grok import compile_grok

    regex, fields = compile_grok("%{COMMONAPACHELOG:line}")
    assert [f for f, _ in fields] == ["line"]


def test_dissect_append_modifier(spark):
    """%{+key} joins multiple captures in order with append_separator."""
    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, "2024-01-10 13:55:36 UTC rest")], "id long, msg string")
    r = apply_pipeline(df, [{
        "dissect": {"field": "msg",
                    "pattern": "%{ts} %{+ts} %{+ts} %{rest}",
                    "append_separator": " "},
    }]).first()
    assert r["ts"] == "2024-01-10 13:55:36 UTC"
    assert r["rest"] == "rest"
    import pytest as pt

    from bigdatasearchpro_spark.operators.grok import compile_dissect

    with pt.raises(ValueError, match=r"\+.*needs a field"):
        compile_dissect("%{a} %{+}")


def test_stored_pipeline_with_grok_dissect(spark):
    """grok/dissect bodies are pure JSON, so they store and replay
    through PUT _ingest/pipeline + bulk ?pipeline= like any processor."""
    import uuid

    pid = f"grok-pipe-{uuid.uuid4().hex[:6]}"
    idx = f"grok_pipe_idx_{uuid.uuid4().hex[:6]}"
    api.put_ingest_pipeline(spark, pid, [
        {"grok": {"field": "msg",
                  "pattern": "%{LOGLEVEL:level} %{GREEDYDATA:detail}"}},
        {"dissect": {"field": "msg", "pattern": "%{} %{first_word} %{}"}},
    ])
    frame = spark.createDataFrame(
        [(1, "ERROR disk is full"), (2, "INFO all good here")],
        "id long, msg string",
    )
    try:
        api.bulk_data_to_index(spark, frame, idx, id_col="id", pipeline=pid)
        got = {r["id"]: (r["level"], r["detail"], r["first_word"])
               for r in spark.table(idx).select(
                   "id", "level", "detail", "first_word").collect()}
        assert got == {"1": ("ERROR", "disk is full", "disk"),
                       "2": ("INFO", "all good here", "all")}
    finally:
        api.delete_index(spark, idx)
        api.delete_ingest_pipeline(spark, pid)


def test_grok_empty_optional_capture_is_null_not_crash(spark):
    """A typed capture inside an optional/alternation group that does
    not participate extracts as '' — under ANSI a plain cast throws on
    the very first apache 304 line with '-' bytes.  ES grok leaves the
    field unset; typed fields must come back NULL."""
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark.operators.grok import grok_columns

    df = spark.createDataFrame(
        [('1.2.3.4 - frank [10/Oct/2024:13:55:36 -0700] '
          '"GET /a HTTP/1.0" 200 2326',),
         ('1.2.3.4 - frank [10/Oct/2024:13:55:36 -0700] '
          '"GET /b HTTP/1.0" 304 -',)],
        "line string")
    cols = grok_columns(F.col("line"), "%{COMMONAPACHELOG}")
    out = {r["request"]: (r["response"], r["bytes"]) for r in df.select(
        *[c.alias(k) for k, c in cols.items()]).collect()}
    assert out == {"/a": (200, 2326), "/b": (304, None)}


def test_convert_ignore_failure_try_casts(spark):
    """ES convert: strict by default (under ANSI a malformed value
    raises), ignore_failure -> try_cast (malformed becomes NULL
    instead of aborting the distributed job on one bad row)."""
    import pytest as pt

    from bigdatasearchpro_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame([("1",), ("oops",), ("3",)], "v string")
    strict = apply_pipeline(
        df, [{"convert": {"field": "v", "type": "integer"}}])
    with pt.raises(Exception, match="CAST_INVALID_INPUT"):
        strict.collect()
    lax = apply_pipeline(
        df, [{"convert": {"field": "v", "type": "integer",
                          "ignore_failure": True}}])
    assert [r["v"] for r in lax.sort("v").collect()] == [None, 1, 3]

"""``wrapper`` query: the ES escape hatch that carries a
base64-encoded JSON query inside another request (used by tooling
that must smuggle a full DSL query through a string-only slot — SQL
plugins, templated searches).

Decoding happens ONCE driver-side; the inner query then compiles
through the same native paths as a directly-posted query, so the plan
is identical to the unwrapped form (this is also ES's contract: the
wrapper adds no semantics).  The supported inner grammar is the
dispatcher below; unsupported query kinds are refused honestly.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compile_dsl(docs: DataFrame, node: dict) -> DataFrame:
    """Compile a one-clause ES query DSL node to a filtered DataFrame.

    Supported kinds (each delegating to the existing native
    implementation): ``query_string`` (full grammar —
    operators/querystring.py, itself covering AND/OR/NOT, phrases,
    wildcards, field scoping), ``match`` (analyzed OR terms),
    ``term`` / ``terms`` (exact keyword equality), ``range`` (numeric/
    timestamp column bounds; gte/gt/lte/lt), ``match_all``, and
    ``constant_score`` (filter context + a literal boost score).
    """
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError("query node must be a single {kind: body} object")
    kind, body = next(iter(node.items()))

    if kind == "match_all":
        return docs
    if kind == "bool":
        # conjunctive bool: must/filter clauses chain as successive
        # native filters over ONE scan (identical plan to ANDing the
        # predicates); scoring-context should/must_not are refused
        # honestly — the full bool grammar lives in the search DSL
        # (operators/search.py), not the wrapper escape hatch
        unsupported = set(body) - {"must", "filter"}
        if unsupported:
            raise ValueError(
                f"unsupported bool clauses in wrapper query: "
                f"{sorted(unsupported)}")
        out = docs
        for key in ("must", "filter"):
            clauses = body.get(key, [])
            if isinstance(clauses, dict):
                clauses = [clauses]
            for clause in clauses:
                out = compile_dsl(out, clause)
        return out
    if kind == "constant_score":
        # ES constant_score: the inner query runs in FILTER context
        # (no scoring work at all) and every hit gets `boost` as its
        # score — the plan is the bare filter plus one literal column.
        inner = compile_dsl(docs, body["filter"])
        return inner.withColumn(
            "score", F.lit(float(body.get("boost", 1.0)))
        )
    if kind == "query_string":
        from bigdatasearchpro_spark.operators.querystring import (
            query_string_filter,
        )

        return query_string_filter(
            docs,
            body["query"],
            default_field=body.get("default_field"),
            analyzer=body.get("analyzer", "standard"),
        )
    if kind == "match":
        from bigdatasearchpro_spark.operators.search import keyword_match

        (field, spec), = body.items()
        text = spec["query"] if isinstance(spec, dict) else spec
        mode = "all" if (
            isinstance(spec, dict) and spec.get("operator") == "and"
        ) else "any"
        return keyword_match(docs, text, text_col=field, mode=mode)
    if kind == "term":
        (field, spec), = body.items()
        value = spec["value"] if isinstance(spec, dict) else spec
        return docs.filter(F.col(field) == F.lit(value))
    if kind == "terms":
        (field, values), = body.items()
        return docs.filter(F.col(field).isin(list(values)))
    if kind == "range":
        (field, bounds), = body.items()
        pred = F.lit(True)
        ops = {"gte": "__ge__", "gt": "__gt__", "lte": "__le__", "lt": "__lt__"}
        for op, val in bounds.items():
            if op not in ops:
                raise ValueError(f"unsupported range bound {op!r}")
            pred = pred & getattr(F.col(field), ops[op])(F.lit(val))
        return docs.filter(pred)
    raise ValueError(f"unsupported wrapper inner query kind: {kind!r}")


def wrapper_query(docs: DataFrame, encoded: str) -> DataFrame:
    """ES ``wrapper`` query: base64(JSON) decoded driver-side, inner
    query dispatched through :func:`compile_dsl` — the resulting plan
    is byte-identical to posting the inner query directly."""
    try:
        raw = base64.b64decode(encoded, validate=True)
        node = json.loads(raw)
    except Exception as e:  # noqa: BLE001 - surface one honest error
        raise ValueError(f"wrapper query payload is not base64(JSON): {e}")
    return compile_dsl(docs, node)


_MUSTACHE_RE = __import__("re").compile(r"\{\{(\w+)\}\}")


def render_template(source: str, params: "dict | None" = None) -> dict:
    """ES search template (``_search/template``): the mustache-subset
    ``{{var}}`` substitution into a JSON *source string* (substitution
    happens BEFORE JSON parsing, so numeric params can land unquoted —
    the ES semantics), then parsed to the inner query node.  Missing
    parameters fail like ES's template render error."""
    p = params or {}

    def sub(m):
        k = m.group(1)
        if k not in p:
            raise ValueError(f"missing template param {k!r}")
        return str(p[k])

    rendered = _MUSTACHE_RE.sub(sub, source)
    try:
        return json.loads(rendered)
    except ValueError as e:
        raise ValueError(f"rendered template is not valid JSON: {e}")


def search_template(docs: DataFrame, source: str,
                    params: "dict | None" = None) -> DataFrame:
    """ES ``_search/template``: render driver-side, then dispatch the
    inner query through :func:`compile_dsl` — the plan is identical to
    posting the rendered query directly."""
    return compile_dsl(docs, render_template(source, params))

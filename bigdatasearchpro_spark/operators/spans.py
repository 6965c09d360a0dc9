"""Span queries — the legacy ES positional-query algebra
(``span_term`` / ``span_or`` / ``span_first`` / ``span_near`` /
``span_not``), the pre-``intervals`` proximity surface the 6.x
endpoint the reference delegates to still serves.

Each spec node evaluates to an ARRAY of matching spans
``struct<s, e[, g]>`` (token positions, inclusive; ``g`` = cumulative
gap budget used inside a ``span_near`` chain) built from per-term
position arrays — pure nested array expressions inside the scan's
whole-stage-codegen span: no explode, no join, no shuffle, the same
plan shape as the ``intervals`` compiler (search.py
intervals_match_expr).  A document matches when its span array is
non-empty.

Supported subset (unsupported shapes raise honestly):

- ``{"span_term": "t"}`` (or ``{"span_term": {"term": "t"}}``)
- ``{"span_or":   {"clauses": [spec, ...]}}``
- ``{"span_first": {"match": spec, "end": N}}`` — span ends before
  position ``N`` (ES counts from the start of the field)
- ``{"span_near": {"clauses": [...], "slop": N, "in_order": true}}`` —
  ordered chain, CUMULATIVE gap across all clauses <= slop (the ES
  slop budget); ``in_order: false`` is supported for exactly two
  clauses (either order, same gap rule)
- ``{"span_containing"/"span_within": {"little": spec, "big": spec}}``
  — the big spans that contain a little span / the little spans lying
  inside a big span (doc-level match sets coincide; the SPAN sets —
  what scoring and nested algebra see — differ)
- ``{"span_not": {"include": spec, "exclude": spec}}`` — include
  spans that OVERLAP no exclude span (ES default dist semantics)
- ``{"span_multi": {"match": {"prefix"|"wildcard": {"value": v}}}}``
  — the multi-term wrapper: spans of EVERY token position matching
  the term-level pattern (ES rewrites the multi-term query to a
  position-carrying disjunction; here the disjunction stays implicit
  as one per-token predicate — same array shape, no vocabulary
  expansion).  Term-level semantics: the value is NOT analyzed
  (callers supply the already-folded form, like ES).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators.search import (
    TextCols,
    analyze_query,
    tokens_expr,
    wildcard_to_like,
)


def _spans_matching(toks: Column, pred) -> Column:
    """Positions whose token satisfies ``pred`` as ``struct<s, e, g>``
    spans (g=0) — the shared one-token span constructor behind
    ``span_term`` (equality) and ``span_multi`` (pattern match)."""
    pos = F.filter(
        F.transform(
            toks, lambda t, i: F.when(pred(t), i).otherwise(-1)
        ),
        lambda x: x >= 0,
    )
    return F.transform(
        pos,
        lambda p: F.struct(
            p.alias("s"), p.alias("e"), F.lit(0).alias("g")
        ),
    )


def _spans_of_term(toks: Column, term: str) -> Column:
    """Positions of ``term`` as ``struct<s, e, g>`` spans (g=0)."""
    return _spans_matching(toks, lambda t: t == F.lit(term))


def _near_step(acc: Column, nxt: Column, slop: int, *,
               ordered: bool) -> Column:
    """All extensions of ``acc`` chains by one ``nxt`` span under the
    cumulative-gap budget. Ordered: nxt strictly after acc."""

    def extend(a: Column) -> Column:
        def ok(b: Column) -> Column:
            gap = b["s"] - a["e"] - F.lit(1)
            fits = (b["s"] > a["e"]) & (a["g"] + gap <= F.lit(slop))
            if ordered:
                return fits
            rgap = a["s"] - b["e"] - F.lit(1)
            rfits = (a["s"] > b["e"]) & (a["g"] + rgap <= F.lit(slop))
            return fits | rfits

        def join(b: Column) -> Column:
            gap = F.when(
                b["s"] > a["e"], b["s"] - a["e"] - F.lit(1)
            ).otherwise(a["s"] - b["e"] - F.lit(1))
            return F.struct(
                F.least(a["s"], b["s"]).alias("s"),
                F.greatest(a["e"], b["e"]).alias("e"),
                (a["g"] + gap).alias("g"),
            )

        return F.transform(F.filter(nxt, ok), join)

    return F.flatten(F.transform(acc, extend))


def span_spec_expr(
    text_col,
    spec,
    *,
    analyzer: str = "standard",
) -> Column:
    """Compile a span spec to its matching-span array expression."""
    toks = tokens_expr(text_col, analyzer)

    def build(node) -> Column:
        if not isinstance(node, dict) or len(node) != 1:
            raise ValueError(f"bad span node: {node!r}")
        kind, body = next(iter(node.items()))
        if kind == "span_term":
            raw = body["term"] if isinstance(body, dict) else body
            terms = analyze_query(str(raw), analyzer)
            if len(terms) != 1:
                raise ValueError(
                    f"span_term must analyze to one token: {raw!r}"
                )
            return _spans_of_term(toks, terms[0])
        if kind == "span_or":
            subs = [build(n) for n in body["clauses"]]
            if not subs:
                raise ValueError("span_or needs at least one clause")
            out = subs[0]
            for s in subs[1:]:
                out = F.concat(out, s)
            return out
        if kind == "span_first":
            end = int(body["end"])
            if end <= 0:
                raise ValueError("span_first end must be positive")
            return F.filter(build(body["match"]),
                            lambda x: x["e"] < F.lit(end))
        if kind == "span_near":
            clauses = [build(n) for n in body["clauses"]]
            if len(clauses) < 2:
                raise ValueError("span_near needs >= 2 clauses")
            slop = int(body.get("slop", 0))
            if slop < 0:
                raise ValueError("slop must be >= 0")
            ordered = bool(body.get("in_order", True))
            if not ordered and len(clauses) != 2:
                raise ValueError(
                    "unordered span_near supported for exactly 2 clauses"
                )
            acc = clauses[0]
            for nxt in clauses[1:]:
                acc = _near_step(acc, nxt, slop, ordered=ordered)
            return acc
        if kind == "span_not":
            incl = build(body["include"])
            excl = build(body["exclude"])
            return F.filter(
                incl,
                lambda a: ~F.exists(
                    excl,
                    lambda x: (x["s"] <= a["e"]) & (x["e"] >= a["s"]),
                ),
            )
        if kind in ("span_containing", "span_within"):
            if not isinstance(body, dict) or not {"little", "big"} <= set(body):
                raise ValueError(f"{kind} needs 'little' and 'big' specs")
            little = build(body["little"])
            big = build(body["big"])
            covers = lambda b, l: (b["s"] <= l["s"]) & (l["e"] <= b["e"])  # noqa: E731
            if kind == "span_containing":
                # big spans that contain at least one little span
                return F.filter(
                    big,
                    lambda b: F.exists(little, lambda l: covers(b, l)),
                )
            # little spans lying within at least one big span
            return F.filter(
                little,
                lambda l: F.exists(big, lambda b: covers(b, l)),
            )
        if kind == "span_multi":
            match = body.get("match") if isinstance(body, dict) else body
            if not isinstance(match, dict) or len(match) != 1:
                raise ValueError(f"span_multi needs one match clause: {body!r}")
            mkind, mbody = next(iter(match.items()))
            val = mbody["value"] if isinstance(mbody, dict) else mbody
            val = str(val)
            if mkind == "prefix":
                pred = lambda t: t.startswith(F.lit(val))  # noqa: E731
            elif mkind == "wildcard":
                like = wildcard_to_like(val)
                pred = lambda t: t.like(like)  # noqa: E731
            else:
                raise ValueError(
                    f"span_multi supports prefix/wildcard, got {mkind!r}"
                )
            return _spans_matching(toks, pred)
        raise ValueError(f"unsupported span query kind: {kind!r}")

    return build(spec)


def span_query(
    docs: DataFrame,
    spec,
    *,
    id_col: str = "doc_id",
    text_col: TextCols = "text",
    analyzer: str = "standard",
) -> DataFrame:
    """ES span query: documents with at least one matching span.  ONE
    narrow boolean predicate over the scan (the span algebra runs as
    nested array expressions; nothing leaves the row)."""
    spans = span_spec_expr(text_col, spec, analyzer=analyzer)
    return docs.filter(F.size(spans) > 0).select(id_col).orderBy(id_col)

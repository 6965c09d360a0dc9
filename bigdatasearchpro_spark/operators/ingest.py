"""Ingest pipelines: the ES ``_ingest/pipeline`` processor chain —
per-document transformations applied at INDEX time (``PUT
_ingest/pipeline/{id}`` + ``?pipeline=`` on bulk), the ETL layer the
reference hand-rolled in Java (BulkProcessImpl.java:110-117 is
literally a one-processor pipeline: stringify every field).

Each processor compiles to a DataFrame transformation — column
expressions inside the scan's codegen span, or one broadcast lookup
join for ``enrich`` — so a pipeline of k processors adds ZERO extra
passes over the data: Catalyst collapses the chain into the write
projection.

Supported processors (the public ES processor shapes; unsupported
types raise at PUT time, like ES's processor validation):

- ``{"set":       {"field": f, "value": v}}``          — literal set
- ``{"rename":    {"field": f, "target_field": g}}``
- ``{"remove":    {"field": f}}``
- ``{"lowercase"| "uppercase" | "trim": {"field": f}}``
- ``{"convert":   {"field": f, "type": "integer|long|double|string",
                   "ignore_failure": bool}}``          — strict cast by
  default (ANSI: malformed input raises); ``ignore_failure`` maps to
  ``try_cast`` (malformed -> NULL, the ES ignore_failure semantics)
- ``{"gsub":      {"field": f, "pattern": p, "replacement": r}}``
- ``{"split":     {"field": f, "separator": regex}}``
- ``{"script":    {"source": painless-subset, "params": ...,
                   "target_field": g}}``               — the compiled
  arithmetic DSL (operators/scripting.py)
- ``{"enrich":    {"lookup": DataFrame, "match_field": f,
                   "target_fields": [...]}}``          — broadcast
  lookup join (the ES enrich processor's index-backed join)
- ``{"grok":      {"field": f, "pattern": "%{IP:ip} ...",
                   "pattern_definitions": {...}}}``    — compiled
  grok (operators/grok.py): one combined regex, typed extractions
- ``{"dissect":   {"field": f, "pattern": "%{a} %{b} [%{c}]"}}`` —
  positional split, no user regex
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIMPLE = ("lowercase", "uppercase", "trim", "remove")


def validate_pipeline(processors: "list[dict]") -> None:
    """PUT-time validation (ES rejects unknown processor types and
    malformed bodies at PUT, not at ingest)."""
    if not processors:
        raise ValueError("pipeline needs at least one processor")
    for p in processors:
        if not isinstance(p, dict) or len(p) != 1:
            raise ValueError(f"bad processor node: {p!r}")
        kind, body = next(iter(p.items()))
        if kind in _SIMPLE:
            if "field" not in body:
                raise ValueError(f"{kind} needs a field")
        elif kind == "set":
            if "field" not in body or "value" not in body:
                raise ValueError("set needs field and value")
        elif kind == "rename":
            if "field" not in body or "target_field" not in body:
                raise ValueError("rename needs field and target_field")
        elif kind == "convert":
            if body.get("type") not in ("integer", "long", "double", "string"):
                raise ValueError(f"convert type {body.get('type')!r}")
        elif kind == "gsub":
            if not all(k in body for k in ("field", "pattern", "replacement")):
                raise ValueError("gsub needs field, pattern, replacement")
        elif kind == "split":
            if "field" not in body or "separator" not in body:
                raise ValueError("split needs field and separator")
        elif kind == "script":
            from bigdatasearchpro_spark.operators.scripting import Script

            if "target_field" not in body:
                raise ValueError("script processor needs target_field")
            Script(body["source"], body.get("params"), strict=False)
        elif kind == "enrich":
            if "lookup" not in body and "index" not in body:
                raise ValueError("enrich needs a lookup frame or an index")
            if not all(k in body for k in ("match_field", "target_fields")):
                raise ValueError(
                    "enrich needs match_field and target_fields"
                )
        elif kind == "json":
            if "field" not in body:
                raise ValueError("json needs a field")
        elif kind == "date":
            if "field" not in body or "formats" not in body:
                raise ValueError("date needs field and formats")
            if not body["formats"]:
                raise ValueError("date needs at least one format")
        elif kind == "kv":
            if not all(k in body for k in ("field", "field_split", "value_split")):
                raise ValueError("kv needs field, field_split, value_split")
        elif kind == "urldecode":
            if "field" not in body:
                raise ValueError("urldecode needs a field")
        elif kind == "append":
            if "field" not in body or "value" not in body:
                raise ValueError("append needs field and value")
        elif kind == "fingerprint":
            if not body.get("fields") or "target_field" not in body:
                raise ValueError("fingerprint needs fields and target_field")
        elif kind == "grok":
            from bigdatasearchpro_spark.operators.grok import compile_grok

            pats = body.get("patterns") or body.get("pattern")
            if "field" not in body or not pats:
                raise ValueError("grok needs field and pattern(s)")
            for pat in [pats] if isinstance(pats, str) else pats:
                compile_grok(pat, body.get("pattern_definitions"))
        elif kind == "dissect":
            from bigdatasearchpro_spark.operators.grok import (
                compile_dissect,
            )

            if "field" not in body or "pattern" not in body:
                raise ValueError("dissect needs field and pattern")
            compile_dissect(body["pattern"])
        elif kind == "inference":
            if body.get("model_id") not in INFERENCE_MODELS:
                raise ValueError(
                    f"unknown model_id {body.get('model_id')!r}; "
                    f"deployed: {sorted(INFERENCE_MODELS)}"
                )
            if "target_field" not in body:
                raise ValueError("inference needs target_field")
        else:
            raise ValueError(f"unknown processor type {kind!r}")


def apply_pipeline(df: DataFrame, processors: "list[dict]") -> DataFrame:
    """Run the processor chain over a DataFrame — the ingest moment.
    Column processors fold into one projection; ``enrich`` adds one
    broadcast join per use."""
    validate_pipeline(processors)
    for p in processors:
        kind, body = next(iter(p.items()))
        if kind == "set":
            df = df.withColumn(body["field"], F.lit(body["value"]))
        elif kind == "rename":
            df = df.withColumnRenamed(body["field"], body["target_field"])
        elif kind == "remove":
            df = df.drop(body["field"])
        elif kind == "lowercase":
            df = df.withColumn(body["field"], F.lower(F.col(body["field"])))
        elif kind == "uppercase":
            df = df.withColumn(body["field"], F.upper(F.col(body["field"])))
        elif kind == "trim":
            df = df.withColumn(body["field"], F.trim(F.col(body["field"])))
        elif kind == "convert":
            t = {"integer": "int", "long": "bigint",
                 "double": "double", "string": "string"}[body["type"]]
            c = F.col(body["field"])
            # ES convert fails the DOCUMENT on malformed input unless
            # ignore_failure — under ANSI a plain cast instead aborts
            # the whole distributed job on the first bad row, so
            # ignore_failure maps to try_cast (malformed -> NULL);
            # the default stays strict, like ES
            df = df.withColumn(
                body["field"],
                c.try_cast(t) if body.get("ignore_failure") else c.cast(t),
            )
        elif kind == "gsub":
            df = df.withColumn(
                body["field"],
                F.regexp_replace(F.col(body["field"]), body["pattern"],
                                 body["replacement"]),
            )
        elif kind == "split":
            df = df.withColumn(
                body["field"],
                F.split(F.col(body["field"]), body["separator"]),
            )
        elif kind == "script":
            from bigdatasearchpro_spark.operators.scripting import Script

            col = Script(body["source"], body.get("params")).column()
            df = df.withColumn(body["target_field"], col)
        elif kind == "enrich":
            if "lookup" in body:
                lookup: DataFrame = body["lookup"]
            else:
                # the ES enrich policy references an INDEX — resolve at
                # ingest time so the stored pipeline stays pure JSON
                lookup = df.sparkSession.table(body["index"])
            match = body["match_field"]
            targets = list(body["target_fields"])
            side = lookup.select(match, *targets)
            df = df.join(F.broadcast(side), match, "left")
        elif kind == "json":
            # ES json processor: parse a JSON-string field into a
            # structured object.  Spark's from_json wants a schema up
            # front; an explicit DDL string in the body wins (the
            # typed-pipeline form), else the schema is INFERRED at
            # apply time from the field's first non-null value — the
            # dynamic-mapping behavior the reference leans on
            # (SURVEY.md §1.2), resolved once driver-side like the
            # enrich processor resolves its index.
            fld = body["field"]
            tgt = body.get("target_field", fld)
            if "schema" in body:
                sch = body["schema"]
            else:
                sample = (
                    df.select(fld).filter(F.col(fld).isNotNull()).first()
                )
                if sample is None:
                    raise ValueError(f"json: no non-null {fld!r} to infer from")
                sch = df.sparkSession.range(1).select(
                    F.schema_of_json(F.lit(sample[0]))
                ).first()[0]
            df = df.withColumn(tgt, F.from_json(F.col(fld), sch))
        elif kind == "date":
            # ES date processor: parse a string field into a timestamp,
            # trying each format in order (first that parses wins —
            # try_to_timestamp returns NULL on mismatch, coalesce walks
            # the format list), default target @timestamp like ES.
            fld = body["field"]
            tgt = body.get("target_field", "@timestamp")
            parsed = F.coalesce(
                *[
                    F.try_to_timestamp(F.col(fld), F.lit(fmt))
                    for fmt in body["formats"]
                ]
            )
            df = df.withColumn(tgt, parsed)
        elif kind == "kv":
            # ES kv processor: 'a=1&b=2' -> map (str_to_map, JVM-side)
            df = df.withColumn(
                body.get("target_field", body["field"]),
                F.str_to_map(
                    F.col(body["field"]),
                    F.lit(body["field_split"]),
                    F.lit(body["value_split"]),
                ),
            )
        elif kind == "urldecode":
            df = df.withColumn(
                body.get("target_field", body["field"]),
                F.url_decode(F.col(body["field"])),
            )
        elif kind == "append":
            # ES append processor semantics: a missing field is
            # CREATED as [value]; a scalar field is coerced to an
            # array first; a NULL field behaves like missing (fresh
            # array) rather than poisoning the concat to NULL.
            fld = body["field"]
            add = F.array(F.lit(body["value"]))
            if fld not in df.columns:
                df = df.withColumn(fld, add)
            else:
                from pyspark.sql.types import ArrayType

                base = (
                    F.col(fld)
                    if isinstance(df.schema[fld].dataType, ArrayType)
                    else F.array(F.col(fld))
                )
                df = df.withColumn(
                    fld,
                    F.when(F.col(fld).isNull(), add)
                    .otherwise(F.concat(base, add)),
                )
        elif kind == "fingerprint":
            # ES fingerprint processor: stable hash of selected fields
            # — the dedup key.  Field NAMES are part of the hash input
            # and NULLs map to a sentinel (concat_ws silently skips
            # NULLs, so {a:1,b:NULL} and {a:NULL,b:1} would otherwise
            # collide — ES encodes missing/NULL fields distinctly).
            parts = [
                F.concat_ws(
                    "=",
                    F.lit(c),
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00")),
                )
                for c in body["fields"]
            ]
            df = df.withColumn(
                body["target_field"], F.md5(F.concat_ws("|", *parts))
            )
        elif kind == "grok":
            # compiled ONCE at apply; k typed regexp_extract columns in
            # one projection (operators/grok.py — RE2-safe, JVM-side);
            # a "patterns" list is tried first-match-wins like ES
            from bigdatasearchpro_spark.operators.grok import grok_columns

            cols = grok_columns(
                F.col(body["field"]),
                body.get("patterns") or body["pattern"],
                body.get("pattern_definitions"),
            )
            df = df.withColumns(cols)
        elif kind == "dissect":
            from bigdatasearchpro_spark.operators.grok import (
                dissect_columns,
            )

            df = df.withColumns(
                dissect_columns(
                    F.col(body["field"]), body["pattern"],
                    body.get("append_separator", ""),
                )
            )
        elif kind == "inference":
            df = INFERENCE_MODELS[body["model_id"]](
                df, body.get("field", "text"), body["target_field"]
            )
    return df


def _infer_quality_logit(df: DataFrame, field: str, target: str) -> DataFrame:
    from bigdatasearchpro_spark.operators.textstats import (
        quality_logit_attach,
    )

    return quality_logit_attach(df, text_col=field, out_col=target)


# ES ``inference`` processor model registry: the models DEPLOYED with
# this engine.  quality-logit-v1 is the real integer-exact linear
# quality classifier (textstats.quality_logit_attach) — scoring
# happens AT INGEST as a pure projection (no join, no shuffle, no
# Python), exactly how the ES inference processor runs a deployed
# model inside the ingest node.  External learned models (fastText,
# transformers) would slot in here as Arrow pandas_udf entries; none
# ship in this container, and unknown ids are rejected at PUT time
# like ES's model-not-deployed error.
INFERENCE_MODELS = {
    "quality-logit-v1": _infer_quality_logit,
}

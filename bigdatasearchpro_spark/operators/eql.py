"""EQL — the ES Event Query Language (``_eql/search``): ordered
event-sequence detection over a timestamped stream, the
security-analytics surface (``sequence by user [login] [download]
within 10m``).

Spark-first shape: each sequence STEP is a pushed filter over the
events scan; consecutive steps join on the ``by`` entity key with a
banded time predicate (ts strictly increasing, total span bounded by
``within``) — the range-join shape (J3), never a cartesian.  The
standard EQL match semantics implemented here is HEAD matching: for
each entity, each step-1 event pairs with the EARLIEST qualifying
step-2 event after it, and so on — deterministic (min-ts, then min
event id) and SQL-replayable, which is also how EQL's own engine
resolves ambiguity (first-come matching).

Supported: 2..k step sequences with per-step equality/range predicate
dicts, ``by`` key, ``within`` seconds.  ``maxspan`` == ``within``.

Round-8 extensions (the r7-verdict gap #4 — real detection rules use
these):

- ``until=<spec>``: ``sequence ... until [expiry]`` — an until event
  for the same entity EXPIRES in-flight sequences, so a chain only
  matches when no until event falls strictly between its first and
  last step (one banded ANTI-join on the entity key; because a full
  chain visits every intermediate gap, killing any partial == killing
  the completed chain).
- missing-event steps: a step written ``{"not": {...}}`` (EQL's
  ``![ ... ]``) asserts NO matching event occurs between its two
  surrounding positive steps (one banded anti-join per negation).
  Supported in INTERIOR positions only — a leading/trailing ``![...]``
  would need the open-ended maxspan window and is rejected loudly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _step_pred(spec: dict) -> Column:
    """An EQL step body: ``{field: value}`` equalities and
    ``{field: {"gte"/"gt"/"lte"/"lt": v}}`` ranges, conjoined."""
    pred = F.lit(True)
    for field, v in sorted(spec.items()):
        if isinstance(v, dict):
            ops = {"gte": "__ge__", "gt": "__gt__",
                   "lte": "__le__", "lt": "__lt__"}
            for op, val in sorted(v.items()):
                if op not in ops:
                    raise ValueError(f"unsupported range op {op!r}")
                pred = pred & getattr(F.col(field), ops[op])(F.lit(val))
        else:
            pred = pred & (F.col(field) == F.lit(v))
    return pred


def eql_sequence(
    events: DataFrame,
    steps: "list[dict]",
    *,
    by: str,
    within_seconds: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
    until: "dict | None" = None,
) -> DataFrame:
    """``sequence by <by> [step1] [step2] ... within Ns``: for each
    entity, chains of one event per step with strictly increasing
    timestamps whose TOTAL span fits ``within_seconds``, matched
    head-first (each partial chain extends with the EARLIEST
    qualifying next event — ties broken by event id).

    Returns one row per matched sequence:
    ``(<by>, ts_1, id_1, ..., ts_k, id_k)`` ordered by entity, ts_1,
    id_1.

    Plan: k filtered projections of the SAME scan; each chain
    extension is an entity-key equi-join with a banded time predicate
    plus one per-chain min-struct aggregate (the head-matching rule) —
    shuffle keys are the entity, never a cross product.
    """
    if within_seconds <= 0:
        raise ValueError("within_seconds must be positive")

    # split positive steps from missing-event ({"not": spec}) steps;
    # each negation binds to the GAP between its neighbouring positive
    # steps (gap g = between positive step g and g+1)
    positive: list[dict] = []
    negations: list[tuple[int, dict]] = []
    for s in steps:
        if set(s) == {"not"}:
            if not positive:
                raise ValueError(
                    "missing-event steps must sit between two positive "
                    "steps (leading ![...] unsupported)")
            negations.append((len(positive), s["not"]))
        else:
            positive.append(s)
    if len(positive) < 2:
        raise ValueError("a sequence needs at least 2 positive steps")
    if negations and negations[-1][0] >= len(positive):
        raise ValueError(
            "missing-event steps must sit between two positive steps "
            "(trailing ![...] unsupported)")

    legs = [
        events.filter(_step_pred(s)).select(
            F.col(by).alias("__by"),
            F.col(ts_col).alias(f"ts_{i + 1}"),
            F.col(id_col).alias(f"id_{i + 1}"),
        )
        for i, s in enumerate(positive)
    ]
    chain = legs[0]
    for i in range(1, len(legs)):
        nxt = legs[i]
        prev_ts, prev_id = f"ts_{i}", f"id_{i}"
        cur_ts, cur_id = f"ts_{i + 1}", f"id_{i + 1}"
        cond = (
            (chain["__by"] == nxt["__by"])
            & (nxt[cur_ts] > chain[prev_ts])
            & (
                # TIMESTAMP_NTZ has no long cast in Spark 4 — epoch
                # math goes through to_unix_timestamp
                F.to_unix_timestamp(nxt[cur_ts])
                - F.to_unix_timestamp(chain["ts_1"])
                <= F.lit(within_seconds)
            )
        )
        joined = chain.join(nxt, cond).drop(nxt["__by"])
        # head matching: each partial chain keeps its EARLIEST
        # qualifying extension (min (ts, id) struct — one aggregate,
        # deterministic under same-ts ties)
        key_cols = ["__by"] + [
            c for j in range(1, i + 1) for c in (f"ts_{j}", f"id_{j}")
        ]
        chain = (
            joined.groupBy(*[F.col(c) for c in key_cols])
            .agg(F.min(F.struct(F.col(cur_ts), F.col(cur_id))).alias("__m"))
            .select(
                *key_cols,
                F.col(f"__m.{cur_ts}").alias(cur_ts),
                F.col(f"__m.{cur_id}").alias(cur_id),
            )
        )
    # missing-event steps: NO matching event strictly inside the gap's
    # time band — one entity-keyed banded anti-join per negation
    def _banded_anti(ch: DataFrame, spec: dict, lo: str, hi: str
                     ) -> DataFrame:
        neg = events.filter(_step_pred(spec)).select(
            F.col(by).alias("__nby"), F.col(ts_col).alias("__nts"))
        cond = (
            (ch["__by"] == neg["__nby"])
            & (neg["__nts"] > ch[lo])
            & (neg["__nts"] < ch[hi])
        )
        return ch.join(neg, cond, "left_anti")

    for gap, spec in negations:
        chain = _banded_anti(chain, spec, f"ts_{gap}", f"ts_{gap + 1}")

    # until: an expiry event kills in-flight sequences — a completed
    # chain survives only if no until event falls strictly inside its
    # total span
    if until is not None:
        chain = _banded_anti(chain, until, "ts_1", f"ts_{len(legs)}")

    out_cols = [F.col("__by").alias(by)] + [
        F.col(c)
        for i in range(1, len(legs) + 1)
        for c in (f"ts_{i}", f"id_{i}")
    ]
    return chain.select(*out_cols).orderBy(by, "ts_1", "id_1")

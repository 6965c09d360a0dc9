"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Semantics (backward as-of, the market-data/feature-store standard):
for each left row, attach the right row with the greatest
``right.ts <= left.ts`` within the same key group; optionally bounded
by a ``tolerance`` (matches older than ``left.ts - tolerance`` are
discarded). DuckDB's native ``ASOF JOIN`` is the oracle.

Scale design — why not a join: the naive form is a non-equi theta join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row argmax), which Spark
plans as a broadcast-nested-loop + window — O(|L|·|R|) comparisons per
key. This implementation is the *union-merge* form instead: tag both
sides, hash-shuffle ONCE on the key, sort each partition by (ts, side),
and carry the latest right payload forward with a running
``last(ignorenulls)`` window. Cost is one shuffle + one sort of
|L|+|R| rows — the same shape as a sort-merge join, with no pair
blow-up, no skew amplification beyond the key's own row count, and it
inherits AQE/salting remedies unchanged.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"  # right=0 sorts before left=1 at equal ts (>= matches)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    ts_col: str = "ts",
    right_cols: Mapping[str, str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join (left join flavor: unmatched left rows keep
    nulls in the attached columns).

    ``right_cols`` maps output name -> right column; the right match's
    timestamp is always attached as ``matched_ts``. Output = all left
    columns + ``matched_ts`` + the mapped columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    out_names = list(right_cols.keys())

    l_tag = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c not in keys and c != ts_col],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("matched_ts"),
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(out)
            for out, src in right_cols.items()
        ],
    )
    # NULL right timestamps can't be "matches at or before" anything —
    # unfiltered they sort first and leak a (NULL ts, value) phantom pair
    right = right.filter(F.col(ts_col).isNotNull())
    r_tag = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        *[
            F.lit(None).cast(l_tag.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys and c != ts_col
        ],
        F.col(ts_col).alias("matched_ts"),
        *[F.col(src).alias(out) for out, src in right_cols.items()],
    )

    # Tie-break: two right rows sharing (key, ts) would otherwise hand
    # last(ignorenulls) a partition-order-dependent winner. Ordering the
    # peers by their payload struct makes the greatest payload win
    # deterministically on every run and partitioning.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc(),
            F.col(_SIDE).asc(),
            F.struct(*[F.col(o) for o in out_names]).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The match travels as ONE struct (ts + payload) filled from right
    # rows only: independent last(ignorenulls) per column would pair the
    # newest timestamp with an older row's value whenever the newest
    # right row carries a NULL payload — the (ts, value) pair must
    # co-occur in a real right row.
    match_struct = F.when(
        F.col(_SIDE) == 0,
        F.struct(F.col("matched_ts"), *[F.col(o) for o in out_names]),
    )
    filled = l_tag.unionByName(r_tag).select(
        "*", F.last(match_struct, ignorenulls=True).over(w).alias("__m")
    )
    out = (
        filled.filter(F.col(_SIDE) == 1)
        .drop(_SIDE, "matched_ts", *out_names)
        .select(
            "*",
            F.col("__m.matched_ts").alias("matched_ts"),
            *[F.col(f"__m.{o}").alias(o) for o in out_names],
        )
        .drop("__m")
    )

    if tolerance_seconds is not None:
        stale = (
            F.col("matched_ts").isNull()
            | (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(F.col("matched_ts").cast("timestamp"))
                > int(tolerance_seconds * 1_000_000)
            )
        )
        out = out.select(
            *[c for c in out.columns if c != "matched_ts" and c not in out_names],
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in ["matched_ts", *out_names]
            ],
        )
    return out


def resample_ffill(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular event series: one row per ``key`` per
    ``step`` grid point between that key's first and last event, with
    the last-observed value carried forward (as-of semantics).

    Grid generation is per-key from a per-key bounds aggregation
    (``sequence(min, max, step)`` + explode) — no driver-side range, no
    cross join; the grid size is data-determined per key. The fill is
    the union-merge as-of join (one shuffle on the key).
    """
    unit = step.split()[-1].rstrip("s")  # '1 hour' -> 'hour', '5 minutes' -> 'minute'
    bounds = events.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.max(ts_col).alias("__hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    return asof_join(
        grid,
        events.select(key_col, ts_col, value_col),
        on=key_col,
        ts_col=ts_col,
        right_cols={"filled_value": value_col},
    ).select(key_col, ts_col, "matched_ts", "filled_value")


def resample_interpolate(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular series with LINEAR interpolation: one row
    per key per ``step`` grid point, valued by interpolating between the
    nearest observation at-or-before and the nearest at-or-after the
    grid point (ends clamp to the nearest single observation).

    Two union-merge as-of passes over the same keyed shuffle shape: the
    backward pass is :func:`asof_join` verbatim; the forward pass is
    the SAME operator on negated epoch-microsecond timestamps (nearest
    following == most recent prior under negation) — no theta join, no
    pair blow-up, O(|grid|+|events|) per key.
    """
    unit = step.split()[-1].rstrip("s")
    bounds = events.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.max(ts_col).alias("__hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))).alias(ts_col),
    )
    obs = events.select(key_col, ts_col, value_col)

    back = asof_join(
        grid, obs, on=key_col, ts_col=ts_col, right_cols={"__pv": value_col}
    ).withColumnRenamed("matched_ts", "__pt")

    neg = lambda df: df.withColumn(  # noqa: E731
        ts_col, -F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    fwd = (
        asof_join(
            neg(grid.select(key_col, ts_col, F.col(ts_col).alias("__gts"))),
            neg(obs),
            on=key_col,
            ts_col=ts_col,
            right_cols={"__nv": value_col},
        )
        .select(
            key_col,
            F.col("__gts").alias(ts_col),
            (-F.col("matched_ts")).alias("__nt_us"),
            "__nv",
        )
    )

    j = back.join(fwd, [key_col, ts_col])
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pt_us = F.unix_micros(F.col("__pt").cast("timestamp"))
    nt_us = F.col("__nt_us")
    interp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
        (t_us - pt_us).cast("double") / (nt_us - pt_us).cast("double")
    )
    value = (
        F.when(F.col("__pt").isNull(), F.col("__nv"))
        .when(nt_us.isNull(), F.col("__pv"))
        .when(nt_us == pt_us, F.col("__pv"))
        .otherwise(interp)
    )
    return j.select(
        key_col,
        ts_col,
        F.round(value, 2).alias("interp_value"),
    )

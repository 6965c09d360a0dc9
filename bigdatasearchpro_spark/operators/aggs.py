"""ES-style search aggregations — the ``aggs`` block of ``_search``.

The reference delegates its whole query surface to Elasticsearch 6.x
(``indexView.html:13-19`` posts the form straight to ``_search``); the
public ES search request carries an ``aggs`` block alongside ``query``,
and every Kibana panel the reference's README describes
(``README.md:803-806`` reconciles counts in Kibana) is one of these
aggregations over the matched set. This module is that surface on
Spark: each function takes the (already query-filtered) DataFrame and
returns the bucket/metric rows ES would return.

Coverage (public ES 6.x aggregation names):

- ``terms_agg``            — terms bucket agg (+ sub-metrics)
- ``date_histogram_agg``   — calendar-interval buckets over a timestamp
- ``histogram_agg``        — fixed-interval numeric buckets
- ``range_agg``            — explicit [from, to) buckets
- ``date_range_agg``       — [from, to) buckets with date-math bounds
- ``filters_agg``          — named-predicate buckets
- ``stats_agg`` / ``extended_stats_agg`` — single-row metric aggs
- ``percentiles_agg``      — exact interpolated percentiles (ES uses
  t-digest; the mergeable-sketch ring ``a9_kll_quantiles`` is this
  engine's approximate 100 TB path, so the facade offers the exact form)
- ``terms_top_hits``       — terms buckets each carrying a top_hits page
- ``significant_terms_agg``— foreground-vs-background term lift (JLH)
- ``composite_agg``        — multi-source buckets with after-key paging
- ``adjacency_matrix_agg`` — named filters + pairwise intersections
- ``rare_terms_agg``       — exact long-tail buckets
- ``sampler_sample``       — deterministic best-scoring sample gate
- ``weighted_avg_agg``     — exact integer-grid weighted mean
- ``auto_date_histogram_agg`` — interval ladder choice + dense grid
- ``percentile_ranks_agg`` — exact inverse percentiles (integer grid)
- ``matrix_stats_agg``     — covariance/correlation on exact moments
- ``multi_terms_agg``       — composite-key terms buckets (7.12+)
- ``top_metrics_agg``       — arg-max metrics via max_by/min_by
- ``string_stats_agg``      — length stats (+optional entropy)
- pipeline aggs over bucket frames: ``derivative_agg``,
  ``cumulative_sum_agg``, ``moving_avg_agg``, ``serial_diff_agg``,
  ``bucket_script_agg``, ``bucket_selector_agg``,
  ``sibling_bucket_stats``

Scale notes (100 TB):
- every bucket agg is ONE hash aggregation (map-side partial combine +
  one shuffle on the bucket key) followed by, at most, a TakeOrdered of
  the requested ``size`` — bucket cardinality, not corpus size, crosses
  the wire;
- ``min_doc_count=0`` dense filling builds the empty-bucket grid from a
  ``sequence()`` over the aggregated bounds (a per-bucket-count-sized
  frame), never from the corpus, and never on the driver;
- one-pass families (``range_agg``/``filters_agg``/``stats_agg``/
  ``percentiles_agg``) compute every bucket/metric as parallel aggregate
  expressions in a single scan and unpivot the one result row — the
  N-ranges case costs one pass, not N;
- ``terms_top_hits`` ranks inside each bucket with a window whose
  partition key is the bucket key — no global sort, skew bounded by the
  per-bucket hit count requested.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "terms_agg",
    "date_histogram_agg",
    "histogram_agg",
    "range_agg",
    "filters_agg",
    "stats_agg",
    "extended_stats_agg",
    "percentiles_agg",
    "terms_top_hits",
    "significant_terms_agg",
    "composite_agg",
    "post_filter_facets",
    "adjacency_matrix_agg",
    "rare_terms_agg",
    "sampler_sample",
    "weighted_avg_agg",
    "auto_date_histogram_agg",
    "choose_auto_interval",
    "percentile_ranks_agg",
    "matrix_stats_agg",
    "derivative_agg",
    "cumulative_sum_agg",
    "moving_avg_agg",
    "serial_diff_agg",
    "bucket_script_agg",
    "bucket_selector_agg",
    "sibling_bucket_stats",
    "multi_terms_agg",
    "top_metrics_agg",
    "string_stats_agg",
    "missing_agg",
    "median_absolute_deviation_agg",
    "t_test_agg",
    "normalize_agg",
]

# ES calendar intervals -> Spark date_trunc unit + sequence step
_CAL = {
    "minute": ("minute", "interval 1 minute"),
    "hour": ("hour", "interval 1 hour"),
    "day": ("day", "interval 1 day"),
    "week": ("week", "interval 1 week"),
    "month": ("month", "interval 1 month"),
    "year": ("year", "interval 1 year"),
}


def _metric_cols(metrics: "Mapping[str, Column] | None") -> list[Column]:
    return [c.alias(n) for n, c in (metrics or {}).items()]


def terms_agg(
    df: DataFrame,
    field: str,
    *,
    size: int = 10,
    metrics: "Mapping[str, Column] | None" = None,
    min_doc_count: int = 1,
    order_by: "str | None" = None,
    ascending: bool = False,
) -> DataFrame:
    """ES ``terms`` aggregation: top-``size`` buckets of ``field`` by
    ``doc_count`` desc (key asc tie-break, the ES ``_count``/``_key``
    order), each with optional sub-metric aggregates computed in the
    same single pass.  ``order_by`` names a metric to rank buckets by
    instead (the ES ``"order": {"<metric>": "desc|asc"}`` form — on a
    sharded ES this ordering is approximate; one exact hash agg here).
    Output: ``(key, doc_count, *metrics)``."""
    if order_by is not None and order_by not in (metrics or {}):
        raise ValueError(f"order_by {order_by!r} is not a declared metric")
    out = (
        df.groupBy(F.col(field).alias("key"))
        .agg(F.count("*").alias("doc_count"), *_metric_cols(metrics))
        .filter(F.col("doc_count") >= min_doc_count)
    )
    rank_col = order_by if order_by else "doc_count"
    rank = F.asc(rank_col) if ascending else F.desc(rank_col)
    # TakeOrderedAndProject: bucket cardinality never globally sorts
    return out.orderBy(rank, F.asc("key")).limit(size)


def _dense_fill(
    grouped: DataFrame,
    seq_expr: str,
    metrics: "Mapping[str, Column] | None",
) -> DataFrame:
    """Left-join the aggregated buckets onto the full bucket grid
    (``sequence()`` over the aggregated min/max key — a frame built
    from the BUCKET rows, so its size is bucket count, not corpus).
    Empty buckets get doc_count 0 and null metrics, the ES
    ``min_doc_count: 0`` contract."""
    grid = grouped.select(F.min("key").alias("mn"), F.max("key").alias("mx")).select(
        F.explode(F.expr(seq_expr)).alias("key")
    )
    filled = grid.join(grouped, "key", "left")
    return filled.select(
        "key",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        *[F.col(n) for n in (metrics or {})],
    )


def date_histogram_agg(
    df: DataFrame,
    ts_col: str,
    interval: str = "day",
    *,
    metrics: "Mapping[str, Column] | None" = None,
    min_doc_count: int = 0,
) -> DataFrame:
    """ES ``date_histogram``: calendar-interval buckets over a
    timestamp column. ES default ``min_doc_count=0`` returns EVERY
    bucket between the first and last populated one, empty buckets
    included — that dense grid comes from ``sequence()`` over the
    aggregated bounds, never from a driver loop.

    Output: ``(key timestamp, doc_count, *metrics)``."""
    if interval not in _CAL:
        raise ValueError(f"unsupported calendar interval: {interval!r}")
    unit, step = _CAL[interval]
    grouped = (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("key"))
        .agg(F.count("*").alias("doc_count"), *_metric_cols(metrics))
    )
    if min_doc_count == 0:
        return _dense_fill(grouped, f"sequence(mn, mx, {step})", metrics)
    return grouped.filter(F.col("doc_count") >= min_doc_count)


def histogram_agg(
    df: DataFrame,
    col: str,
    interval: float,
    *,
    metrics: "Mapping[str, Column] | None" = None,
    min_doc_count: int = 0,
) -> DataFrame:
    """ES ``histogram``: fixed-interval numeric buckets,
    ``key = floor(value / interval) * interval``; ``min_doc_count=0``
    (the ES default) densifies between the first and last populated
    bucket. Output: ``(key, doc_count, *metrics)``."""
    step = int(interval) if float(interval).is_integer() else interval
    key = (F.floor(F.col(col) / F.lit(interval)) * F.lit(step)).cast("long")
    grouped = df.groupBy(key.alias("key")).agg(
        F.count("*").alias("doc_count"), *_metric_cols(metrics)
    )
    if min_doc_count == 0:
        return _dense_fill(grouped, f"sequence(mn, mx, {step}L)", metrics)
    return grouped.filter(F.col("doc_count") >= min_doc_count)


def filters_agg(
    df: DataFrame,
    buckets: "Mapping[str, Column]",
    *,
    other_bucket: bool = False,
    other_bucket_key: str = "_other_",
) -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per predicate, each
    counting the rows that satisfy it (buckets may overlap, exactly the
    reason this is NOT a group-by: a row can land in several). ONE scan
    — every bucket is a parallel conditional-count aggregate expression
    and the single result row unpivots to ``(key, doc_count)`` rows.
    ``other_bucket`` adds the ES ``_other_`` bucket counting rows that
    match NO filter (NULL predicates count as non-matching, like ES
    filter context) — one more conditional sum on the same pass."""
    if not buckets:
        raise ValueError("filters_agg needs at least one bucket")
    if other_bucket and other_bucket_key in buckets:
        raise ValueError(f"bucket name {other_bucket_key!r} is reserved")
    cells = dict(buckets)
    if other_bucket:
        none = None
        for c in buckets.values():
            hit = c.isNotNull() & c
            none = ~hit if none is None else none & ~hit
        cells[other_bucket_key] = none
    aggd = df.agg(
        *[
            F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(k)
            for k, c in cells.items()
        ]
    )
    stack = ", ".join(f"'{k}', coalesce(`{k}`, 0L)" for k in cells)
    return aggd.selectExpr(f"stack({len(cells)}, {stack}) AS (key, doc_count)")


def range_agg(
    df: DataFrame,
    col: str,
    ranges: Sequence[tuple[str, "float | None", "float | None"]],
    *,
    keyed_order: bool = True,
) -> DataFrame:
    """ES ``range`` aggregation: explicit half-open ``[from, to)``
    buckets (``None`` = unbounded side), every requested bucket present
    in the output even when empty — ES contract. Ranges may overlap, so
    this reduces to :func:`filters_agg`'s one-pass conditional counts.

    ``ranges``: ``[(key, from, to), ...]``."""
    buckets: dict[str, Column] = {}
    c = F.col(col)
    for key, lo, hi in ranges:
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (c >= F.lit(lo))
        if hi is not None:
            pred = pred & (c < F.lit(hi))
        buckets[key] = pred
    return filters_agg(df, buckets)


def date_range_agg(
    df: DataFrame,
    ts_col: str,
    ranges: "Sequence[tuple[str, str | None, str | None]]",
    *,
    now=None,
) -> DataFrame:
    """ES ``date_range`` aggregation: half-open ``[from, to)`` buckets
    whose bounds are ES date-math strings (``now-1w/d``,
    ``2024-01-01||+1M/d``, bare ISO) — resolved ONCE driver-side to
    timestamp literals (operators/datemath.py; ``now`` must be passed
    explicitly, the reproducibility contract), so the buckets reduce
    to :func:`filters_agg`'s one-pass conditional counts.  Empty
    requested buckets are preserved (ES contract)."""
    from bigdatasearchpro_spark.operators.datemath import parse_date_math

    buckets: dict[str, Column] = {}
    c = F.col(ts_col)
    for key, lo, hi in ranges:
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (c >= F.lit(parse_date_math(lo, now=now)))
        if hi is not None:
            pred = pred & (c < F.lit(parse_date_math(hi, now=now)))
        buckets[key] = pred
    return filters_agg(df, buckets)


def stats_agg(df: DataFrame, col: str, *, round_to: int = 4) -> DataFrame:
    """ES ``stats``: one row of count/min/max/avg/sum over the matched
    set (avg/sum rounded so the cross-engine double math is
    hash-stable)."""
    c = F.col(col).cast("double")
    return df.agg(
        F.count(c).alias("count_v"),
        F.round(F.min(c), round_to).alias("min_v"),
        F.round(F.max(c), round_to).alias("max_v"),
        F.round(F.avg(c), round_to).alias("avg_v"),
        F.round(F.sum(c), round_to).alias("sum_v"),
    )


def extended_stats_agg(df: DataFrame, col: str, *, round_to: int = 4) -> DataFrame:
    """ES ``extended_stats``: ``stats`` plus population variance and
    standard deviation (ES reports the population forms)."""
    c = F.col(col).cast("double")
    return df.agg(
        F.count(c).alias("count_v"),
        F.round(F.min(c), round_to).alias("min_v"),
        F.round(F.max(c), round_to).alias("max_v"),
        F.round(F.avg(c), round_to).alias("avg_v"),
        F.round(F.sum(c), round_to).alias("sum_v"),
        F.round(F.var_pop(c), round_to).alias("variance_v"),
        F.round(F.stddev_pop(c), round_to).alias("std_dev_v"),
    )


def percentiles_agg(
    df: DataFrame,
    col: str,
    percents: Sequence[float] = (25.0, 50.0, 75.0, 95.0, 99.0),
    *,
    round_to: int = 4,
) -> DataFrame:
    """ES ``percentiles`` aggregation shape: one ``(percent, value)``
    row per requested percent. ES computes these with t-digest; here
    the exact interpolated percentile (Spark ``percentile`` ==
    DuckDB ``quantile_cont``) — the approximate 100 TB path is the
    mergeable-sketch ring (``a9_kll_quantiles``), same trade ES makes.
    ONE pass: all percents evaluate in a single aggregate (array
    percentile), and the one result row unpivots."""
    fracs = F.array(*[F.lit(p / 100.0) for p in percents])
    aggd = df.agg(
        F.percentile(F.col(col).cast("double"), fracs).alias("vals")
    ).select(
        *[
            F.round(F.col("vals")[i], round_to).alias(f"p{_pname(p)}")
            for i, p in enumerate(percents)
        ]
    )
    stack = ", ".join(
        f"{p}D, `p{_pname(p)}`" for p in percents
    )
    return aggd.selectExpr(
        f"stack({len(percents)}, {stack}) AS (percent, value)"
    )


def _pname(p: float) -> str:
    return str(p).replace(".", "_")


def terms_top_hits(
    df: DataFrame,
    field: str,
    *,
    hits: int = 3,
    sort: "Sequence[Column] | None" = None,
    id_col: str = "doc_id",
    select: "Sequence[str] | None" = None,
) -> DataFrame:
    """ES ``terms`` + ``top_hits`` sub-aggregation: for each bucket of
    ``field``, the top ``hits`` documents by ``sort`` (id asc appended
    as the deterministic tie-break). The rank runs in a window
    PARTITIONED by the bucket key — each bucket sorts its own rows, no
    global sort, and the output is ``hits`` rows per bucket.

    Output: ``(key, hit_rank, *select)``."""
    order = list(sort or []) + [F.asc(id_col)]
    w = Window.partitionBy(F.col(field)).orderBy(*order)
    cols = list(select if select is not None else [id_col])
    return (
        df.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= hits)
        .select(F.col(field).alias("key"), "hit_rank", *cols)
    )


def significant_terms_agg(
    foreground: DataFrame,
    background: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 10,
    min_doc_count: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """ES ``significant_terms`` aggregation over an analyzed text field:
    terms that are unusually frequent in the query-matched (foreground)
    set relative to the whole index (background), scored with the ES
    default JLH heuristic::

        score = (fg% - bg%) * (fg% / bg%)     where fg% > bg%

    with fg%/bg% the DOCUMENT frequencies (a term counts once per doc,
    like ES's per-shard doc_count) over the respective set sizes.

    Plan (100 TB): two (term -> doc_count) hash aggregations — the
    foreground one over the matched set only — joined on term. The
    explode carries ``(id, term)`` distinct pairs, never text; set
    sizes are scalar one-row aggregates broadcast into the score
    projection; the result is a TakeOrdered of ``size``. Nothing
    corpus-sized crosses to the driver.

    Output: ``(key, doc_count, bg_count, score)``, score desc
    (key asc tie-break), only positively-significant terms (ES drops
    terms not more frequent than background)."""
    from bigdatasearchpro_spark.operators.search import tokens_expr

    def doc_freq(df: DataFrame) -> DataFrame:
        pairs = df.select(
            F.col(id_col), F.explode(F.array_distinct(tokens_expr(text_col))).alias("key")
        )
        return pairs.groupBy("key").agg(F.count("*").alias("n"))

    fg = doc_freq(foreground)
    bg = doc_freq(background)
    n_fg = foreground.count()
    n_bg = background.count()
    if n_fg == 0 or n_bg == 0:
        raise ValueError("significant_terms needs non-empty fore/background")
    joined = (
        fg.withColumnRenamed("n", "doc_count")
        .join(bg.withColumnRenamed("n", "bg_count"), "key")
        .filter(F.col("doc_count") >= min_doc_count)
    )
    fg_pct = F.col("doc_count") / F.lit(float(n_fg))
    bg_pct = F.col("bg_count") / F.lit(float(n_bg))
    scored = joined.withColumn(
        "score", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), round_to)
    ).filter(F.col("score") > 0)
    return scored.orderBy(F.desc("score"), F.asc("key")).limit(size)


def significant_text_agg(
    foreground: DataFrame,
    background: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 10,
    min_doc_count: int = 3,
    filter_duplicate_text: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """ES ``significant_text`` aggregation: ``significant_terms``
    semantics over a free-text field, re-analyzing the foreground
    hits' text at query time — with ES's ``filter_duplicate_text``
    behavior: duplicated text (boilerplate, mirrored pages, retweets)
    is counted ONCE so copy-paste storms cannot fake significance.
    The duplicate filter here is exact-text dedup (one representative
    per distinct text — a hash-groupBy, the L1 dedup shape; ES
    approximates the same goal with sequence-spotting).  Background
    statistics stay over the WHOLE index, like ES.

    Plan: the dedup is one hash aggregate on the text hash; everything
    after is :func:`significant_terms_agg` (two (term, doc_count)
    aggs joined on term, TakeOrdered ``size``)."""
    if filter_duplicate_text:
        foreground = foreground.dropDuplicates([text_col])
    return significant_terms_agg(
        foreground,
        background,
        text_col=text_col,
        id_col=id_col,
        size=size,
        min_doc_count=min_doc_count,
        round_to=round_to,
    )


def composite_agg(
    df: DataFrame,
    sources: Sequence[str],
    *,
    size: int = 10,
    after: "Sequence | None" = None,
    metrics: "Mapping[str, Column] | None" = None,
) -> DataFrame:
    """ES ``composite`` aggregation: multi-source buckets (the cross of
    the ``sources`` column values that actually occur), streamed in
    bucket-key order with ``after``-key pagination — THE ES surface for
    paging over unbounded bucket cardinalities, where ``terms`` with a
    huge ``size`` would blow the coordinator.

    ``after`` is the last bucket key tuple of the previous page; only
    buckets strictly greater (tuple order, each source asc) return.

    Plan (100 TB): a row's bucket key IS its source-column tuple, so
    the after-key predicate filters MAP-SIDE before the hash
    aggregation — rows belonging to already-returned buckets never
    enter the shuffle (mirrors ``search_after``'s keyset pushdown; this
    is why composite paging scales where deep ``terms`` paging cannot).
    Then one hash-agg on the key tuple and a TakeOrdered of ``size``
    in key order.

    Output: ``(*sources, doc_count, *metrics)``."""
    if not sources:
        raise ValueError("composite_agg needs at least one source")
    if after is not None:
        if len(after) != len(sources):
            raise ValueError("after-key arity != sources arity")
        # (k1, k2) > (a1, a2) tuple order, expanded so each conjunct
        # can prune/push independently
        pred = None
        for i in range(len(sources)):
            eqs = F.lit(True)
            for j in range(i):
                eqs = eqs & (F.col(sources[j]) == F.lit(after[j]))
            arm = eqs & (F.col(sources[i]) > F.lit(after[i]))
            pred = arm if pred is None else (pred | arm)
        df = df.filter(pred)
    out = df.groupBy(*[F.col(s) for s in sources]).agg(
        F.count("*").alias("doc_count"), *_metric_cols(metrics)
    )
    return out.orderBy(*[F.asc(s) for s in sources]).limit(size)


def nested_terms_agg(
    df: DataFrame,
    parent_field: str,
    child_field: str,
    *,
    size: int = 10,
    child_size: int = 3,
) -> DataFrame:
    """ES nested bucket aggregation — a ``terms`` agg INSIDE a ``terms``
    agg (the drill-down shape every Kibana breakdown uses): top
    ``size`` parent buckets by doc_count, each carrying its top
    ``child_size`` child buckets.

    One hash aggregation on (parent, child) does all counting; parent
    totals come from a window SUM over the aggregated bucket rows
    (bucket-cardinality-sized, never corpus-sized) and children rank
    inside their parent partition — no second pass over the data.
    Output: one row per surviving (parent, child) with both counts and
    the child's rank (ES order: count desc, key asc)."""
    from pyspark.sql.window import Window

    pairs = df.groupBy(
        F.col(parent_field).alias("parent_key"),
        F.col(child_field).alias("child_key"),
    ).agg(F.count("*").alias("child_count"))
    wp = Window.partitionBy("parent_key")
    wr = Window.partitionBy("parent_key").orderBy(
        F.desc("child_count"), F.asc("child_key")
    )
    enriched = pairs.withColumn(
        "parent_count", F.sum("child_count").over(wp)
    ).withColumn("child_rank", F.row_number().over(wr))
    top_parents = (
        enriched.select("parent_key", "parent_count")
        .distinct()
        .orderBy(F.desc("parent_count"), F.asc("parent_key"))
        .limit(size)
    )
    return (
        enriched.join(F.broadcast(top_parents.select("parent_key")), "parent_key")
        .filter(F.col("child_rank") <= child_size)
        .select(
            "parent_key", "parent_count", "child_key", "child_count",
            "child_rank",
        )
    )


def post_filter_facets(
    df: DataFrame,
    facet_field: str,
    post_filter: Column,
    *,
    size: int = 10,
) -> DataFrame:
    """ES ``post_filter`` semantics in one aggregation: facet buckets
    are computed over the FULL query match set (``doc_count``), while
    the hit list a UI would page is additionally narrowed by the
    post filter (``post_count``) — the faceted-navigation contract
    where clicking a filter narrows the results but the facet counts
    don't collapse to it.

    One hash agg (conditional count shares the pass); TakeOrdered of
    ``size``. Output: ``(key, doc_count, post_count)``."""
    out = (
        df.groupBy(F.col(facet_field).alias("key"))
        .agg(
            F.count("*").alias("doc_count"),
            # coalesce: an all-NULL predicate bucket must count 0, not
            # NULL (ES / CASE-WHEN counting semantics)
            F.coalesce(F.sum(post_filter.cast("long")), F.lit(0)).alias(
                "post_count"
            ),
        )
    )
    return out.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def adjacency_matrix_agg(
    df: DataFrame,
    filters: "Mapping[str, Column]",
    *,
    separator: str = "&",
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: one bucket per named filter
    plus one per pairwise INTERSECTION (key ``a&b``, pair keys in the
    mapping's order), counting rows satisfying both — the co-occurrence
    matrix ES serves for graph-y dashboards.  ONE scan: every single
    and pair bucket is a parallel conditional-sum aggregate expression
    on the same pass, the one result row unpivots, and empty buckets
    are dropped exactly like ES omits them.  O(k^2) aggregate columns —
    ES caps k at 100 filters for the same reason.

    Output: ``(key, doc_count)``, key asc."""
    if not filters:
        raise ValueError("adjacency_matrix_agg needs at least one filter")
    keys = list(filters)
    cells: "list[tuple[str, Column]]" = [(k, filters[k]) for k in keys]
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            cells.append((f"{a}{separator}{b}", filters[a] & filters[b]))
    aggd = df.agg(
        *[
            F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"__c{i}")
            for i, (_, c) in enumerate(cells)
        ]
    )
    stack = ", ".join(
        f"'{k}', coalesce(`__c{i}`, 0L)" for i, (k, _) in enumerate(cells)
    )
    return (
        aggd.selectExpr(f"stack({len(cells)}, {stack}) AS (key, doc_count)")
        .filter(F.col("doc_count") > 0)
        .orderBy(F.asc("key"))
    )


def rare_terms_agg(
    df: DataFrame,
    field: str,
    *,
    max_doc_count: int = 1,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the long-tail buckets — values of
    ``field`` occurring in at most ``max_doc_count`` documents, ordered
    count asc then key asc (the ES ordering; rare_terms exists because
    ``terms`` with count asc is unboundedly inaccurate sharded — here
    one exact hash aggregate + a HAVING-style filter gives the exact
    answer, and only the rare tail survives the aggregate, so the
    result stays bucket-sized).  Output: ``(key, doc_count)``."""
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    return (
        df.groupBy(F.col(field).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
        .orderBy(F.asc("doc_count"), F.asc("key"))
    )


def sampler_sample(
    df: DataFrame,
    *,
    shard_size: int = 100,
    sort: "Sequence[Column] | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``sampler`` aggregation, the sampling half: restrict any
    sub-aggregation to the ``shard_size`` BEST-scoring matched docs
    (``sort`` desc-first like ES ``_score``; id asc tie-break so the
    sample is deterministic — ES per-shard samples are not, which this
    engine treats as a bug, not a feature).  ``orderBy().limit()``
    compiles to TakeOrderedAndProject — each partition keeps a
    shard_size-heap, no global sort.  Compose any agg function over the
    returned sample exactly like ES nests sub-aggs under ``sampler``."""
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    order = list(sort or []) + [F.asc(id_col)]
    return df.orderBy(*order).limit(shard_size)


def weighted_avg_agg(
    df: DataFrame,
    *,
    value: str,
    weight: str,
    group_cols: "Sequence[str] | None" = None,
    value_scale: "int | None" = None,
    weight_scale: "int | None" = None,
    out_scale: int = 1_000_000,
) -> DataFrame:
    """ES ``weighted_avg`` metric aggregation:
    ``sum(value * weight) / sum(weight)`` per group.

    With ``value_scale``/``weight_scale`` given (inputs on a decimal
    grid, e.g. money at scale 100), the whole computation runs on
    exact integers: products scaled to bigints, summed exactly, ONE
    integer floor-division at the end — ``w_avg_scaled`` in
    ``1/out_scale`` units, bit-stable on any engine regardless of
    distributed sum order.  Without scales, the float path sums doubles
    and divides (fine for serving, not for value-hash comparison).

    Output: ``(*group_cols, w_avg[_scaled], sum_weight, doc_count)``."""
    gc = list(group_cols or [])
    v, w = F.col(value), F.col(weight)
    grouped = df.groupBy(*gc) if gc else df.groupBy()
    if value_scale is not None and weight_scale is not None:
        # quantize EACH input onto its decimal grid first (round kills
        # the float-representation wiggle, e.g. 0.04*100 = 4.0000…01),
        # then everything downstream is exact int64: products, sums,
        # one floor-division.  w_avg = num/(vs*den) in value units, so
        # scaled = num*out_scale div (den*vs).
        vi = F.round(v * F.lit(value_scale), 0).cast("bigint")
        wi = F.round(w * F.lit(weight_scale), 0).cast("bigint")
        out = grouped.agg(
            F.sum(vi * wi).alias("__num"),
            F.sum(wi).alias("__den"),
            F.count("*").alias("doc_count"),
        )
        wavg = F.expr(
            f"__num * {int(out_scale)} div (__den * {int(value_scale)})"
        ).alias("w_avg_scaled")
        sel = [wavg, F.col("__den").alias("sum_weight_scaled"),
               F.col("doc_count")]
        return out.select(*gc, *sel).orderBy(*gc) if gc else out.select(*sel)
    out = grouped.agg(
        F.sum(v.cast("double") * w.cast("double")).alias("__num"),
        F.sum(w.cast("double")).alias("__den"),
        F.count("*").alias("doc_count"),
    )
    sel = [
        (F.col("__num") / F.col("__den")).alias("w_avg"),
        F.col("__den").alias("sum_weight"),
        F.col("doc_count"),
    ]
    return out.select(*gc, *sel).orderBy(*gc) if gc else out.select(*sel)


# ---------------------------------------------------------------------------
# ES pipeline aggregations — second-pass aggs over the BUCKET rows of a
# parent aggregation (date_histogram/histogram/terms).  All of them are
# window expressions over the bucket frame, which is bucket-cardinality
# sized (hours, days, terms — thousands of rows, NOT corpus-sized), so
# the unpartitioned ordered window is a per-bucket-count cost at any
# corpus scale; the corpus only ever flows through the parent's ONE
# hash aggregate.
# ---------------------------------------------------------------------------
def derivative_agg(
    buckets: DataFrame, metric: str, *, order_col: str = "key"
) -> DataFrame:
    """ES ``derivative`` pipeline agg: bucket-to-bucket difference of
    ``metric`` in ``order_col`` order; the first bucket gets NULL,
    exactly like ES omits the derivative there."""
    w = Window.orderBy(F.asc(order_col))
    return buckets.withColumn(
        f"{metric}_deriv", F.col(metric) - F.lag(metric, 1).over(w)
    )


def cumulative_sum_agg(
    buckets: DataFrame, metric: str, *, order_col: str = "key"
) -> DataFrame:
    """ES ``cumulative_sum`` pipeline agg: running total of ``metric``
    over the bucket frame in ``order_col`` order."""
    w = (
        Window.orderBy(F.asc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return buckets.withColumn(f"{metric}_cumsum", F.sum(metric).over(w))


def moving_avg_agg(
    buckets: DataFrame,
    metric: str,
    *,
    window: int = 3,
    order_col: str = "key",
    include_current: bool = False,
) -> DataFrame:
    """ES ``moving_fn`` (avg) pipeline agg: mean of ``metric`` over the
    trailing ``window`` buckets — by default the window ends just
    BEFORE the current bucket (ES ``shift: 0``); ``include_current``
    gives the deprecated ``moving_avg`` trailing-inclusive shape.
    Buckets with an empty frame (the first, under the default) get
    NULL, like ES skips them.

    The mean is emitted as explicit exact-int-sum / frame-count
    columns plus their single double division — frame sums of integer
    metrics never depend on accumulation order."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    hi = 0 if include_current else -1
    lo = hi - window + 1
    w = Window.orderBy(F.asc(order_col)).rowsBetween(lo, hi)
    msum = F.sum(metric).over(w)
    mn = F.count(metric).over(w)
    return buckets.withColumn(
        f"{metric}_mavg",
        F.when(
            mn > 0, msum.cast("double") / mn.cast("double")
        ),
    )


def change_point_agg(
    buckets: DataFrame, metric: str, *, order_col: str = "key"
) -> DataFrame:
    """ES ``change_point`` aggregation (8.x), step-change form: find
    the bucket where the series' mean level shifts most — the split
    point k maximizing |mean(buckets[..k]) - mean(buckets[k..])|, the
    classic two-segment CUSUM/mean-shift statistic (public algorithm;
    ES additionally classifies spike/dip/trend, which reduce to other
    statistics over the same bucket frame).

    Returns ONE row: the first bucket of the right segment (where the
    new level starts, like ES's ``change_point.bucket``), both segment
    means, their absolute difference, and ``change_type``
    ('step_change').

    Determinism: segment sums/counts are exact integers; each mean is
    ONE double division, the delta one subtraction — bit-stable
    cross-engine, so the argmax (ties broken on bucket key) replays
    exactly.  Like every pipeline agg here the windows run over the
    BUCKET frame (bucket cardinality, never corpus size)."""
    w = Window.orderBy(F.asc(order_col))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s = buckets.select(
        F.row_number().over(w).alias("__rn"),
        F.sum(metric).over(wcum).alias("__cum"),
        F.count(F.lit(1)).over(wall).alias("__n"),
        F.sum(metric).over(wall).alias("__tot"),
        F.lead(order_col, 1).over(w).alias("__next"),
    )
    c = s.filter(F.col("__rn") < F.col("__n")).select(
        F.col("__next").alias(order_col),
        (F.col("__cum").cast("double") / F.col("__rn").cast("double")).alias(
            "left_mean"
        ),
        (
            (F.col("__tot") - F.col("__cum")).cast("double")
            / (F.col("__n") - F.col("__rn")).cast("double")
        ).alias("right_mean"),
    )
    return (
        c.select(
            order_col,
            "left_mean",
            "right_mean",
            F.abs(F.col("right_mean") - F.col("left_mean")).alias("mean_delta"),
            F.lit("step_change").alias("change_type"),
        )
        .orderBy(F.desc("mean_delta"), F.asc(order_col))
        .limit(1)
    )


def bucket_script_agg(
    buckets: DataFrame, name: str, script: Column
) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: a per-bucket expression over
    sibling metric columns (the ``buckets_path`` variables are just
    column references here), appended as ``name``."""
    return buckets.withColumn(name, script)


def bucket_selector_agg(buckets: DataFrame, predicate: Column) -> DataFrame:
    """ES ``bucket_selector`` pipeline agg: keep only buckets whose
    metrics satisfy ``predicate`` — the HAVING of the agg DSL, applied
    AFTER any sibling pipeline aggs have been computed."""
    return buckets.filter(predicate)


def serial_diff_agg(
    buckets: DataFrame, metric: str, *, lag: int = 1, order_col: str = "key"
) -> DataFrame:
    """ES ``serial_diff`` pipeline agg: ``metric - lag(metric, lag)``
    over the bucket frame — seasonality-removal differencing; the
    first ``lag`` buckets get NULL like ES."""
    if lag <= 0:
        raise ValueError(f"lag must be positive, got {lag}")
    w = Window.orderBy(F.asc(order_col))
    return buckets.withColumn(
        f"{metric}_sdiff_{lag}", F.col(metric) - F.lag(metric, lag).over(w)
    )


# (unit, rough seconds used ONLY for choosing — the buckets themselves
# are exact calendar date_trunc buckets; ES auto_date_histogram picks
# its interval from the same kind of rough ladder)
_AUTO_LADDER = [
    ("minute", 60),
    ("hour", 3_600),
    ("day", 86_400),
    ("week", 604_800),
    ("month", 2_629_800),
    ("year", 31_557_600),
]


def choose_auto_interval(span_seconds: int, target_buckets: int) -> str:
    """The ``auto_date_histogram`` interval choice: the smallest
    calendar unit whose ROUGH bucket estimate
    (``span // unit_seconds + 1``) fits ``target_buckets``.  Pure
    integer arithmetic on fixed ladder constants, so an oracle engine
    replays the identical choice."""
    if target_buckets <= 0:
        raise ValueError(f"target_buckets must be positive, got {target_buckets}")
    for unit, secs in _AUTO_LADDER:
        if span_seconds // secs + 1 <= target_buckets:
            return unit
    return "year"


def auto_date_histogram_agg(
    df: DataFrame,
    ts_col: str,
    *,
    target_buckets: int = 100,
    metrics: "Mapping[str, Column] | None" = None,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest calendar interval
    that keeps the bucket count at or under ``target_buckets``, then
    run the ordinary dense ``date_histogram`` at it.  The probe is ONE
    scalar min/max aggregate (a single driver-side row — bounded at
    any corpus size); the chosen unit is echoed back as the
    ``interval`` column like the ES response carries it.  An empty
    input returns an empty frame with the same schema (unit
    ``year``)."""
    bounds = df.select(
        F.to_unix_timestamp(F.min(ts_col)).alias("mn"),
        F.to_unix_timestamp(F.max(ts_col)).alias("mx"),
    ).collect()[0]
    if bounds["mn"] is None:
        span = 0
    else:
        span = int(bounds["mx"]) - int(bounds["mn"])
    unit = choose_auto_interval(span, target_buckets)
    out = date_histogram_agg(
        df, ts_col, unit, metrics=metrics, min_doc_count=0
    )
    return out.select(F.lit(unit).alias("interval"), "*")


def sibling_bucket_stats(
    buckets: DataFrame, metric: str
) -> DataFrame:
    """ES sibling pipeline aggs — ``avg_bucket`` / ``sum_bucket`` /
    ``min_bucket`` / ``max_bucket`` / ``stats_bucket`` — in ONE row
    over ALL buckets of the parent aggregation: the bucket frame
    reduces to a single scalar row (bucket-cardinality input, so this
    is a one-row aggregate at any corpus scale).  The mean is the
    exact integer sum divided once when ``metric`` is integral."""
    m = F.col(metric)
    return buckets.agg(
        F.count(m).alias("n_buckets"),
        F.min(m).alias("min_bucket"),
        F.max(m).alias("max_bucket"),
        F.sum(m).alias("sum_bucket"),
        (
            F.sum(m).cast("double") / F.count(m).cast("double")
        ).alias("avg_bucket"),
    )


def percentile_ranks_agg(
    df: DataFrame,
    col: str,
    values: "Sequence[float]",
    *,
    rank_scale: int = 1_000_000,
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation, EXACT: for each requested
    value, the fraction of rows at or below it — the inverse of
    ``percentiles``.  ONE scan: every requested value is a parallel
    conditional-count aggregate expression; the single result row
    unpivots to ``(value, n_le, doc_count, rank_scaled)`` rows with
    the rank on an exact ``1/rank_scale`` integer grid
    (``n_le * rank_scale div doc_count`` — no float division, so any
    engine replays it bit-for-bit).  ES serves this from a t-digest
    with shard error; one exact hash pass needs no sketch."""
    if not values:
        raise ValueError("percentile_ranks_agg needs at least one value")
    c = F.col(col)
    aggd = df.agg(
        F.count(c).alias("__n"),
        *[
            F.sum(F.when(c <= F.lit(v), 1).otherwise(0))
            .cast("long")
            .alias(f"__le{i}")
            for i, v in enumerate(values)
        ],
    )
    stack = ", ".join(
        f"CAST({float(v)!r} AS DOUBLE), coalesce(`__le{i}`, 0L)"
        for i, v in enumerate(values)
    )
    return (
        aggd.selectExpr(
            "__n",
            f"stack({len(values)}, {stack}) AS (value, n_le)",
        )
        .select(
            "value",
            "n_le",
            F.col("__n").alias("doc_count"),
            F.when(
                F.col("__n") > 0,
                F.expr(f"n_le * {int(rank_scale)} div __n"),
            ).alias("rank_scaled"),
        )
        .orderBy("value")
    )


def matrix_stats_agg(
    df: DataFrame,
    fields: "Mapping[str, int]",
) -> DataFrame:
    """ES ``matrix_stats`` aggregation (the multi-field covariance /
    correlation matrix) on an EXACT core: each input column is
    quantized onto its decimal grid (``fields`` maps column name ->
    scale, e.g. 100 for cents), every pairwise moment
    (count, sum_x, sum_y, sum_xy as int64) accumulates exactly in ONE
    scan of parallel aggregate expressions, and the derived doubles
    (means, covariance, correlation) come from a FIXED chain of
    correctly-rounded IEEE ops over those exact integers — so the
    whole output is bit-stable on any engine and under any partial
    aggregation order, which a naive float matrix_stats is not.

    Output: one row per ordered field pair (i <= j, self-pairs carry
    the variances): ``(field_x, field_y, doc_count, sum_x, sum_y,
    sum_xy, mean_x, mean_y, covariance, correlation)``; covariance is
    the population form (/n) like ES."""
    if not fields:
        raise ValueError("matrix_stats_agg needs at least one field")
    names = list(fields)
    q = {
        n: F.round(F.col(n) * F.lit(int(s)), 0).cast("bigint")
        for n, s in fields.items()
    }
    exprs: "list[Column]" = [F.count("*").alias("__n")]
    for n in names:
        exprs.append(F.sum(q[n]).alias(f"__s_{n}"))
    for i, a in enumerate(names):
        for b in names[i:]:
            exprs.append(F.sum(q[a] * q[b]).alias(f"__p_{a}_{b}"))
    aggd = df.agg(*exprs)

    def mean(n: str) -> Column:
        return F.col(f"__s_{n}").cast("double") / F.lit(
            float(fields[n])
        ) / F.col("__n").cast("double")

    def cov(a: str, b: str) -> Column:
        sxy = F.col(f"__p_{a}_{b}").cast("double") / F.lit(
            float(fields[a] * fields[b])
        ) / F.col("__n").cast("double")
        return sxy - mean(a) * mean(b)

    # one struct per pair, exploded from the SINGLE aggregate row —
    # the whole matrix is one scan + one one-row projection, never a
    # union of per-pair re-aggregations
    pair_structs = []
    for i, a in enumerate(names):
        for b in names[i:]:
            corr = cov(a, b) / (
                F.sqrt(cov(a, a)) * F.sqrt(cov(b, b))
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("field_x"),
                    F.lit(b).alias("field_y"),
                    F.col("__n").alias("doc_count"),
                    F.col(f"__s_{a}").alias("sum_x"),
                    F.col(f"__s_{b}").alias("sum_y"),
                    F.col(f"__p_{a}_{b}").alias("sum_xy"),
                    mean(a).alias("mean_x"),
                    mean(b).alias("mean_y"),
                    cov(a, b).alias("covariance"),
                    corr.alias("correlation"),
                )
            )
    return (
        aggd.select(F.explode(F.array(*pair_structs)).alias("__c"))
        .select("__c.*")
        .orderBy("field_x", "field_y")
    )


def boxplot_agg(
    df: DataFrame, col: str, *, round_to: int = 4
) -> DataFrame:
    """ES ``boxplot`` aggregation: min, q1, q2 (median), q3, max and
    the derived IQR in ONE row from a single pass (array percentile +
    min/max share the aggregate).  ES serves these from a t-digest;
    exact interpolated percentiles here, the same trade
    :func:`percentiles_agg` documents."""
    c = F.col(col).cast("double")
    fracs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    aggd = df.agg(
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.percentile(c, fracs).alias("__q"),
    )
    q1 = F.round(F.col("__q")[0], round_to)
    q2 = F.round(F.col("__q")[1], round_to)
    q3 = F.round(F.col("__q")[2], round_to)
    return aggd.select(
        "min_v",
        q1.alias("q1"),
        q2.alias("q2"),
        q3.alias("q3"),
        "max_v",
        F.round(F.col("__q")[2] - F.col("__q")[0], round_to).alias("iqr"),
    )


def diversified_sampler_sample(
    df: DataFrame,
    *,
    shard_size: int = 100,
    field: str,
    max_docs_per_value: int = 1,
    sort: "Sequence[Column] | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``diversified_sampler`` aggregation, the sampling half: the
    best-scoring docs with AT MOST ``max_docs_per_value`` per value of
    ``field`` (de-biasing the sample), capped at ``shard_size``.
    Plan: one window partitioned BY THE FIELD (per-key rank, no global
    sort, skew bounded by max_docs_per_value) keeps each key's best
    docs, then a TakeOrdered of ``shard_size`` over the survivors —
    deterministic via rounded-score + id tie-breaks, unlike ES's
    per-shard sample."""
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    if max_docs_per_value <= 0:
        raise ValueError(
            f"max_docs_per_value must be positive, got {max_docs_per_value}"
        )
    order = list(sort or []) + [F.asc(id_col)]
    w = Window.partitionBy(F.col(field)).orderBy(*order)
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= max_docs_per_value)
        .drop("__r")
        .orderBy(*order)
        .limit(shard_size)
    )


def multi_terms_agg(
    df: DataFrame,
    fields: "Sequence[str]",
    *,
    size: int = 10,
    metrics: "Mapping[str, Column] | None" = None,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: top-``size`` buckets of the
    COMPOSITE key (the ES 7.12+ answer to nested ``terms`` when the
    ranking must be over the pair, not per-level): doc_count desc,
    then each key component asc — one hash aggregation on the
    composite key, then a TakeOrdered; identical plan shape to
    :func:`terms_agg`, just a wider grouping key (one shuffle, never
    two stacked like the nested form).  Output:
    ``(key_<f1>, ..., doc_count, *metrics)``."""
    if len(fields) < 2:
        raise ValueError("multi_terms needs at least two fields")
    keys = [F.col(f).alias(f"key_{f}") for f in fields]
    out = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("doc_count"), *_metric_cols(metrics))
        .filter(F.col("doc_count") >= min_doc_count)
    )
    order = [F.desc("doc_count"), *(F.asc(f"key_{f}") for f in fields)]
    return out.orderBy(*order).limit(size)


def top_metrics_agg(
    df: DataFrame,
    group_field: str,
    sort_field: str,
    metric_fields: "Sequence[str]",
    *,
    descending: bool = True,
    tie_col: "str | None" = None,
) -> DataFrame:
    """ES ``top_metrics`` aggregation per bucket: the values of
    ``metric_fields`` on the row holding the max (or min) of
    ``sort_field`` — the arg-max shape.  One ``max_by``/``min_by``
    hash aggregation (partial-aggregatable JVM builtins — the ES doc's
    "cheaper top_hits for one row") — no window, no per-bucket sort.
    ES breaks sort ties arbitrarily per shard; a deterministic engine
    must not, so ties fall back on ``tie_col`` (packed into the
    ordering struct) when given.  Output: ``(key, <sort_field>,
    *metric_fields)``."""
    s = F.col(sort_field)
    ordering = (
        F.struct(s, F.col(tie_col)) if tie_col is not None else s
    )
    pick = F.max_by if descending else F.min_by
    aggs_ = [pick(F.col(m), ordering).alias(m) for m in metric_fields]
    top_sort = (F.max(s) if descending else F.min(s)).alias(sort_field)
    return (
        df.groupBy(F.col(group_field).alias("key"))
        .agg(top_sort, *aggs_)
        .orderBy("key")
    )


def string_stats_agg(
    df: DataFrame,
    col: str,
    *,
    round_to: int = 4,
    with_entropy: bool = False,
) -> DataFrame:
    """ES ``string_stats`` aggregation: count, min/max/avg length of a
    string field in one pass.  Lengths are exact integers; avg_length
    divides two exact BIGINTs once in DOUBLE (bit-stable cross-engine).
    ``with_entropy`` adds the Shannon character entropy ES also
    reports — that needs a character-frequency explode (a second
    aggregation) and log2 (a libm transcendental that differs across
    engines in the last ulp), so it is off by default and rounded when
    on — the same honesty trade as percentiles_agg."""
    c = F.col(col)
    base = df.agg(
        F.count(c).alias("count"),
        F.min(F.length(c)).alias("min_length"),
        F.max(F.length(c)).alias("max_length"),
        (
            F.sum(F.length(c)).cast("double")
            / F.count(c).cast("double")
        ).alias("avg_length"),
    )
    if not with_entropy:
        return base
    chars = df.select(F.explode(F.split(c, "")).alias("ch")).filter(
        F.col("ch") != ""
    )
    freq = chars.groupBy("ch").agg(F.count("*").alias("n"))
    ent = (
        freq.crossJoin(F.broadcast(freq.agg(F.sum("n").alias("t"))))
        .select(
            (
                -(F.col("n") / F.col("t"))
                * F.log2(F.col("n") / F.col("t"))
            ).alias("__e")
        )
        .agg(F.round(F.sum("__e"), round_to).alias("entropy"))
    )
    return base.crossJoin(ent)


def missing_agg(
    df: DataFrame, field: str, *, value_count_of: "str | None" = None
) -> DataFrame:
    """ES ``missing`` + ``value_count`` metric pair in one pass:
    doc_count of documents lacking ``field`` (NULL — ES counts absent
    fields; a parquet-backed engine's absent is NULL) and, optionally,
    the count of present VALUES of ``value_count_of``.  Pure
    conditional counts in one reduce."""
    target = value_count_of or field
    return df.agg(
        F.count(F.when(F.col(field).isNull(), 1)).alias("missing_count"),
        F.count(F.col(target)).alias("value_count"),
    )


def median_absolute_deviation_agg(
    df: DataFrame, col: str, *, round_to: int = 4
) -> DataFrame:
    """ES ``median_absolute_deviation``: median(|x - median(x)|) —
    the robust dispersion metric.  ES approximates with t-digest; this
    is the EXACT two-phase form: one percentile aggregate for the
    median (a 1-row broadcast), one pass for the deviations' median.
    Two scans by definition (the second depends on the first's
    scalar); each is a single reduce, nothing corpus-sized moves."""
    med = df.agg(F.percentile(F.col(col).cast("double"), F.lit(0.5)).alias("m"))
    return (
        df.crossJoin(F.broadcast(med))
        .select(F.abs(F.col(col).cast("double") - F.col("m")).alias("__d"))
        .agg(F.round(F.percentile(F.col("__d"), F.lit(0.5)), round_to).alias("mad"))
    )


def t_test_agg(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    *,
    cents: int = 100,
) -> DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic / Welch, the ES
    default): the t statistic between two filtered populations of
    ``value_col``::

        t = (m1 - m2) / sqrt(v1/n1 + v2/n2)      v = sample variance

    Moments accumulate as EXACT int64 sums on a cent grid (the
    weighted_avg/matrix_stats pattern — immune to float sum order),
    and the closing chain is fixed-order correctly-rounded IEEE ops
    (-, *, /, sqrt — no libm), so the statistic is bit-stable
    cross-engine.  ONE conditional-sum pass, one row out."""
    q = F.floor(F.col(value_col).cast("double") * cents + F.lit(0.5)).cast("long")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    agg = df.agg(
        F.count(F.when(in_a, 1)).alias("n1"),
        F.count(F.when(in_b, 1)).alias("n2"),
        F.sum(F.when(in_a, q)).alias("s1"),
        F.sum(F.when(in_b, q)).alias("s2"),
        F.sum(F.when(in_a, q * q)).alias("q1"),
        F.sum(F.when(in_b, q * q)).alias("q2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1 / cents
    m2 = F.col("s2").cast("double") / n2 / cents
    # sample variance in value units: (sum_sq - sum^2/n) / (n-1) / cents^2
    v1 = (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n1) / (n1 - 1) / (cents * cents)
    v2 = (F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / n2) / (n2 - 1) / (cents * cents)
    return agg.select(
        F.col("n1"), F.col("n2"),
        ((m1 - m2) / F.sqrt(v1 / n1 + v2 / n2)).alias("t_value"),
    )


def normalize_agg(
    buckets: DataFrame,
    metric: str,
    *,
    method: str = "range",
    out: str = "normalized",
    round_to: int = 6,
) -> DataFrame:
    """ES ``normalize`` pipeline aggregation over the parent's bucket
    frame: rescale a bucket metric to [0, 1] — ``range``
    ((v-min)/(max-min), the ES ``rescale_0_1``) or ``percent_of_sum``
    (v/sum, ES ``percent_of_sum``).  A window over BUCKET-cardinality
    rows (unpartitioned by design like every pipeline agg — the frame
    IS the bucket list, never the corpus)."""
    if method not in ("range", "percent_of_sum"):
        raise ValueError(f"unknown method: {method!r}")
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v = F.col(metric).cast("double")
    if method == "range":
        lo, hi = F.min(v).over(w), F.max(v).over(w)
        expr = F.when(hi != lo, (v - lo) / (hi - lo)).otherwise(F.lit(0.0))
    else:
        expr = v / F.sum(v).over(w)
    return buckets.withColumn(out, F.round(expr, round_to))


def frequent_item_sets_agg(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    size: int = 10,
) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (8.4+), the 2-itemset
    form: item PAIRS co-occurring in at least ``min_support`` baskets,
    ranked by support — market-basket mining over (basket, item) rows.

    Plan (the Apriori property doing the scale work): (1) distinct
    (basket, item) pairs; (2) frequent ITEMS first — one hash agg +
    filter, a set far smaller than the item universe; (3) baskets
    semi-join to frequent items BEFORE pairing, so the per-basket
    self-join explodes only over items that can still qualify;
    (4) pair counts — one hash agg — filtered to ``min_support``,
    TakeOrdered ``size``.  Without step (2)/(3) the pair join is
    quadratic in raw basket width; with them it is quadratic only in
    qualifying width (the classic Apriori prune).

    Output: ``(item_a, item_b, support)``, support desc, pair asc;
    ``item_a < item_b`` canonical order."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    rows = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    freq_items = (
        rows.groupBy("__i")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= F.lit(min_support))
        .select("__i")
    )
    # pruned feeds BOTH sides of the pair self-join, and through it the
    # distinct + frequent-items subtrees — unpersisted, the whole
    # scan -> distinct -> item-count -> semi-join chain ran once per
    # side (4 source scans / 2 distinct exchanges in the executed plan;
    # runtime exchange reuse does not cover it because the two sides'
    # projections differ).  Persist the narrow (basket, item) table,
    # materialize the ``size``-row result, release.
    pruned = rows.join(freq_items, "__i").persist()
    a = pruned.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = pruned.select(F.col("__b"), F.col("__i").alias("item_b"))
    pairs = a.join(b, "__b").filter(F.col("item_a") < F.col("item_b"))
    out = (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= F.lit(min_support))
        .orderBy(F.desc("support"), F.asc("item_a"), F.asc("item_b"))
        .limit(size)
    )
    out = out.localCheckpoint(eager=True)
    pruned.unpersist()
    return out


def categorize_text_agg(
    df: DataFrame,
    text_col: str,
    *,
    size: int = 10,
) -> DataFrame:
    """ES ``categorize_text`` aggregation (the ML log-categorizer), the
    deterministic skeleton subset: messages group by their TOKEN
    PATTERN — every number run (ints, decimals) masked to ``#`` — so
    "click id=17 v=3.5" and "click id=99 v=0.1" share one category,
    exactly the log-declustering use ES serves.  (ES uses a drain-like
    tree with similarity thresholds; the masked-skeleton form is the
    deterministic core both agree on for numeric-variance logs, and it
    is one expression + ONE hash agg — no ML state.)

    Output: ``(category, doc_count)``, count desc, category asc."""
    cat = F.regexp_replace(
        F.col(text_col), r"[0-9]+(\.[0-9]+)?", "#"
    ).alias("category")
    return (
        df.select(cat)
        .groupBy("category")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("category"))
        .limit(size)
    )


def graph_explore(
    docs: DataFrame,
    seed_term: str,
    *,
    hops: int = 2,
    top_per_hop: int = 3,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """ES Graph explore (``_graph/explore``): starting from a seed
    term, expand the vertices most SIGNIFICANTLY connected to it (JLH
    against the whole index — the same relevance-not-popularity rule
    the Graph API uses to avoid super-connector terms), then expand
    each discovered vertex in turn, ``hops`` deep with
    ``top_per_hop`` vertices per expansion.

    Plan: per expansion ONE :func:`significant_terms_agg` (two term
    hash aggs + a term join); the frontier between hops is a
    ``hops x top_per_hop``-row driver list (the ES server walks the
    same bounded frontier).  Vertex dedup is against PRIOR hops (seed
    included): expansions within one hop are INDEPENDENT, so the whole
    walk is order-free and a SQL oracle replays it exactly (ES
    additionally dedups within a hop, which depends on its internal
    expansion order — documented variant).

    Output: ``(hop, source, term, doc_count, score)`` edges, ordered
    by (hop, source, score desc, term).
    """
    from bigdatasearchpro_spark.operators.search import keyword_match

    seen = {seed_term}
    frontier = [seed_term]
    edges: "list[tuple[int, str, str, int, float]]" = []
    for hop in range(1, hops + 1):
        prior = set(seen)  # dedup against PRIOR hops only (order-free)
        next_frontier: "list[str]" = []
        for src in frontier:
            fg = keyword_match(docs, src, mode="any", id_col=id_col,
                               text_col=text_col)
            sig = significant_terms_agg(
                fg, docs, text_col=text_col, id_col=id_col,
                size=top_per_hop + len(prior), min_doc_count=min_doc_count,
                round_to=round_to,
            ).collect()
            picked = 0
            for r in sig:
                if r["key"] in prior or picked >= top_per_hop:
                    continue
                picked += 1
                seen.add(r["key"])
                edges.append(
                    (hop, src, r["key"], int(r["doc_count"]),
                     float(r["score"]))
                )
                next_frontier.append(r["key"])
        frontier = sorted(set(next_frontier))
        if not frontier:
            break
    spark = docs.sparkSession
    out = spark.createDataFrame(
        edges, "hop int, source string, term string, doc_count bigint, "
               "score double",
    )
    return out.orderBy("hop", "source", F.desc("score"), "term")


def rate_agg(
    df: DataFrame,
    ts_col: str,
    *,
    bucket_interval: str = "day",
    unit_seconds: int = 3600,
    metrics: "Mapping[str, Column] | None" = None,
) -> DataFrame:
    """ES ``rate`` aggregation (7.6+): inside each date_histogram
    bucket, the doc count normalized to a rate per ``unit_seconds``
    (docs/hour inside day buckets, etc.) — calendar-aware: the divisor
    is each bucket's OWN span (month buckets divide by their real day
    counts).  Same single hash agg as the histogram; the rate is one
    exact integer division per bucket row.

    Output: ``(key, doc_count, rate)``."""
    if bucket_interval not in _CAL:
        raise ValueError(f"unsupported calendar interval: {bucket_interval!r}")
    unit, step = _CAL[bucket_interval]
    grouped = (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("key"))
        .agg(F.count("*").alias("doc_count"), *_metric_cols(metrics))
    )
    span = (
        F.to_unix_timestamp(F.col("key") + F.expr(step))
        - F.to_unix_timestamp(F.col("key"))
    )
    rate = (
        F.col("doc_count").cast("double")
        * F.lit(float(unit_seconds))
        / span.cast("double")
    )
    return grouped.select(
        "key", "doc_count", rate.alias("rate"),
        *[F.col(n) for n in (metrics or {})],
    ).orderBy("key")


def random_sampler_agg(
    df: DataFrame,
    probability_pct: int,
    aggs: "Mapping[str, Column]",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``random_sampler`` aggregation (8.2+): sub-aggregations over
    a probability-sampled subset, results SCALED back by 1/p — the
    way ES makes huge-corpus aggs cheap at a quantified accuracy
    trade.  The sample here is the deterministic portable-hash family
    (md5 bucket < pct — reprocessing-stable and engine-replayable,
    unlike ES's per-shard RNG), so the entry is exact-verifiable while
    keeping the real semantics: estimates = sampled value / p.

    ``aggs`` values must be LINEAR aggregates (count/sum) for the 1/p
    scaling to be an estimator.  Output: one row — the scaled
    estimates plus ``sample_docs``."""
    if not 1 <= probability_pct <= 100:
        raise ValueError("probability_pct must be in 1..100")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(100),
    )
    sampled = df.filter(bucket < F.lit(probability_pct))
    scale = F.lit(100.0) / F.lit(float(probability_pct))
    return sampled.agg(
        F.count("*").alias("sample_docs"),
        *[(c * scale).alias(n) for n, c in aggs.items()],
    )


def bucket_sort_agg(
    buckets: DataFrame,
    sort: "Sequence[Column]",
    *,
    from_: int = 0,
    size: "int | None" = None,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline aggregation: reorder the parent
    aggregation's bucket frame by sibling metrics, then truncate with
    ``from``/``size`` — the ORDER BY ... LIMIT ... OFFSET of the agg
    DSL, applied AFTER all sibling pipeline aggs.

    The input is bucket-cardinality (never corpus rows), so the sort
    is over at most a few thousand rows at any corpus size; with
    ``size`` it plans as a TakeOrdered-style bounded heap rather than
    a full exchange-and-sort."""
    out = buckets.orderBy(*sort)
    if from_:
        out = out.offset(from_)
    if size is not None:
        out = out.limit(size)
    return out


def percentiles_bucket_agg(
    buckets: DataFrame,
    metric: str,
    percents: "Sequence[int]",
) -> DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline aggregation:
    percentiles of a sibling metric ACROSS the parent's buckets.

    Exact nearest-rank (ceil(p/100 * n), 1-indexed) over the sorted
    bucket metric — deterministic and engine-replayable, where ES
    serves the same numbers exactly too (the bucket list is sorted in
    memory, no t-digest).  Ties in ``metric`` are broken by the sorted
    row order being a TOTAL order (metric, then all remaining columns
    are irrelevant because equal metric values are interchangeable for
    a percentile).  The frame is bucket-cardinality, so the single
    unpartitioned window here is bounded by the parent agg's bucket
    count, never by corpus rows."""
    ranked = buckets.select(
        F.col(metric).alias("value"),
        F.row_number()
        .over(Window.orderBy(F.asc(metric)))
        .alias("__rn"),
    )
    n = F.count(F.lit(1)).over(Window.partitionBy())
    ranked = ranked.withColumn("__n", n)
    pcts = F.array(*[F.lit(int(p)) for p in percents])
    want = ranked.select(
        "value", "__rn", "__n", F.explode(pcts).alias("percent")
    )
    # nearest rank = ceil(p*n/100) in pure integer arithmetic:
    # (p*n + 99) // 100, clamped to >= 1 — no float round-trip.
    hit = want.filter(
        F.col("__rn")
        == F.greatest(
            F.lit(1),
            (F.col("percent") * F.col("__n") + F.lit(99)) / F.lit(100),
        ).cast("long")
    )
    return hit.select(
        "percent", F.col("value").alias(f"{metric}_pct")
    ).orderBy("percent")


def moving_percentiles_agg(
    buckets: DataFrame,
    metric: str,
    percents: "Sequence[int]",
    *,
    window: int = 3,
    order_col: str = "key",
    include_current: bool = False,
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation: percentiles of
    ``metric`` over the trailing ``window`` buckets, one column per
    requested percent (``{metric}_p{P}``).  Window semantics mirror
    ``moving_fn`` (``shift: 0`` — the frame ends just BEFORE the
    current bucket; ``include_current`` gives the inclusive form);
    empty-frame buckets get NULL like ES skips them.

    Exact nearest-rank (ceil(p/100 * n), the ``percentiles_bucket``
    rule) over the frame's sorted values — ES serves this from a
    t-digest per frame, but at bucket cardinality the exact answer is
    just as cheap and engine-replayable.  The frame is
    bucket-cardinality and at most ``window`` wide, so the sort is a
    bounded array sort per bucket, never a shuffle."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    hi = 0 if include_current else -1
    lo = hi - window + 1
    w = Window.orderBy(F.asc(order_col)).rowsBetween(lo, hi)
    frame = F.array_sort(F.collect_list(metric).over(w))
    out = buckets.withColumn("__frame", frame)
    n = F.size("__frame")
    for p in percents:
        rank = F.greatest(
            F.lit(1), ((F.lit(int(p)) * n + F.lit(99)) / F.lit(100))
        ).cast("int")
        out = out.withColumn(
            f"{metric}_p{int(p)}",
            F.when(n > 0, F.try_element_at("__frame", rank)),
        )
    return out.drop("__frame")


def variable_width_fine_cells(
    df: DataFrame,
    field: str,
    *,
    fine_buckets: int = 200,
    value_scale: int = 100,
    bounds: "tuple | None" = None,
) -> DataFrame:
    """Phase 1 of :func:`variable_width_histogram_agg` — the entire
    DISTRIBUTED part of the operator, exposed so it can be
    hash-verified against a SQL oracle on its own (the driver-side
    merge in phase 2 is iterative and stays twin-tested): one scalar
    min/max probe (skipped when the caller passes precomputed
    ``bounds`` — the main agg probes once for its degenerate handling
    and must not rescan) + ONE fine fixed-width hash aggregate
    (map-side combine; corpus rows never leave their partitions)
    returning per non-empty cell ``(cell, n, s, mn, mx)`` with ``s``
    the cell sum on an exact integer ``value_scale`` grid
    (floor(x*scale + 0.5) — round-half-toward-+inf, the cross-engine-
    stable grid rule; NOT float round).  Degenerate inputs (empty /
    single-valued) return their one bounded row under the same
    schema."""
    spark = df.sparkSession
    lo, hi = bounds if bounds is not None \
        else df.agg(F.min(field), F.max(field)).first()
    schema = "cell int, n long, s long, mn double, mx double"
    if lo is None:
        return spark.createDataFrame([], schema)
    grid = F.floor(F.col(field) * F.lit(value_scale) + F.lit(0.5)) \
        .cast("long")
    span = float(hi) - float(lo)
    if span <= 0:
        cell = F.lit(0)
    else:
        cell = F.least(
            F.lit(fine_buckets - 1),
            F.floor(
                (F.col(field) - F.lit(float(lo)))
                / F.lit(span)
                * F.lit(fine_buckets)
            ).cast("int"),
        )
    return (
        df.groupBy(cell.alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(grid).alias("s"),
            F.min(F.col(field).cast("double")).alias("mn"),
            F.max(F.col(field).cast("double")).alias("mx"),
        )
        .orderBy("cell")
    )


def variable_width_histogram_agg(
    df: DataFrame,
    field: str,
    target_buckets: int,
    *,
    fine_buckets: int = 200,
    value_scale: int = 100,
) -> DataFrame:
    """ES ``variable_width_histogram``: dynamically-placed buckets that
    adapt to the value distribution (narrow where dense, wide where
    sparse), returning per bucket ``(key, min, max, doc_count)`` with
    ``key`` the bucket centroid.

    ES clusters per-shard with an order-dependent streaming algorithm
    and merges across shards — explicitly non-deterministic.  This
    implementation is the DETERMINISTIC two-phase equivalent shaped
    for scale: (1) one scalar min/max probe + ONE fine fixed-width
    hash aggregate over the corpus (``fine_buckets`` cells, map-side
    combine — corpus rows never leave their partitions); (2) a
    driver-side agglomerative merge over the bounded cell list —
    repeatedly fuse the ADJACENT pair with the smallest centroid gap
    (leftmost on ties) until ``target_buckets`` remain.  Phase 2 works
    on <= ``fine_buckets`` rows regardless of corpus size — the same
    bounded-driver-list contract as the IVF centroid collects.
    Centroids stay exact until the final division: cell sums are
    kept as integers on a ``value_scale`` grid.

    No SQL oracle (the merge is iterative); the registry entry is
    rows-only and the merge math is pinned by a pure-Python twin test
    (tests/test_nested.py)."""
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    if fine_buckets < target_buckets:
        raise ValueError("fine_buckets must be >= target_buckets")
    lo, hi = df.agg(F.min(field), F.max(field)).first()
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], "key double, min double, max double, doc_count long"
        )
    span = float(hi) - float(lo)
    if span <= 0:
        return df.sparkSession.createDataFrame(
            [(float(lo), float(lo), float(hi), df.count())],
            "key double, min double, max double, doc_count long",
        )
    fine = variable_width_fine_cells(
        df, field, fine_buckets=fine_buckets, value_scale=value_scale,
        bounds=(lo, hi),
    ).collect()
    clusters = [
        {"n": r["n"], "s": r["s"], "mn": r["mn"], "mx": r["mx"]}
        for r in fine
    ]
    from fractions import Fraction

    while len(clusters) > target_buckets:
        best, gap = None, None
        for i in range(len(clusters) - 1):
            a, b = clusters[i], clusters[i + 1]
            # centroid gap (s_b/n_b - s_a/n_a) as an exact Fraction —
            # integer-exact comparisons, no float tie ambiguity
            g = Fraction(
                b["s"] * a["n"] - a["s"] * b["n"], a["n"] * b["n"]
            )
            if gap is None or g < gap:
                best, gap = i, g
        a, b = clusters[best], clusters[best + 1]
        clusters[best : best + 2] = [{
            "n": a["n"] + b["n"], "s": a["s"] + b["s"],
            "mn": min(a["mn"], b["mn"]), "mx": max(a["mx"], b["mx"]),
        }]
    rows = [
        (
            (c["s"] / value_scale) / c["n"],
            float(c["mn"]),
            float(c["mx"]),
            int(c["n"]),
        )
        for c in clusters
    ]
    return df.sparkSession.createDataFrame(
        rows, "key double, min double, max double, doc_count long"
    )


def terms_partition_filter(
    field: str,
    partition: int,
    num_partitions: int,
) -> Column:
    """ES ``terms`` aggregation ``include: {partition, num_partitions}``
    — the documented way to page an aggregation over a field whose
    cardinality is too large for one response: the TERM SPACE is hash-
    partitioned and each request aggregates one slice.  Filter:
    ``pmod(xxhash64(field), num_partitions) == partition``.

    This composes as a MAP-SIDE predicate on the scan (like the sliced
    scroll's id hash): each partition's aggregation only shuffles its
    own slice of keys, and the slices are disjoint and exhaustive — at
    100 TB this is the difference between one agg with a billion-key
    hash table and N independent aggs with bounded ones.  ES hashes
    with its own function; xxhash64 is the engine's portable stand-in
    (the CONTRACT — disjoint + exhaustive + deterministic — is what
    the operator pins, and the md5-family twin below is what the
    oracle replays)."""
    if not 0 <= partition < num_partitions:
        raise ValueError(
            f"partition must be in [0, {num_partitions}), got {partition}"
        )
    return F.pmod(F.xxhash64(F.col(field)), F.lit(num_partitions)) == partition


def terms_partition_filter_md5(
    field: str,
    partition: int,
    num_partitions: int,
) -> Column:
    """The portable-hash twin of :func:`terms_partition_filter` (md5
    low-nibble family, same trick as the LSH ``*_md5`` variants) so
    the slice membership itself is oracle-replayable:
    ``substr(md5(field), 1, 8)`` as an unsigned hex int mod
    ``num_partitions``."""
    if not 0 <= partition < num_partitions:
        raise ValueError(
            f"partition must be in [0, {num_partitions}), got {partition}"
        )
    h = F.conv(F.substring(F.md5(F.col(field).cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(num_partitions)) == partition


def composite_histogram_source(
    field: str, interval: float, *, name: "str | None" = None
) -> Column:
    """ES ``composite`` aggregation ``histogram`` source: the bucket
    key is ``floor(value / interval) * interval`` — project it as a
    column and feed the name to :func:`composite_agg` like any other
    source (ES composes terms/histogram/date_histogram sources the
    same way: every source is a per-row key expression, which is
    exactly why the after-key predicate can push map-side)."""
    out = F.floor(F.col(field) / F.lit(float(interval))) * F.lit(
        float(interval)
    )
    return out.alias(name or f"{field}_bucket")


def downsample_tsdb(
    events: DataFrame,
    dims: "list[str]",
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    interval: str = "hour",
    id_col: str = "event_id",
) -> DataFrame:
    """ES TSDB ``downsample`` (the rollup successor): rewrite a raw
    metrics index into ONE summary document per (time-series dimension
    tuple, fixed interval) holding ``doc_count``, ``v_min``/``v_max``,
    an order-independent DECIMAL(18,4) metric sum (re-exposed as a
    2-dp double, the q7 money pattern — double accumulation is
    order-dependent at the last bit), and the gauge semantics'
    ``v_last`` — the value of the LATEST sample in the bucket, ties
    broken on the id column.

    Plan shape (100 TB): one hash aggregate on (dims, bucket) with
    map-side partials for the metric rollup, one window PARTITIONED by
    the same key for the last-sample pick (bucket-sized groups, fully
    parallel, never a global sort), and one key-colocated join of the
    two — both sides shuffle on the identical key so AQE plans a
    single exchange each.  Downsampled output is what the transform
    API would materialize as a summary index.
    """
    bucket = F.date_trunc(interval, F.col(ts_col))
    w = Window.partitionBy(*[F.col(d) for d in dims], bucket).orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    last = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *dims,
            bucket.alias("bucket"),
            F.col(value_col).alias("v_last"),
        )
    )
    agg = events.groupBy(*dims, bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.round(F.sum(F.col(value_col).cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("v_sum"),
    )
    return agg.join(last, [*dims, "bucket"])

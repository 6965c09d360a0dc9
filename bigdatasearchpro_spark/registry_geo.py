"""Registry: geo query family (round-7 verdict ask #4).

The reference's UI forwards queries to Elasticsearch 6.x
(indexView.html:13-19), whose DSL serves ``geo_distance`` /
``geo_bounding_box`` filters and the ``geo_distance`` range
aggregation.  The fixture tables carry no coordinates, so (lat, lon)
are synthesized deterministically from ``c_custkey`` on an exact
0.01-degree grid — the same integer-derivation both engines replay
bit-identically (the f8_url_funcs pattern).

The oracle SQL for the haversine is GENERATED from the same operand
order the Spark expression tree uses (multiply-then-divide radians,
left-associated products, ``12742000.0 * asin(sqrt(least(a, 1.0)))``)
so both engines execute the identical IEEE double op sequence; the
integer-meter floor absorbs the last-ulp libm wiggle.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import geo
from bigdatasearchpro_spark.registry import register
from bigdatasearchpro_spark.sources.files import load_table

# DuckDB parses bare decimal literals as DECIMAL (fixed-point) and the
# pi multiply overflows DECIMAL(18) — every literal in the generated
# haversine is cast to DOUBLE so both engines run IEEE double ops.
_PI = f"CAST({math.pi!r} AS DOUBLE)"

# deterministic 0.01-degree coordinate grid from the customer key
_LAT_SQL = "(((c_custkey * 7919) % 17000) / 100.0 - 85.0)"
_LON_SQL = "(((c_custkey * 104729) % 36000) / 100.0 - 180.0)"


def _lat_col():
    return (
        (F.col("c_custkey") * F.lit(7919)) % F.lit(17000)
    ) / F.lit(100.0) - F.lit(85.0)


def _lon_col():
    return (
        (F.col("c_custkey") * F.lit(104729)) % F.lit(36000)
    ) / F.lit(100.0) - F.lit(180.0)


def _hav_floor_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Floor-int-meters haversine SQL with the EXACT operand order of
    operators/geo.py haversine_m (one source of truth for the tree)."""
    rad = lambda x: (  # noqa: E731
        f"((({x}) * {_PI}) / CAST(180.0 AS DOUBLE))"
    )
    rlat1, rlat2 = rad(lat1), rad(lat2)
    half = "CAST(2.0 AS DOUBLE)"
    dlat2 = f"(({rad(lat2)} - {rad(lat1)}) / {half})"
    dlon2 = f"(({rad(lon2)} - {rad(lon1)}) / {half})"
    a = (
        f"(sin({dlat2}) * sin({dlat2}) + "
        f"cos({rlat1}) * cos({rlat2}) * sin({dlon2}) * sin({dlon2}))"
    )
    return (
        f"CAST(floor(CAST(12742000.0 AS DOUBLE) * "
        f"asin(sqrt(least({a}, CAST(1.0 AS DOUBLE))))) AS BIGINT)"
    )


# origin for the distance entries: fixed literal (Paris), shared by the
# Spark call and the generated oracle
_ORIGIN_LAT, _ORIGIN_LON = 48.85, 2.35
_RADIUS_M = 2_000_000

_DIST_SQL = _hav_floor_sql(
    _LAT_SQL,
    _LON_SQL,
    f"CAST({_ORIGIN_LAT!r} AS DOUBLE)",
    f"CAST({_ORIGIN_LON!r} AS DOUBLE)",
)


@register(
    "l3_geo_bounding_box",
    f"""
    SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
    FROM customer
    WHERE {_LAT_SQL} >= 40.0 AND {_LAT_SQL} <= 60.0
      AND {_LON_SQL} >= -10.0 AND {_LON_SQL} <= 30.0
    ORDER BY c_custkey
    """,
)
def l3_geo_bounding_box(spark, sf_dir):
    """L3 [ES parity]: ``geo_bounding_box`` filter — pure (lat, lon)
    range predicates, Europe-ish box [40..60]x[-10..30].  On stored
    coordinate columns the box reaches the parquet scan as
    PushedFilters (plan-gated in tests/test_plans.py on a written
    fixture; here the coords are derived, so the filter runs right
    above the scan) (operators/geo.py geo_bounding_box)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    return geo.geo_bounding_box(
        cust, "lat", "lon", top=60.0, left=-10.0, bottom=40.0, right=30.0
    ).orderBy("c_custkey")


@register(
    "l3_geo_distance",
    f"""
    WITH d AS (
      SELECT c_custkey, {_DIST_SQL} AS dist_m FROM customer
    )
    SELECT c_custkey, dist_m FROM d
    WHERE dist_m <= {_RADIUS_M}
    ORDER BY dist_m, c_custkey
    """,
)
def l3_geo_distance(spark, sf_dir):
    """L3 [ES parity]: ``geo_distance`` filter — customers within
    2000 km of Paris (48.85, 2.35), integer-meter floored haversine.
    The operator prefilters with a radius-sized bounding box (a
    scan-pushable range predicate; 1% slack makes it a strict superset
    of the circle, so it never changes the answer — the oracle replays
    only the circle), then runs the trig on box survivors only
    (operators/geo.py geo_distance_filter)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    return (
        geo.geo_distance_filter(
            cust, "lat", "lon",
            lat=_ORIGIN_LAT, lon=_ORIGIN_LON, distance_m=_RADIUS_M,
        )
        .select("c_custkey", "dist_m")
        .orderBy("dist_m", "c_custkey")
    )


_GEO_RANGES: "list[tuple[int, int | None]]" = [
    (0, 1_000_000),
    (1_000_000, 3_000_000),
    (3_000_000, 8_000_000),
    (8_000_000, None),
]


@register(
    "l3_agg_geo_distance",
    f"""
    WITH d AS (
      SELECT {_DIST_SQL} AS dist_m FROM customer
    ),
    b AS (
      SELECT CASE
        WHEN dist_m >= 0 AND dist_m < 1000000 THEN 0
        WHEN dist_m >= 1000000 AND dist_m < 3000000 THEN 1
        WHEN dist_m >= 3000000 AND dist_m < 8000000 THEN 2
        WHEN dist_m >= 8000000 THEN 3 END AS __b
      FROM d
    ),
    c AS (
      SELECT __b, count(*)::BIGINT AS doc_count FROM b
      WHERE __b IS NOT NULL GROUP BY __b
    ),
    spec AS (
      SELECT * FROM (VALUES
        (0, '0-1000000',       0::BIGINT,       1000000::BIGINT),
        (1, '1000000-3000000', 1000000::BIGINT, 3000000::BIGINT),
        (2, '3000000-8000000', 3000000::BIGINT, 8000000::BIGINT),
        (3, '8000000-*',       8000000::BIGINT, NULL::BIGINT)
      ) AS t(__b, bucket, from_m, to_m)
    )
    SELECT spec.bucket, spec.from_m, spec.to_m,
           coalesce(c.doc_count, 0) AS doc_count
    FROM spec LEFT JOIN c ON spec.__b = c.__b
    ORDER BY spec.from_m
    """,
)
def l3_agg_geo_distance(spark, sf_dir):
    """L3 [ES parity]: ``geo_distance`` range AGGREGATION — distance
    from Paris bucketed into [0,1000km) [1000,3000) [3000,8000)
    [8000,*) meter ranges, one scan + one hash aggregate; every
    requested range appears even when empty, exactly like the ES
    response shape (operators/geo.py geo_distance_agg)."""
    cust = load_table(spark, sf_dir, "customer").select(
        _lat_col().alias("lat"), _lon_col().alias("lon")
    )
    return geo.geo_distance_agg(
        cust, "lat", "lon",
        lat=_ORIGIN_LAT, lon=_ORIGIN_LON, ranges_m=_GEO_RANGES,
    )


_GT_ZOOM = 4
_GT_N = float(1 << _GT_ZOOM)
_MERC_MAX = "CAST(85.05112878 AS DOUBLE)"
_GT_LAT = (
    f"least(greatest({_LAT_SQL}, -{_MERC_MAX}), {_MERC_MAX})"
)
_GT_RAD = f"((({_GT_LAT}) * {_PI}) / CAST(180.0 AS DOUBLE))"
_GT_MERC = f"ln(tan({_GT_RAD}) + CAST(1.0 AS DOUBLE) / cos({_GT_RAD}))"
_GT_X = (
    f"least(CAST(floor((({_LON_SQL}) + CAST(180.0 AS DOUBLE)) "
    f"/ CAST(360.0 AS DOUBLE) * CAST({_GT_N!r} AS DOUBLE)) AS BIGINT), "
    f"{int(_GT_N) - 1})"
)
_GT_Y = (
    f"least(greatest(CAST(floor((CAST(1.0 AS DOUBLE) - {_GT_MERC} / {_PI}) "
    f"/ CAST(2.0 AS DOUBLE) * CAST({_GT_N!r} AS DOUBLE)) AS BIGINT), 0), "
    f"{int(_GT_N) - 1})"
)


@register(
    "l3_agg_geotile_grid",
    f"""
    WITH t AS (
      SELECT {_GT_X} AS x, {_GT_Y} AS y FROM customer
    )
    SELECT {_GT_ZOOM} || '/' || x || '/' || y AS tile,
           x, y, count(*)::BIGINT AS doc_count
    FROM t GROUP BY x, y
    ORDER BY doc_count DESC, x, y
    LIMIT 10000
    """,
)
def l3_agg_geotile_grid(spark, sf_dir):
    """L3 [ES parity]: ``geotile_grid`` aggregation — points bucketed
    into Web-Mercator z/x/y slippy tiles (zoom 4), ONE hash aggregate,
    buckets ranked by doc_count (x, y tie-break) — the map-heatmap
    aggregation ES serves next to geo_distance.  Tile math is the
    standard public formula (x from lon linear, y from the Mercator
    ln/tan chain, latitude clamped at ±85.05112878 like ES) written
    with a fixed IEEE operand order so the DuckDB oracle replays the
    identical doubles (operators/geo.py geotile_grid_agg)."""
    cust = load_table(spark, sf_dir, "customer").select(
        _lat_col().alias("lat"), _lon_col().alias("lon")
    )
    return geo.geotile_grid_agg(cust, "lat", "lon", zoom=_GT_ZOOM, size=10000)


@register(
    "l3_geo_sort",
    f"""
    WITH d AS (
      SELECT c_custkey, {_DIST_SQL} AS dist_m FROM customer
    )
    SELECT c_custkey, dist_m FROM d
    ORDER BY dist_m, c_custkey
    LIMIT 20
    """,
)
def l3_geo_sort(spark, sf_dir):
    """L3 [ES parity]: ``sort: _geo_distance`` — the 20 customers
    nearest Paris ordered by integer-meter haversine (id tie-break).
    TakeOrderedAndProject, never a global sort (plan-gated in
    tests/test_plans.py) (operators/geo.py nearest_k)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    return geo.nearest_k(
        cust, "lat", "lon",
        lat=_ORIGIN_LAT, lon=_ORIGIN_LON, k=20, id_col="c_custkey",
    ).select("c_custkey", "dist_m")


# ---------------------------------------------------------------- r7b
# Europe-scale hexagon for geo_polygon — big enough that the sparse
# sf0.01 grid lands dozens of points inside (a country-sized polygon
# matches ~0 rows there, a trivially-green check).  Vertices sit at
# x.005-degree offsets, OFF the fixture's 0.01-degree coordinate grid,
# so no point is ever exactly on an edge and strict-vs-inclusive
# cannot differ.
_POLY: "list[tuple[float, float]]" = [
    (65.005, 10.005),
    (55.005, 40.005),
    (35.005, 35.005),
    (30.005, 10.005),
    (36.005, -10.005),
    (55.005, -20.005),
]


def _poly_inside_sql(
    lat_sql: str, lon_sql: str, polygon: "list[tuple[float, float]]"
) -> str:
    """Even-odd ray-casting SQL with the EXACT operand order of
    operators/geo.py polygon_crossing_terms: the edge deltas are
    precomputed PYTHON floats (identical literals on both sides) and
    the runtime ops are only -/*/compare on doubles — exactly rounded,
    so both engines produce bit-identical booleans."""
    d = "CAST({!r} AS DOUBLE)".format
    terms = []
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue
        straddles = f"(({d(y1)} > {lat_sql}) != ({d(y2)} > {lat_sql}))"
        lhs = f"((({lon_sql}) - {d(x1)}) * {d(y2 - y1)})"
        rhs = f"({d(x2 - x1)} * (({lat_sql}) - {d(y1)}))"
        op = "<" if y2 > y1 else ">"
        terms.append(
            f"(CASE WHEN {straddles} AND ({lhs} {op} {rhs}) "
            f"THEN 1 ELSE 0 END)"
        )
    return f"((({' + '.join(terms)}) % 2) = 1)"


@register(
    "l3_geo_polygon",
    f"""
    SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
    FROM customer
    WHERE {_poly_inside_sql(_LAT_SQL, _LON_SQL, _POLY)}
    ORDER BY c_custkey
    """,
)
def l3_geo_polygon(spark, sf_dir):
    """L3 [ES parity]: ``geo_polygon`` filter — customers inside a
    Europe-scale hexagon by even-odd ray casting.  The vertex-hull
    bounding box prefilters (scan-pushable range predicates; an exact
    superset of the polygon, so it never changes the answer — the
    oracle replays only the polygon); the per-edge crossing terms are
    division-free double compares with the inequality direction
    resolved at plan time from the literal vertices
    (operators/geo.py geo_polygon_filter)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    return geo.geo_polygon_filter(
        cust, "lat", "lon", polygon=_POLY
    ).orderBy("c_custkey")


_GH_PRECISION = 2  # 10 bits: 5 lon + 5 lat → 1024 global cells


def _geohash_sql(lat_sql: str, lon_sql: str, precision: int) -> str:
    """Geohash-cell SQL with the EXACT op order of operators/geo.py
    geohash_cell: two exactly-rounded floor chains, then pure integer
    shift/mask interleave and base32 substr — engine-exact."""
    p = int(precision)
    total_bits = 5 * p
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lon_cells, lat_cells = 1 << lon_bits, 1 << lat_bits
    lon_cell = (
        f"CAST(least(floor((({lon_sql}) + CAST(180.0 AS DOUBLE)) "
        f"/ CAST(360.0 AS DOUBLE) * CAST({float(lon_cells)!r} AS DOUBLE)), "
        f"CAST({lon_cells - 1} AS DOUBLE)) AS BIGINT)"
    )
    lat_cell = (
        f"CAST(least(floor((({lat_sql}) + CAST(90.0 AS DOUBLE)) "
        f"/ CAST(180.0 AS DOUBLE) * CAST({float(lat_cells)!r} AS DOUBLE)), "
        f"CAST({lat_cells - 1} AS DOUBLE)) AS BIGINT)"
    )
    code_terms = []
    for k in range(total_bits):
        if k % 2 == 0:
            src, src_bits, idx = lon_cell, lon_bits, k // 2
        else:
            src, src_bits, idx = lat_cell, lat_bits, k // 2
        code_terms.append(
            f"((({src} >> {src_bits - 1 - idx}) & 1) "
            f"* {1 << (total_bits - 1 - k)})"
        )
    code = "(" + " + ".join(code_terms) + ")"
    from bigdatasearchpro_spark.operators.geo import GEOHASH_B32

    chars = [
        f"substr('{GEOHASH_B32}', "
        f"CAST((({code} >> {5 * (p - 1 - g)}) & 31) + 1 AS INT), 1)"
        for g in range(p)
    ]
    return " || ".join(chars)


@register(
    "l3_agg_geohash_grid",
    f"""
    WITH g AS (
      SELECT {_geohash_sql(_LAT_SQL, _LON_SQL, _GH_PRECISION)} AS geohash
      FROM customer
    )
    SELECT geohash, count(*)::BIGINT AS doc_count
    FROM g GROUP BY geohash
    ORDER BY doc_count DESC, geohash
    LIMIT 10000
    """,
)
def l3_agg_geohash_grid(spark, sf_dir):
    """L3 [ES parity]: ``geohash_grid`` aggregation — points bucketed
    by their precision-2 Niemeyer geohash cell, ONE hash aggregate,
    buckets ranked by doc_count (geohash tie-break).  The cell string
    is pure column math (two floors, integer bit interleave, base32
    char lookup) — no UDF, and the DuckDB oracle replays the identical
    integer ops (operators/geo.py geohash_grid_agg)."""
    cust = load_table(spark, sf_dir, "customer").select(
        _lat_col().alias("lat"), _lon_col().alias("lon")
    )
    return geo.geohash_grid_agg(
        cust, "lat", "lon", precision=_GH_PRECISION, size=10000
    )


@register(
    "l3_agg_geo_bounds_centroid",
    f"""
    WITH p AS (
      SELECT c_nationkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
      FROM customer
    )
    SELECT c_nationkey,
           max(lat) AS top, min(lat) AS bottom,
           min(lon) AS "left", max(lon) AS "right",
           CAST(sum(CAST(round(lat * CAST(100.0 AS DOUBLE)) AS BIGINT))
                AS DOUBLE)
             / (CAST(100.0 AS DOUBLE) * CAST(count(*) AS DOUBLE))
             AS centroid_lat,
           CAST(sum(CAST(round(lon * CAST(100.0 AS DOUBLE)) AS BIGINT))
                AS DOUBLE)
             / (CAST(100.0 AS DOUBLE) * CAST(count(*) AS DOUBLE))
             AS centroid_lon,
           count(*)::BIGINT AS doc_count
    FROM p GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def l3_agg_geo_bounds_centroid(spark, sf_dir):
    """L3 [ES parity]: ``geo_bounds`` + ``geo_centroid`` aggregations
    per nation in ONE hash aggregate.  The centroid dodges
    nondeterministic distributed float summation: coordinates are
    rounded to exact integer centi-degrees (lossless on the fixture's
    0.01-degree grid), summed as bigints, and divided ONCE — a single
    exactly-rounded double op both engines replay bit-identically
    (operators/geo.py geo_bounds_centroid_agg)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    return geo.geo_bounds_centroid_agg(
        cust, "lat", "lon", group_cols=["c_nationkey"]
    )


# event-side coordinate grid (same derivation family as customers)
_EV_LAT_SQL = "(((event_id * 7919) % 17000) / 100.0 - 85.0)"
_EV_LON_SQL = "(((event_id * 104729) % 36000) / 100.0 - 180.0)"

_FENCES: "list[tuple[str, float, float, int]]" = [
    ("paris_2000km", 48.85, 2.35, 2_000_000),
    ("sydney_1500km", -33.85, 151.25, 1_500_000),
]


def _fence_union_sql() -> str:
    arms = []
    for name, la, lo, r in _FENCES:
        dist = _hav_floor_sql(
            _EV_LAT_SQL, _EV_LON_SQL,
            f"CAST({la!r} AS DOUBLE)", f"CAST({lo!r} AS DOUBLE)",
        )
        arms.append(
            f"SELECT '{name}' AS fence, event_id, {dist} AS dist_m "
            f"FROM events WHERE {dist} <= {r}"
        )
    return " UNION ALL ".join(arms)


@register(
    "st11_streaming_geo_fence",
    f"""
    SELECT fence, event_id, dist_m FROM ({_fence_union_sql()})
    ORDER BY fence, event_id
    """,
)
def st11_streaming_geo_fence(spark, sf_dir):
    """§2.9 + geo: streaming GEO-FENCE alerting run as a REAL stream —
    the events fixture staged as 3 time-ordered micro-batch files,
    each event's (lat, lon) checked against two named distance fences
    (box-prefiltered haversine, the same stateless column math as the
    batch ``geo_distance`` filter — stateless ops run unchanged on a
    stream).  Append mode: every alert emits exactly once in its
    micro-batch, so the final alert SET equals the batch filter, which
    the DuckDB oracle replays with the generated same-operand-order
    haversine (operators/geo.py geo_distance_filter over
    streaming/pipelines.py events_stream)."""
    import shutil
    import tempfile

    from bigdatasearchpro_spark.streaming.pipelines import (
        events_stream,
        run_to_completion,
        stage_time_sliced_replay,
    )

    events = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="st11_src_")
    ck = tempfile.mkdtemp(prefix="st11_ck_")
    try:
        stage_time_sliced_replay(events, src, n_slices=3)
        stream = events_stream(
            spark, src, max_files_per_trigger=1
        ).select(
            "event_id",
            (
                (F.col("event_id") * F.lit(7919)) % F.lit(17000)
                / F.lit(100.0) - F.lit(85.0)
            ).alias("lat"),
            (
                (F.col("event_id") * F.lit(104729)) % F.lit(36000)
                / F.lit(100.0) - F.lit(180.0)
            ).alias("lon"),
        )
        alerts = None
        for name, la, lo, r in _FENCES:
            arm = geo.geo_distance_filter(
                stream, "lat", "lon", lat=la, lon=lo, distance_m=r
            ).select(
                F.lit(name).alias("fence"), "event_id", "dist_m"
            )
            alerts = arm if alerts is None else alerts.unionByName(arm)
        got = run_to_completion(
            alerts, checkpoint_dir=ck, output_mode="append"
        )
        rows = got.orderBy("fence", "event_id").collect()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.createDataFrame(
        rows, "fence string, event_id bigint, dist_m bigint"
    )


@register(
    "l3_agg_geo_line",
    f"""
    WITH p AS (
      SELECT user_id, ts, {_EV_LAT_SQL} AS lat, {_EV_LON_SQL} AS lon
      FROM events
    ),
    r AS (
      SELECT user_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, lat, lon
             ) AS seq,
             lat, lon
      FROM p
    )
    SELECT user_id, seq, lat, lon FROM r WHERE seq <= 5
    ORDER BY user_id, seq
    """,
)
def l3_agg_geo_line(spark, sf_dir):
    """L3 [ES parity]: ``geo_line`` aggregation — each user's first 5
    track points in timestamp order (ES sorts the LineString by a sort
    field and truncates at ``size``), unpivoted to one scalar row per
    point.  ONE window partitioned by the entity — per-user rank, no
    global sort, skew bounded by ``size``
    (operators/geo.py geo_line_agg)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts",
        (
            (F.col("event_id") * F.lit(7919)) % F.lit(17000)
            / F.lit(100.0) - F.lit(85.0)
        ).alias("lat"),
        (
            (F.col("event_id") * F.lit(104729)) % F.lit(36000)
            / F.lit(100.0) - F.lit(180.0)
        ).alias("lon"),
    )
    return geo.geo_line_agg(
        ev, "lat", "lon", group_col="user_id", sort_col="ts", size=5
    ).orderBy("user_id", "seq")


_DECAY_SCALE = 6_000_000.0  # linear: scale 3000 km, decay 0.5 -> s = 6000 km


def _decay_sql(dist_sql: str) -> str:
    """Linear-decay SQL with the EXACT op order of search.decay_expr
    (origin 0, offset 0) followed by the entry's 1e6 floor grid."""
    dd = "CAST(0.0 AS DOUBLE)"
    d = (
        f"greatest(abs(CAST({dist_sql} AS DOUBLE) - {dd}) - {dd}, {dd})"
    )
    s = f"CAST({_DECAY_SCALE!r} AS DOUBLE)"
    mult = f"greatest(({s} - {d}) / {s}, {dd})"
    return f"CAST(floor({mult} * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"


@register(
    "l3_function_score_decay",
    f"""
    WITH d AS (
      SELECT c_custkey, {_DIST_SQL} AS dist_m FROM customer
    )
    SELECT c_custkey, dist_m, {_decay_sql("dist_m")} AS decay_e6
    FROM d
    ORDER BY decay_e6 DESC, c_custkey ASC
    LIMIT 20
    """,
)
def l3_function_score_decay(spark, sf_dir):
    """L3 [ES parity]: ``function_score`` DECAY scoring — the linear
    distance-decay multiplier (scale 3000 km, decay 0.5 at the scale
    edge: the ES gauss/exp/linear family's exactly-replayable member)
    over the haversine distance from Paris, floored onto a 1e-6 grid.
    Every op after the integer distance is exactly-rounded IEEE
    (abs/sub/div/max/floor), so both engines produce identical
    multipliers; exp/gauss share the same code path and are pinned in
    pytest against python math (operators/search.py decay_expr)."""
    from bigdatasearchpro_spark.operators.search import decay_expr

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    d = cust.select(
        "c_custkey",
        geo.haversine_m_floor(
            F.col("lat"), F.col("lon"), _ORIGIN_LAT, _ORIGIN_LON
        ).alias("dist_m"),
    )
    mult = decay_expr(
        F.col("dist_m"), scale=_DECAY_SCALE / 2.0, decay=0.5, kind="linear"
    )
    return (
        d.select(
            "c_custkey",
            "dist_m",
            F.floor(mult * F.lit(1_000_000.0)).cast("bigint").alias("decay_e6"),
        )
        .orderBy(F.desc("decay_e6"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------- r9
# ES `_mvt` vector-tile search (the last r8-verdict "missing" item).
# Tile z=1/x=0/y=0 (lon [-180, 0), lat [0, 85.05]) over the synthetic
# customer grid; grid_precision 3 (8x8 cells, 512 px each), 50 hits.

_MVT_Z, _MVT_X, _MVT_Y = 1, 0, 0
_MVT_GP, _MVT_EXTENT, _MVT_SIZE = 3, 4096, 50


def _gt_xy_sql(zoom: int) -> "tuple[str, str]":
    """The geotile_xy floor chain as DuckDB SQL at an arbitrary zoom —
    same generated-from-one-operand-order scheme as _GT_X/_GT_Y."""
    n = float(1 << zoom)
    xs = (
        f"least(CAST(floor((({_LON_SQL}) + CAST(180.0 AS DOUBLE)) "
        f"/ CAST(360.0 AS DOUBLE) * CAST({n!r} AS DOUBLE)) AS BIGINT), "
        f"{int(n) - 1})"
    )
    ys = (
        f"least(greatest(CAST(floor((CAST(1.0 AS DOUBLE) - {_GT_MERC} "
        f"/ {_PI}) / CAST(2.0 AS DOUBLE) * CAST({n!r} AS DOUBLE)) "
        f"AS BIGINT), 0), {int(n) - 1})"
    )
    return xs, ys


def _mvt_oracle() -> str:
    z, x, y = _MVT_Z, _MVT_X, _MVT_Y
    gp, extent, size = _MVT_GP, _MVT_EXTENT, _MVT_SIZE
    cells = 1 << gp
    cell_px = extent // cells
    tx, ty = _gt_xy_sql(z)
    cxs, cys = _gt_xy_sql(z + gp)
    n = float(1 << z)
    lon_glob = (
        f"((({_LON_SQL}) + CAST(180.0 AS DOUBLE)) / CAST(360.0 AS DOUBLE) "
        f"* CAST({n!r} AS DOUBLE))"
    )
    lat_glob = (
        f"((CAST(1.0 AS DOUBLE) - {_GT_MERC} / {_PI}) "
        f"/ CAST(2.0 AS DOUBLE) * CAST({n!r} AS DOUBLE))"
    )
    px = (
        f"least(greatest(CAST(floor(({lon_glob} - CAST({float(x)!r} AS "
        f"DOUBLE)) * CAST({float(extent)!r} AS DOUBLE)) AS BIGINT), 0), "
        f"{extent - 1})"
    )
    py = (
        f"least(greatest(CAST(floor(({lat_glob} - CAST({float(y)!r} AS "
        f"DOUBLE)) * CAST({float(extent)!r} AS DOUBLE)) AS BIGINT), 0), "
        f"{extent - 1})"
    )
    return f"""
    WITH in_tile AS (
      SELECT c_custkey,
             least(greatest(({cxs}) - {x * cells}, 0), {cells - 1}) AS gx,
             least(greatest(({cys}) - {y * cells}, 0), {cells - 1}) AS gy,
             {px} AS hpx, {py} AS hpy
      FROM customer
      WHERE ({tx}) = {x} AND ({ty}) = {y}
    ),
    aggs AS (
      SELECT 'aggs' AS layer,
             (gx * {cell_px} + {cell_px // 2})::BIGINT AS px,
             (gy * {cell_px} + {cell_px // 2})::BIGINT AS py,
             count(*)::BIGINT AS doc_count,
             CAST(NULL AS VARCHAR) AS feature_id
      FROM in_tile GROUP BY gx, gy
    ),
    hits AS (
      SELECT 'hits' AS layer, hpx AS px, hpy AS py,
             CAST(NULL AS BIGINT) AS doc_count,
             CAST(c_custkey AS VARCHAR) AS feature_id
      FROM in_tile
      ORDER BY CAST(c_custkey AS VARCHAR) ASC
      LIMIT {size}
    ),
    meta AS (
      SELECT 'meta' AS layer, 0::BIGINT AS px, 0::BIGINT AS py,
             max(doc_count)::BIGINT AS doc_count,
             CAST(NULL AS VARCHAR) AS feature_id
      FROM aggs
    )
    SELECT * FROM aggs
    UNION ALL SELECT * FROM hits
    UNION ALL SELECT * FROM meta
    """


@register("l3_search_mvt", _mvt_oracle())
def l3_search_mvt(spark, sf_dir):
    """L3 [ES parity]: ``_mvt`` vector-tile search (ES 7.15+, the map
    surface of the reference's geo results) — the DISTRIBUTED half:
    tile z/x/y membership (scan-pushable bbox prefilter + exact
    geotile floor-chain equality), the ``geotile_grid`` cell aggregate
    at z+grid_precision with tile-local cell-center pixel coords, the
    ``size``-hit page with extent-coordinate point projection, and the
    meta max-count bound — one scan, bounded outputs.  The MVT 2.1
    protobuf encoding of these rows (api.search_mvt) is byte-level
    round-trip-tested in tests/test_geo.py (operators/mvt.py)."""
    from bigdatasearchpro_spark.operators.mvt import mvt_feature_rows

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )
    return mvt_feature_rows(
        cust, "lat", "lon", _MVT_Z, _MVT_X, _MVT_Y, id_col="c_custkey",
        extent=_MVT_EXTENT, grid_precision=_MVT_GP, size=_MVT_SIZE,
    )


# Part 8 (relational ES surfaces: parent-child, scripting DSL, IP
# ring, wrapper, span dedup) registers itself on import.
from bigdatasearchpro_spark import registry_relations  # noqa: E402,F401

"""Geo query family — the ES 6.x surface the reference delegates to.

The reference's search box forwards ``?q=`` / DSL queries verbatim to
Elasticsearch (indexView.html:13-19), whose 6.x query DSL serves
``geo_distance`` / ``geo_bounding_box`` filters and the
``geo_distance`` range aggregation on any ``geo_point`` field.  This
module re-expresses that surface as plain ``pyspark.sql.functions``
column math — no UDFs, whole-stage-codegen throughout:

- :func:`haversine_m` — great-circle distance in meters as one
  expression tree (radians → haversine → asin → scale).  The operand
  order is fixed (``deg * pi / 180`` — multiply then divide) so an
  oracle engine replaying the same IEEE double ops gets bit-identical
  intermediate values; the only cross-engine wiggle is the last ulp of
  libm sin/asin, which the integer-meter floor makes irrelevant in
  practice.
- :func:`geo_bounding_box` — pure range predicates on (lat, lon).  On
  a table with STORED coordinate columns the box pushes down to the
  parquet scan (plan-gated in tests/test_plans.py).
- :func:`geo_distance_filter` — ES ``geo_distance`` semantics: a
  cheap bounding-box PREFILTER (side length derived from the radius,
  computed driver-side so both engines compare against identical
  literals) rejects the far field before the trig runs; the haversine
  predicate touches only box survivors.  At 100 TB the box is the
  difference between trig-on-everything and trig-on-a-neighborhood.
- :func:`geo_distance_agg` — the ``geo_distance`` range aggregation:
  one scan, distance bucketed by integer-meter thresholds, one hash
  aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EARTH_RADIUS_M = 6371000.0

# meters per degree of latitude (and of longitude at the equator) on
# the 6371 km sphere — used only for the bounding-box PREfilter, which
# is deliberately slightly generous (never excludes a true match).
_M_PER_DEG = EARTH_RADIUS_M * math.pi / 180.0


def _rad(deg: Column | float) -> Column:
    # multiply-then-divide, the same literal op order the oracle uses
    return (F.lit(deg) if isinstance(deg, (int, float)) else deg) * F.lit(
        math.pi
    ) / F.lit(180.0)


def haversine_m(
    lat1: Column | float,
    lon1: Column | float,
    lat2: Column | float,
    lon2: Column | float,
) -> Column:
    """Great-circle distance in METERS (double) between two (lat, lon)
    degree coordinates — the standard haversine on the 6371 km sphere,
    as a single JVM-side expression tree."""
    rlat1, rlat2 = _rad(lat1), _rad(lat2)
    dlat2 = (_rad(lat2) - _rad(lat1)) / F.lit(2.0)
    dlon2 = (_rad(lon2) - _rad(lon1)) / F.lit(2.0)
    a = F.sin(dlat2) * F.sin(dlat2) + F.cos(rlat1) * F.cos(rlat2) * F.sin(
        dlon2
    ) * F.sin(dlon2)
    # clamp for fp drift at antipodes before asin
    a = F.least(a, F.lit(1.0))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m_floor(
    lat1: Column | float,
    lon1: Column | float,
    lat2: Column | float,
    lon2: Column | float,
) -> Column:
    """:func:`haversine_m` floored to integer meters (bigint) — the
    hash-stable form registry entries project."""
    return F.floor(haversine_m(lat1, lon1, lat2, lon2)).cast("bigint")


def geo_bounding_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> DataFrame:
    """ES ``geo_bounding_box`` filter: keep rows whose point falls in
    the [bottom..top] x [left..right] degree box (edges inclusive,
    like ES).  Pure range predicates — on stored columns they reach
    the parquet scan as PushedFilters.  Boxes crossing the antimeridian
    (left > right) split into two lon ranges, still scan-pushable."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    lat_pred = (lat >= F.lit(bottom)) & (lat <= F.lit(top))
    if left <= right:
        lon_pred = (lon >= F.lit(left)) & (lon <= F.lit(right))
    else:  # antimeridian crossing: e.g. left=170, right=-170
        lon_pred = (lon >= F.lit(left)) | (lon <= F.lit(right))
    return df.filter(lat_pred & lon_pred)


def _box_deltas(lat: float, distance_m: float) -> tuple[float, float]:
    """Degree half-sides of a box guaranteed to contain the
    ``distance_m`` circle around latitude ``lat``.

    The latitude half-side is the meridian arc r/R.  The LONGITUDE
    half-side is NOT r/(deg·cos(lat)) — that is the circle's lon span
    at the center latitude only; meridians converge away from the
    equator, so the circle bulges wider in longitude at its
    poleward-side latitudes.  The exact bound (the standard bounding-
    coordinates construction) is asin(sin(r/R)/cos(lat)); using the
    naive formula clipped true matches near the circle's E/W extremes
    once the radius got large (the st11 sf1 regression: 49 events at
    1.98-2.0 Mm of a 2 Mm Paris fence, invisible on the sparse sf0.01
    grid).  A circle reaching a pole spans every longitude.  1% slack
    keeps float edges safely inside."""
    ang = distance_m / EARTH_RADIUS_M  # central angle, radians
    dlat = math.degrees(ang) * 1.01
    if abs(lat) + math.degrees(ang) >= 89.99:
        return dlat, 180.0  # circle reaches a pole: all longitudes
    s = math.sin(min(ang, math.pi / 2)) / max(
        math.cos(math.radians(lat)), 1e-9
    )
    if s >= 1.0:
        return dlat, 180.0
    dlon = min(math.degrees(math.asin(s)) * 1.01, 180.0)
    return dlat, dlon


def geo_distance_filter(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    lat: float,
    lon: float,
    distance_m: float,
    prefilter: bool = True,
) -> DataFrame:
    """ES ``geo_distance`` filter: rows within ``distance_m`` meters of
    (``lat``, ``lon``).  With ``prefilter`` (default) a bounding box
    sized from the radius rejects the far field first — the box is a
    scan-pushable range predicate, so the haversine trig only runs on
    the survivors (the plan shape that matters when the circle covers
    a city and the table covers the planet)."""
    if not math.isfinite(distance_m) or distance_m <= 0:
        raise ValueError(f"distance_m must be positive, got {distance_m}")
    out = df
    if prefilter and distance_m < 0.5 * math.pi * EARTH_RADIUS_M:
        dlat, dlon = _box_deltas(lat, distance_m)
        out = geo_bounding_box(
            out, lat_col, lon_col,
            top=lat + dlat, bottom=lat - dlat,
            left=max(lon - dlon, -180.0) if dlon < 180.0 else -180.0,
            right=min(lon + dlon, 180.0) if dlon < 180.0 else 180.0,
        )
    dist = haversine_m_floor(F.col(lat_col), F.col(lon_col), lat, lon)
    return out.withColumn("dist_m", dist).filter(
        F.col("dist_m") <= F.lit(int(distance_m))
    )


def geo_distance_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    lat: float,
    lon: float,
    ranges_m: "list[tuple[int, int | None]]",
) -> DataFrame:
    """ES ``geo_distance`` range aggregation: one scan computing the
    integer-meter distance to the origin, bucketed into the given
    ``[from, to)`` meter ranges (``to=None`` = unbounded, like ES),
    then ONE hash aggregate.  Rows outside every range are dropped
    (ES keyed-range behavior).  Output: (bucket, from_m, to_m,
    doc_count) sorted by from_m; empty ranges still appear with
    doc_count 0, exactly like ES returns every requested range."""
    if not ranges_m:
        raise ValueError("ranges_m must be non-empty")
    dist = haversine_m_floor(F.col(lat_col), F.col(lon_col), lat, lon)
    staged = df.select(dist.alias("__d"))
    bucket = None
    for i, (lo, hi) in enumerate(ranges_m):
        cond = F.col("__d") >= F.lit(int(lo))
        if hi is not None:
            cond = cond & (F.col("__d") < F.lit(int(hi)))
        bucket = (
            F.when(cond, F.lit(i))
            if bucket is None
            else bucket.when(cond, F.lit(i))
        )
    counted = (
        staged.select(bucket.alias("__b"))
        .filter(F.col("__b").isNotNull())
        .groupBy("__b")
        .agg(F.count("*").alias("doc_count"))
    )
    spark = df.sparkSession
    spec = spark.createDataFrame(
        [
            (
                i,
                f"{lo}-{hi if hi is not None else '*'}",
                int(lo),
                None if hi is None else int(hi),
            )
            for i, (lo, hi) in enumerate(ranges_m)
        ],
        "__b int, bucket string, from_m bigint, to_m bigint",
    )
    return (
        spec.join(counted, "__b", "left")
        .select(
            "bucket",
            "from_m",
            "to_m",
            F.coalesce("doc_count", F.lit(0)).alias("doc_count"),
        )
        .orderBy("from_m")
    )


# Web-Mercator latitude clamp (ES geotile_grid uses the same bound)
MERCATOR_LAT_MAX = 85.05112878


def geotile_xy(
    lat: Column | float, lon: Column | float, zoom: int
) -> "tuple[Column, Column]":
    """ES ``geotile_grid`` cell math — standard slippy-map tiles:
    ``x = floor((lon+180)/360 * 2^z)``, ``y`` from the Web-Mercator
    projection, latitude clamped to ±85.05112878 like ES.  Pure
    column math (one ln/tan/cos chain), written with a fixed operand
    order so an oracle engine replays the identical IEEE doubles."""
    if not (0 <= int(zoom) <= 29):
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    n = float(1 << int(zoom))
    lon_c = F.lit(lon) if isinstance(lon, (int, float)) else lon
    lat_c = F.lit(lat) if isinstance(lat, (int, float)) else lat
    lat_cl = F.least(
        F.greatest(lat_c, F.lit(-MERCATOR_LAT_MAX)), F.lit(MERCATOR_LAT_MAX)
    )
    x = F.floor((lon_c + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("bigint")
    # clamp x for lon == 180.0 exactly (ES wraps into the last tile)
    x = F.least(x, F.lit(int(n) - 1)).cast("bigint")
    rad = lat_cl * F.lit(math.pi) / F.lit(180.0)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    y = F.floor(
        (F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
    ).cast("bigint")
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1)).cast("bigint")
    return x, y


def geotile_grid_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    zoom: int = 6,
    size: int = 100,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation: bucket points into z/x/y
    Web-Mercator tiles at the given ``zoom``, ONE hash aggregate, top
    ``size`` buckets by doc_count (key tie-break for determinism) —
    the map-heatmap aggregation.  Output: (tile, x, y, doc_count)."""
    x, y = geotile_xy(F.col(lat_col), F.col(lon_col), zoom)
    return (
        df.select(x.alias("x"), y.alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("doc_count"))
        .select(
            F.concat_ws(
                "/", F.lit(int(zoom)), F.col("x"), F.col("y")
            ).alias("tile"),
            "x", "y", "doc_count",
        )
        .orderBy(F.desc("doc_count"), F.asc("x"), F.asc("y"))
        .limit(size)
    )


def polygon_crossing_terms(
    py: Column, px: Column, polygon: "list[tuple[float, float]]"
) -> "list[Column]":
    """One boolean Column per polygon edge: does a rightward ray from
    (``py``, ``px``) cross that edge?  Classic PNPOLY even-odd ray
    casting, with the division multiplied through: because the
    vertices are LITERALS, the sign of ``(y2 - y1)`` is known at plan
    time and the inequality direction is baked per edge — the runtime
    expression uses only ``-``/``*``/compare on doubles, all exactly
    rounded under IEEE-754, so any engine replaying the same operand
    order produces bit-identical booleans (no trig, no division, no
    floor-grid needed).  Horizontal edges (y1 == y2) never cross a
    horizontal ray and are skipped."""
    if len(polygon) < 3:
        raise ValueError(f"polygon needs >= 3 vertices, got {len(polygon)}")
    terms: "list[Column]" = []
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue
        straddles = (F.lit(y1) > py) != (F.lit(y2) > py)
        lhs = (px - F.lit(x1)) * F.lit(y2 - y1)
        rhs = F.lit(x2 - x1) * (py - F.lit(y1))
        # px < (x2-x1)*(py-y1)/(y2-y1) + x1, multiplied through by
        # (y2-y1) with the flip resolved at plan time from the literal
        cross = (lhs < rhs) if y2 > y1 else (lhs > rhs)
        terms.append(straddles & cross)
    return terms


def geo_polygon_filter(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    polygon: "list[tuple[float, float]]",
    prefilter: bool = True,
) -> DataFrame:
    """ES ``geo_polygon`` filter: keep rows whose point falls inside
    the closed polygon (list of (lat, lon) vertices, auto-closed) by
    even-odd ray casting.  A bounding box over the vertex extremes
    prefilters first — pure range predicates that reach a parquet scan
    on stored columns, so the per-edge terms only run on box survivors
    (the box is exact on the vertex hull, hence a superset of the
    polygon — never excludes a true match)."""
    lats = [v[0] for v in polygon]
    lons = [v[1] for v in polygon]
    out = df
    if prefilter:
        out = geo_bounding_box(
            out, lat_col, lon_col,
            top=max(lats), bottom=min(lats),
            left=min(lons), right=max(lons),
        )
    terms = polygon_crossing_terms(
        F.col(lat_col), F.col(lon_col), polygon
    )
    crossings = None
    for t in terms:
        c = t.cast("int")
        crossings = c if crossings is None else crossings + c
    return out.filter(crossings % F.lit(2) == F.lit(1))


# geohash base32 alphabet (public Niemeyer encoding — no a/i/l/o)
GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell(
    lat: Column, lon: Column, precision: int = 5
) -> Column:
    """Geohash string of the point at the given ``precision``
    (1..12 chars) — the cell key ES ``geohash_grid`` buckets on.

    Pure column math, no UDF: the lon/lat fractions are quantized to
    integer cells (``floor`` of one exactly-rounded ``+ / *`` chain —
    bit-identical across engines), the cell bits are interleaved
    lon-first with integer shift/mask ops, and each 5-bit group indexes
    a base32 char array.  Everything after the two floors is integer
    arithmetic, so the string is exact on any engine."""
    p = int(precision)
    if not (1 <= p <= 12):
        raise ValueError(f"precision must be in [1, 12], got {p}")
    total_bits = 5 * p
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lon_cells = 1 << lon_bits
    lat_cells = 1 << lat_bits
    lon_cell = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(lon_cells))),
        F.lit(lon_cells - 1),
    ).cast("bigint")
    lat_cell = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(lat_cells))),
        F.lit(lat_cells - 1),
    ).cast("bigint")
    # interleave: code bit (total_bits-1-k) takes lon for even k,
    # lat for odd k, MSB first on both axes
    code = None
    for k in range(total_bits):
        if k % 2 == 0:  # lon bit, MSB first
            src, src_bits, idx = lon_cell, lon_bits, k // 2
        else:
            src, src_bits, idx = lat_cell, lat_bits, k // 2
        bit = F.shiftright(src, src_bits - 1 - idx).bitwiseAND(F.lit(1))
        term = bit * F.lit(1 << (total_bits - 1 - k))
        code = term if code is None else code + term
    chars = F.array(*[F.lit(c) for c in GEOHASH_B32])
    out = None
    for g in range(p):
        five = F.shiftright(code, 5 * (p - 1 - g)).bitwiseAND(F.lit(31))
        ch = F.element_at(chars, (five + F.lit(1)).cast("int"))
        out = ch if out is None else F.concat(out, ch)
    return out


def geohash_grid_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    precision: int = 5,
    size: int = 100,
) -> DataFrame:
    """ES ``geohash_grid`` aggregation: bucket points by their geohash
    cell at ``precision``, ONE hash aggregate, top ``size`` buckets by
    doc_count (key tie-break for determinism).  Output:
    (geohash, doc_count)."""
    cell = geohash_cell(F.col(lat_col), F.col(lon_col), precision)
    return (
        df.select(cell.alias("geohash"))
        .groupBy("geohash")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("geohash"))
        .limit(size)
    )


def geo_bounds_centroid_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    group_cols: "list[str]",
    cdeg_scale: int = 100,
) -> DataFrame:
    """ES ``geo_bounds`` + ``geo_centroid`` aggregations per group:
    the tight bounding box (top/bottom/left/right) and the arithmetic
    centroid of each group's points, in ONE hash aggregate.

    The centroid avoids distributed float summation (whose partial
    order is nondeterministic): coordinates are rounded to integer
    ``1/cdeg_scale``-degree units first, summed exactly as bigints,
    and divided ONCE at the end — a single exactly-rounded double op,
    so the result is bit-stable across runs and engines.  Fixture
    coordinates sit on a 0.01-degree grid, so ``cdeg_scale=100`` is
    lossless there; for free-form coordinates pick the scale matching
    the stored precision."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    s = F.lit(float(cdeg_scale))
    lat_i = F.round(lat * s, 0).cast("bigint")
    lon_i = F.round(lon * s, 0).cast("bigint")
    return (
        df.groupBy(*group_cols)
        .agg(
            F.max(lat).alias("top"),
            F.min(lat).alias("bottom"),
            F.min(lon).alias("left"),
            F.max(lon).alias("right"),
            F.sum(lat_i).alias("__slat"),
            F.sum(lon_i).alias("__slon"),
            F.count("*").alias("doc_count"),
        )
        .select(
            *group_cols,
            "top", "bottom", "left", "right",
            (
                F.col("__slat").cast("double")
                / (s * F.col("doc_count").cast("double"))
            ).alias("centroid_lat"),
            (
                F.col("__slon").cast("double")
                / (s * F.col("doc_count").cast("double"))
            ).alias("centroid_lon"),
            "doc_count",
        )
        .orderBy(*group_cols)
    )


def nearest_k(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    lat: float,
    lon: float,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``sort: _geo_distance`` — the k rows nearest to (lat, lon),
    ordered by integer-meter distance (id tie-break for determinism).
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each
    partition keeps a k-heap and only k rows per partition reach the
    driver-side merge — no global sort at any scale (plan-gated)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    dist = haversine_m_floor(F.col(lat_col), F.col(lon_col), lat, lon)
    return (
        df.withColumn("dist_m", dist)
        .orderBy(F.asc("dist_m"), F.asc(id_col))
        .limit(k)
    )


def geo_line_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    *,
    group_col: str,
    sort_col: str,
    size: int = 250,
) -> DataFrame:
    """ES ``geo_line`` aggregation: per group, the first ``size``
    points ordered by ``sort_col`` (ES sorts the LineString by a sort
    field and truncates at ``size``, default 250) — the per-entity
    track/trajectory aggregation.  Unpivoted to one row per retained
    point (``(group, seq, lat, lon)``) so the result stays scalar and
    hash-comparable; a caller wanting the LineString array collects
    per group.  Plan: ONE window partitioned by the group (per-entity
    rank, no global sort; skew bounded by ``size``)."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    w = Window.partitionBy(F.col(group_col)).orderBy(
        F.asc(sort_col), F.asc(lat_col), F.asc(lon_col)
    )
    return (
        df.withColumn("seq", F.row_number().over(w))
        .filter(F.col("seq") <= size)
        .select(group_col, "seq", lat_col, lon_col)
    )


def envelope_relation(
    minlat: Column, maxlat: Column, minlon: Column, maxlon: Column,
    query_env: "tuple[float, float, float, float]",
    relation: str = "intersects",
) -> Column:
    """ES ``geo_shape`` query for ENVELOPE geometries: the three
    public spatial relations between a stored box and the query box
    (``intersects`` default, ``within`` = stored inside query,
    ``contains`` = stored contains query).  Axis-aligned boxes make
    every relation four comparisons — pure scan-pushable column math
    on the same coordinate grid the geo ring already uses (disjoint
    is intersects' negation, the standard interval-overlap test).

    ``query_env`` = (minlat, maxlat, minlon, maxlon)."""
    qminlat, qmaxlat, qminlon, qmaxlon = (float(v) for v in query_env)
    if relation == "intersects":
        return (
            (minlat <= F.lit(qmaxlat)) & (maxlat >= F.lit(qminlat))
            & (minlon <= F.lit(qmaxlon)) & (maxlon >= F.lit(qminlon))
        )
    if relation == "within":
        return (
            (minlat >= F.lit(qminlat)) & (maxlat <= F.lit(qmaxlat))
            & (minlon >= F.lit(qminlon)) & (maxlon <= F.lit(qmaxlon))
        )
    if relation == "contains":
        return (
            (minlat <= F.lit(qminlat)) & (maxlat >= F.lit(qmaxlat))
            & (minlon <= F.lit(qminlon)) & (maxlon >= F.lit(qmaxlon))
        )
    raise ValueError(f"unsupported geo_shape relation {relation!r}")

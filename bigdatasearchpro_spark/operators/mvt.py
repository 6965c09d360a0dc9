"""ES ``_search/_mvt`` — Mapbox vector-tile search (the last r8-verdict
"missing" item: ``GET /{index}/_mvt/{field}/{z}/{x}/{y}``).

The ES endpoint renders one slippy-map tile from an index: a ``hits``
layer (up to ``size`` individual points), an ``aggs`` layer (a
``geotile_grid`` aggregation at ``zoom + grid_precision`` clipped to
the tile), and a ``meta`` layer (tile-level bounds the client styles
against).  Re-homed Spark-first in two halves:

- :func:`mvt_feature_rows` — everything DISTRIBUTED: the tile
  membership filter (a scan-pushable lat/lon bounding box that
  PROVABLY contains the exact predicate, then the exact
  ``geotile_xy`` cell equality — the geo.py prefilter lesson), the
  per-cell hash aggregate, the TakeOrdered hits page, and the
  tile-local integer pixel projection, all as one DataFrame whose
  rows are the tile's features.  This is the part that must scale and
  the part the DuckDB oracle hash-verifies (the Web-Mercator chain is
  written with the same fixed IEEE operand order as
  ``geo.geotile_xy``, which is already oracle-proven).

- :func:`mvt_encode` — the Mapbox Vector Tile 2.1 protobuf encoding
  of those rows (public spec: github.com/mapbox/vector-tile-spec).
  A tile is ONE binary of <= 4^grid_precision cells + ``size`` hits —
  bounded by construction — so encoding is a driver-side loop over
  the collected feature rows, exactly like every other final-page
  materialization in this engine.  Features encode as POINT
  geometries (the ES ``grid_type: point`` form; cells at their
  centers), tags carry ``_count``.

Reference parity: the reference UI's map-facing surface is the same
ES 6.x delegation (indexView.html:13-19); ``_mvt`` is the ES 7.15+
endpoint that serves its geo results to map clients.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators.geo import (
    MERCATOR_LAT_MAX,
    geotile_xy,
)

EXTENT_DEFAULT = 4096


def tile_bounds(z: int, x: int, y: int) -> "tuple[float, float, float, float]":
    """(lon_w, lon_e, lat_s, lat_n) of slippy tile z/x/y — standard
    Web-Mercator inverse (lat = atan(sinh(pi*(1 - 2*y/n))))."""
    n = float(1 << int(z))
    if not (0 <= x < n and 0 <= y < n):
        raise ValueError(f"tile {x}/{y} out of range at zoom {z}")
    lon_w = x / n * 360.0 - 180.0
    lon_e = (x + 1) / n * 360.0 - 180.0
    lat_n = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
    lat_s = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n))))
    return lon_w, lon_e, lat_s, lat_n


# Bounding-box slack: the box only PREfilters (the exact geotile cell
# equality follows), so it must contain every point the exact predicate
# admits despite last-ulp rounding differences between the box edge
# math here and the floor-chain in geotile_xy.  1e-6 degrees (~0.1 m)
# dwarfs any double rounding at these magnitudes while still pruning
# essentially the same files. (The round-8 geo lesson: a prefilter
# that is not provably containing WILL clip true matches at scale.)
_BOX_EPS = 1e-6


def tile_filter(df: DataFrame, lat_col: str, lon_col: str,
                z: int, x: int, y: int) -> DataFrame:
    """The rows belonging to slippy tile z/x/y: a scan-PUSHABLE
    bounding-box range prefilter (plan-gated in tests/test_geo.py),
    then the exact :func:`geo.geotile_xy` floor-chain equality.

    EDGE TILES get an open latitude bound: geotile_xy CLAMPS lat to
    +/-85.0511 and clamps y into range, so a doc at lat=89 belongs to
    every y=0 tile — a ``lat <= lat_n`` bound would drop it before
    the exact predicate admits it (the round-8 geo prefilter
    containment lesson, recurring; caught again in the r9 review)."""
    z, x, y = int(z), int(x), int(y)
    n_tiles = 1 << z
    lon_w, lon_e, lat_s, lat_n = tile_bounds(z, x, y)
    lat, lon = F.col(lat_col), F.col(lon_col)
    # Edge rows get OPEN latitude bounds (not +/-90): geotile_xy clamps
    # ANY latitude — even unnormalized |lat|>90 data — into the edge
    # rows, so a lat=95 doc belongs to every y=0 tile and a 90.0 bound
    # would drop it before the exact predicate admits it (r9 advice;
    # mirrors the open lon_hi below for lon>=180).
    lat_lo = -1e9 if y == n_tiles - 1 else lat_s - _BOX_EPS
    lat_hi = 1e9 if y == 0 else lat_n + _BOX_EPS
    # geotile_xy also clamps x DOWN into the last column (lon >= 180,
    # e.g. unnormalized data), so the LAST tile column needs an open
    # upper lon bound for the same containment reason as the poles
    # (there is no lower x clamp — lon < -180 maps to x = -1 and
    # matches no tile, so the west bound stays tight)
    lon_hi = 1e9 if x == n_tiles - 1 else lon_e + _BOX_EPS
    boxed = df.filter(
        (lon >= F.lit(lon_w - _BOX_EPS)) & (lon <= F.lit(lon_hi))
        & (lat >= F.lit(lat_lo)) & (lat <= F.lit(lat_hi))
    )
    tx, ty = geotile_xy(lat, lon, z)
    return boxed.filter((tx == F.lit(x)) & (ty == F.lit(y)))


def mvt_feature_rows(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    z: int,
    x: int,
    y: int,
    *,
    id_col: str = "doc_id",
    extent: int = EXTENT_DEFAULT,
    grid_precision: int = 8,
    size: int = 10000,
) -> DataFrame:
    """The tile's features as rows: ``(layer, px, py, doc_count,
    feature_id)``.

    - ``layer='aggs'``: one row per non-empty ``geotile_grid`` cell at
      zoom ``z + grid_precision`` inside the tile; (px, py) is the
      cell CENTER in tile-local extent coordinates, ``doc_count`` the
      cell population, ``feature_id`` NULL.
    - ``layer='hits'``: the first ``size`` points by the STRING form
      of ``id_col`` asc (ES ``_id`` is a string, so "10" < "2" — the
      page is an _id-sorted search page); (px, py) the point's extent
      coordinates, ``doc_count`` NULL, ``feature_id`` the id.
    - ``layer='meta'``: one row, (0, 0), ``doc_count`` = the MAX cell
      population (the bound map clients normalize cell styling
      against, ES ``meta`` layer), NULL when the tile is empty.

    Plan shape: ONE scan with the pushable bbox range predicate
    (PushedFilters on stored lat/lon columns) -> exact cell-equality
    filter -> PERSISTED tile rows read by {hash agg over
    <= 4^grid_precision cells, TakeOrdered ``size`` hits, 1-row max};
    the bounded union is materialized and the cache released (the
    search_topk pattern — without it the union re-scans the corpus
    once per layer).  No corpus-sized collect, no unbounded window,
    no join.
    """
    if not (0 <= int(grid_precision) <= 8):
        raise ValueError("grid_precision must be in [0, 8]")
    if extent < 1 or (extent & (extent - 1)):
        raise ValueError(f"extent must be a power of two, got {extent}")
    if extent < (1 << int(grid_precision)):
        raise ValueError(
            f"extent {extent} must be >= 2^grid_precision "
            f"({1 << int(grid_precision)}) — smaller collapses every "
            "cell center to pixel (0, 0)")
    if size < 0:
        raise ValueError("size must be >= 0")
    spark = df.sparkSession
    z, x, y = int(z), int(x), int(y)
    in_tile = tile_filter(df, lat_col, lon_col, z, x, y)
    lat, lon = F.col(lat_col), F.col(lon_col)

    zg = z + int(grid_precision)
    cells = 1 << int(grid_precision)
    cell_px = extent // cells  # extent is a power of two >= cells
    cx, cy = geotile_xy(lat, lon, zg)
    # tile-local cell index, clamped (a boundary ulp in the zg chain
    # may land one cell outside the z-exact tile — both engines clamp
    # identically, so parity holds)
    gx = F.least(F.greatest(cx - F.lit(x * cells), F.lit(0)),
                 F.lit(cells - 1))
    gy = F.least(F.greatest(cy - F.lit(y * cells), F.lit(0)),
                 F.lit(cells - 1))
    aggs = (
        in_tile.select(gx.alias("gx"), gy.alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("doc_count"))
        .select(
            F.lit("aggs").alias("layer"),
            (F.col("gx") * F.lit(cell_px) + F.lit(cell_px // 2))
            .cast("bigint").alias("px"),
            (F.col("gy") * F.lit(cell_px) + F.lit(cell_px // 2))
            .cast("bigint").alias("py"),
            F.col("doc_count").cast("bigint").alias("doc_count"),
            F.lit(None).cast("string").alias("feature_id"),
        )
    )

    def _pixel(glob: Column, origin: int) -> Column:
        # global fractional tile coordinate at zoom z -> extent units,
        # computed from the SAME (v * n - origin) form both engines
        # replay; clamped to the tile's pixel range
        p = F.floor((glob - F.lit(float(origin))) * F.lit(float(extent)))
        return F.least(F.greatest(p, F.lit(0)),
                       F.lit(extent - 1)).cast("bigint")

    n = float(1 << z)
    lon_glob = (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)
    lat_cl = F.least(F.greatest(lat, F.lit(-MERCATOR_LAT_MAX)),
                     F.lit(MERCATOR_LAT_MAX))
    rad = lat_cl * F.lit(math.pi) / F.lit(180.0)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    lat_glob = (F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
    hits = (
        in_tile.select(
            F.lit("hits").alias("layer"),
            _pixel(lon_glob, x).alias("px"),
            _pixel(lat_glob, y).alias("py"),
            F.lit(None).cast("bigint").alias("doc_count"),
            # ES _id IS a string: the hits page orders/cuts on the
            # string form of the id (so "10" < "2"), exactly like a
            # search sorted on _id
            F.col(id_col).cast("string").alias("feature_id"),
        )
        .orderBy(F.asc("feature_id"))
        .limit(int(size))
    )

    meta = aggs.agg(F.max("doc_count").alias("doc_count")).select(
        F.lit("meta").alias("layer"),
        F.lit(0).cast("bigint").alias("px"),
        F.lit(0).cast("bigint").alias("py"),
        F.col("doc_count").cast("bigint").alias("doc_count"),
        F.lit(None).cast("string").alias("feature_id"),
    )
    # The three layers share one tile read: persist the filtered tile
    # rows, materialize the bounded union, release the cache (the
    # search_topk pattern) — without this the union plan scans the
    # corpus three times (aggs, hits, meta), 3x the I/O per tile.
    union = aggs.unionByName(hits).unionByName(meta)
    in_tile.persist()
    try:
        rows, schema = union.collect(), union.schema
    finally:
        in_tile.unpersist()
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Mapbox Vector Tile 2.1 wire encoding (public spec) — driver-side
# over the bounded feature rows.
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _mvt_value(v) -> bytes:
    """Tile.Value message: int64 (field 4) or string (field 1)."""
    if isinstance(v, str):
        return _len_delim(1, v.encode("utf-8"))
    return _field(4, 0) + _varint(int(v))


def _mvt_point_geometry(px: int, py: int) -> bytes:
    """[MoveTo count=1, zigzag(px), zigzag(py)] packed varints."""
    cmd = (1 << 3) | 1  # command 1 (MoveTo), count 1
    geom = _varint(cmd) + _varint(_zigzag(px)) + _varint(_zigzag(py))
    return _len_delim(4, geom)


def _mvt_feature(px: int, py: int, *, fid: "int | None" = None,
                 tags: "list[int] | None" = None) -> bytes:
    body = b""
    if fid is not None:
        body += _field(1, 0) + _varint(int(fid))
    if tags:
        packed = b"".join(_varint(t) for t in tags)
        body += _len_delim(2, packed)
    body += _field(3, 0) + _varint(1)  # GeomType POINT
    body += _mvt_point_geometry(px, py)
    return _len_delim(2, body)


def _mvt_layer(name: str, features: "list[bytes]",
               keys: "list[str]", values: "list" ,
               extent: int) -> bytes:
    body = _field(15, 0) + _varint(2)  # version 2
    body += _len_delim(1, name.encode("utf-8"))
    for f in features:
        body += f
    for k in keys:
        body += _len_delim(3, k.encode("utf-8"))
    for v in values:
        body += _len_delim(4, _mvt_value(v))
    body += _field(5, 0) + _varint(int(extent))
    return _len_delim(3, body)


def mvt_encode(rows, *, extent: int = EXTENT_DEFAULT) -> bytes:
    """Encode collected :func:`mvt_feature_rows` rows as one Mapbox
    Vector Tile 2.1 binary: layers ``aggs`` (cell-center points tagged
    ``_count``), ``hits`` (plain points, numeric ids carried as the
    feature id), ``meta`` (one point tagged ``max_count``).  Rows are
    sorted per layer so the byte stream is deterministic for a given
    feature multiset."""
    aggs, hits, meta = [], [], []
    agg_vals: "list[int]" = []
    for r in rows:
        layer = r["layer"]
        if layer == "aggs":
            aggs.append(r)
        elif layer == "hits":
            hits.append(r)
        elif layer == "meta":
            meta.append(r)
        else:
            raise ValueError(f"unknown MVT layer {layer!r}")
    out = b""
    feats = []
    val_idx: "dict[int, int]" = {}  # O(1) value dedup (65536 cells at gp=8)
    for r in sorted(aggs, key=lambda r: (r["px"], r["py"])):
        v = int(r["doc_count"])
        vi = val_idx.get(v)
        if vi is None:
            vi = val_idx[v] = len(agg_vals)
            agg_vals.append(v)
        feats.append(_mvt_feature(int(r["px"]), int(r["py"]), tags=[0, vi]))
    out += _mvt_layer("aggs", feats, ["_count"], agg_vals, extent)
    feats, hit_ids = [], []
    for r in sorted(hits, key=lambda r: (r["feature_id"] or "", r["px"])):
        fid = None
        if r["feature_id"] is not None and str(r["feature_id"]).isdigit():
            fid = int(r["feature_id"])
            if fid >= 1 << 64:
                # the wire id is a uint64 varint — a wider numeric id
                # would silently truncate; fall back to tag-only
                # identification (the string _id tag is still exact)
                fid = None
        # MVT feature ids are unsigned ints only — ALWAYS carry the
        # document id as a string `_id` tag too (like ES _mvt), else a
        # non-numeric id ('doc-17') would encode as an anonymous,
        # unresolvable point (r9 high review find)
        tags = None
        if r["feature_id"] is not None:
            hit_ids.append(str(r["feature_id"]))
            tags = [0, len(hit_ids) - 1]
        feats.append(_mvt_feature(int(r["px"]), int(r["py"]), fid=fid,
                                  tags=tags))
    out += _mvt_layer("hits", feats, ["_id"] if hit_ids else [],
                      hit_ids, extent)
    feats, meta_vals = [], []
    for r in meta:
        if r["doc_count"] is not None:
            meta_vals.append(int(r["doc_count"]))
            feats.append(_mvt_feature(int(r["px"]), int(r["py"]),
                                      tags=[0, len(meta_vals) - 1]))
    out += _mvt_layer("meta", feats, ["max_count"], meta_vals, extent)
    return out

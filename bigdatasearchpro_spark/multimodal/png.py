"""Pure-Python PNG codec (SURVEY.md L6): real byte-level decode with
no native dependencies.

PNG (RFC 2083 / ISO 15948) is fully decodable with the standard
library: chunk framing is length/type/data/CRC32 (``zlib.crc32``),
IDAT is a zlib stream (``zlib.decompress``), and the only
image-specific work is reversing the five per-scanline byte filters
(None/Sub/Up/Average/Paeth).  This module implements the baseline
profile for real: 8-bit greyscale (color type 0), truecolor (2) and
truecolor+alpha (6), non-interlaced — the shapes a training-data
pipeline actually stores.  Exotic branches (16-bit, palette, Adam7)
raise ``ValueError`` honestly instead of guessing.

Like the JPEG/WAV/PPM rings, the fixture encoder builds REAL files
(any external PNG reader opens them) from closed-form pixel ramps, so
the DuckDB oracle recomputes the decoded statistics arithmetically —
any chunk-walk, zlib-framing, filter-reversal, or channel-layout bug
hash-mismatches.  The reference has no media surface (flat string
documents, BulkProcessImpl.java:112-117); this is the [EXT]
multimodal mandate.

At 100 TB: payload bytes stay executor-side (Arrow ``mapInPandas``
batches), the stats output is a few dozen bytes per asset, and the
encode step exists only for fixtures.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (baseline subset implemented)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    seed: int,
    *,
    color_type: int = 0,
) -> bytes:
    """A real PNG file: deterministic sample ramp seeded by ``seed``
    (sample i row-major across all channels = ``(seed*7 + i) % 256``),
    with the scanline FILTER cycling ``(seed + row) % 5`` so every
    filter type (None/Sub/Up/Average/Paeth) appears in the stream —
    the filters are lossless, so the decoded ramp (and any statistic
    of it) stays closed-form for the oracle."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    n = stride * height
    samples = (
        ((np.int64(seed) * 7 + np.arange(n, dtype=np.int64)) % 256)
        .astype(np.uint8)
        .reshape(height, stride)
    )
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        row = samples[r].astype(np.int64)
        ft = (seed + r) % 5
        out = np.empty(stride, dtype=np.int64)
        for i in range(stride):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(int(a), int(b), int(c))
            out[i] = (row[i] - pred) % 256
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Parse a PNG from its actual bytes: signature, CRC-verified chunk
    walk, concatenated-IDAT zlib inflate, and per-scanline filter
    reversal.  Returns uint8 ``(h, w)`` for greyscale or ``(h, w, ch)``
    for color.  Baseline subset: bit depth 8, color types 0/2/6,
    non-interlaced — everything else raises ``ValueError``."""
    if not payload.startswith(_SIGNATURE):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_SIGNATURE)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        # ancillary chunks are skipped, like a real reader
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8-bit only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    if not idat:
        raise ValueError("missing IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")
    out = np.empty((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        off = r * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).astype(np.int64)
        if ft == 0:
            row = line
        elif ft == 2:  # Up — vectorizable
            row = (line + prev) % 256
        else:
            row = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                elif ft == 4:
                    pred = _paeth(int(a), int(b), int(c))
                else:
                    raise ValueError(f"bad filter type {ft} in row {r}")
                row[i] = (line[i] + pred) % 256
        out[r] = row
        prev = row
    img = out.astype(np.uint8)
    if ch == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, ch)


def decode_png_stats(payload: bytes) -> dict:
    """Decode and reduce to scalar stats (the hash-comparable surface):
    dimensions, channel count, pixel count, exact int64 sample sum."""
    img = decode_png(payload)
    h, w = img.shape[0], img.shape[1]
    ch = 1 if img.ndim == 2 else img.shape[2]
    return {
        "fmt": "png",
        "width": int(w),
        "height": int(h),
        "channels": int(ch),
        "n_units": int(w * h),
        "val_sum": int(img.astype(np.int64).sum()),
    }


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("n_units", T.LongType(), False),
        T.StructField("val_sum", T.LongType(), False),
    ]
)


def synthesize_png_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture-side encoder: one REAL PNG per id — ``4 + id % 5`` wide,
    ``3 + id % 4`` tall, color type cycling grey/RGB/RGBA by
    ``id % 3``, sample ramp ``(id*7 + i) % 256``, filter type cycling
    per row.  All parameters are arithmetic on the id, so the oracle
    recomputes the decode stats without a PNG stack."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                payloads.append(
                    encode_png(
                        4 + d % 5,
                        3 + d % 4,
                        d,
                        color_type=(0, 2, 6)[d % 3],
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    from bigdatasearchpro_spark.sources.files import fan_out

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return fan_out(ids.select(id_col)).mapInPandas(gen, schema)


def decode_png_stats_df(assets: DataFrame) -> DataFrame:
    """REAL PNG decode over the payload column: Arrow-batched
    mapInPandas, each payload CRC-checked, inflated, unfiltered; one
    scalar stats row per asset.  Payload bytes never leave the
    executors."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                stats = decode_png_stats(bytes(payload))
                stats["asset_id"] = int(aid)
                rows.append(stats)
            yield pd.DataFrame(
                rows, columns=[f.name for f in PNG_STATS_SCHEMA]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        gen, PNG_STATS_SCHEMA
    )

"""Pure-Python AVI/MJPEG video codec (SURVEY.md L6).

Round 4 closed image/audio with real PPM and RIFF/WAVE parsers; round 5
added a real baseline-JPEG codec (``jpeg.py``).  This module composes
them into the VIDEO path — Motion-JPEG in an AVI (RIFF) container, the
classic codec whose frames are ordinary baseline JPEGs:

- **Encoder** (fixture side): a spec-shaped AVI — ``RIFF('AVI ')`` with
  a ``hdrl`` LIST (``avih`` main header + one ``strl`` stream with a
  ``vids``/``MJPG`` ``strh`` and a BITMAPINFOHEADER ``strf``) and a
  ``movi`` LIST of ``00dc`` chunks, each chunk one JFIF frame produced
  by :func:`jpeg.encode_jpeg`, word-aligned per the RIFF spec.
- **Decoder**: a real chunk walk (sizes honored, unknown chunks
  skipped, word alignment respected — never a byte scan), dimensions
  and frame count cross-checked between ``avih`` and the decoded
  frames, every ``00dc`` payload decoded by the real JPEG decoder.

With this, ALL THREE modalities decode from actual bytes; no
NotImplementedError hooks remain on the L6 decode surface (exotic
codecs still raise in :func:`codecs.decode_media` by magic-byte
dispatch, which is the honest behavior for unknown formats).

The reference has no media surface (flat string documents,
``BulkProcessImpl.java:112-117``); this is the [EXT] multimodal mandate
from BASELINE.json.  At 100 TB the payloads stay executor-side
(Arrow-batched ``mapInPandas`` in :mod:`codecs`); per-video output is a
handful of scalars, and frame SAMPLING (``stride``) bounds decode cost
per asset the way a training pipeline subsamples video.
"""

from __future__ import annotations

import struct

import numpy as np

from bigdatasearchpro_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """Encode uint8 frames (all same (h, w) or (h, w, 3)) as an
    AVI/MJPEG file.  Every frame is a real baseline JPEG."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    payloads = [encode_jpeg(f) for f in frames]

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0,
        len(frames),       # total frames
        0, 1,              # initial frames, stream count
        max(len(p) for p in payloads),
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,            # scale, rate -> fps
        0, len(frames),
        max(len(p) for p in payloads),
        0xFFFFFFFF,        # quality: default
        0,
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) honoring word alignment."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi_mjpeg(
    payload: bytes, *, stride: int = 1
) -> "tuple[int, int, int, list[np.ndarray]]":
    """Parse an AVI/MJPEG payload -> (width, height, n_frames, sampled
    frames).  ``stride`` samples every stride-th frame (frame 0 always
    included) — the bounded-cost path a training pipeline uses; header
    dims are verified against the decoded frames."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    width = height = total = None
    frames: list[np.ndarray] = []
    idx = 0
    for fourcc, start, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        list_type = payload[start : start + 4]
        if list_type == b"hdrl":
            for f2, s2, z2 in _walk_chunks(payload, start + 4, start + size):
                if f2 == b"avih":
                    vals = struct.unpack("<10I", payload[s2 : s2 + 40])
                    total, width, height = vals[4], vals[8], vals[9]
        elif list_type == b"movi":
            for f2, s2, z2 in _walk_chunks(payload, start + 4, start + size):
                if f2[2:4] == b"dc":  # compressed video frame
                    if idx % stride == 0:
                        frames.append(decode_jpeg(payload[s2 : s2 + z2]))
                    idx += 1
    if width is None or total is None:
        raise ValueError("missing avih header")
    if idx != total:
        raise ValueError(f"frame count mismatch: header {total}, movi {idx}")
    for f in frames:
        if f.shape[:2] != (height, width):
            raise ValueError("frame dimensions disagree with avih header")
    return int(width), int(height), int(total), frames


def decode_video_stats(payload: bytes, *, stride: int = 1) -> dict:
    """Decode + reduce to the scalar stats row shape the L6 registry
    entries use (mirrors :func:`codecs.decode_ppm`'s contract);
    ``val_sum`` sums the SAMPLED frames' pixels."""
    width, height, total, frames = decode_avi_mjpeg(payload, stride=stride)
    val_sum = int(
        sum(int(np.asarray(f, dtype=np.int64).sum()) for f in frames)
    )
    return {
        "fmt": "avi_mjpeg",
        "width": width,
        "height": height,
        "sample_rate": None,
        "n_units": total,
        "val_sum": val_sum,
    }

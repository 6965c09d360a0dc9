"""Multimodal asset columns + pandas-UDF processing (SURVEY.md L6).

Data model: one row per asset —

    asset_id   bigint       (stable key)
    kind       string       ('image' | 'audio' | 'video')
    payload    binary       (opaque encoded bytes; never interpreted
                             by the engine outside the decode UDF)
    meta       struct<width int, height int, sample_rate int,
                     n_frames int, fmt string>

The reference has no multimodal surface (its document model is flat
string maps, BulkProcessImpl.java:112-117); this ring is the [EXT]
training-data-pipeline requirement from BASELINE.json. Design point:
payloads at 100 TB dominate row width, so every op below keeps the
payload column pruned away unless the op actually consumes bytes
(Catalyst column pruning does this for free — verified in tests by
checking the scan's ReadSchema).

Codecs: PPM (P6) and WAV (PCM16) decode FOR REAL — pure-Python
byte-level parsers in ``multimodal/codecs.py``, no native deps —
reachable here via ``decode_payload(real=True)``. Formats that need
PIL/ffmpeg (JPEG/MP4/...) still raise NotImplementedError at the batch
boundary, which is exactly where a production build would call the
codec; ``real=False`` keeps the deterministic fake for plumbing tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("fmt", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic asset table from the documents fixture.

    The driver fixtures carry no binary columns, so the multimodal ring
    materializes them from ``documents``: payload = UTF-8 bytes of the
    text (an opaque stand-in for encoded media), kind/meta = arithmetic
    on ``doc_id``. Pure column expressions — SQL-expressible, so the
    plumbing (schema + typing) is DuckDB-oracle-checkable even though
    the payload semantics are fake.
    """
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.when(kind == "image", (F.col("doc_id") % 8 + 1) * 64)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("width"),
        F.when(kind == "image", (F.col("doc_id") % 6 + 1) * 64)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias(
            "sample_rate"
        ),
        F.when(kind == "video", (F.col("doc_id") % 120 + 30))
        .otherwise(F.lit(None))
        .cast("int")
        .alias("n_frames"),
        F.concat(F.lit("fake/"), kind).alias("fmt"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(payload: bytes | None) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes -> fixed-size float
    vector seeded by a stable checksum of the payload. Replace with the
    real PIL/librosa/ffmpeg call in production."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype="float32")
    # np.frombuffer is zero-copy; pad so short payloads still fold.
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size < FEATURE_DIM:
        buf = np.pad(buf, (0, FEATURE_DIM - buf.size))
    folded = buf[: buf.size - buf.size % FEATURE_DIM].reshape(-1, FEATURE_DIM)
    return (folded.astype("float64").sum(axis=0) % 255.0).astype("float32") / 255.0


def decode_payload(assets: DataFrame, *, real: bool = False) -> DataFrame:
    """Decode each payload to a ``FEATURE_DIM`` float vector.

    Arrow-batched ``mapInPandas``: one pandas iterator per partition,
    payload bytes never cross the driver. ``real=True`` is the
    production codec hook — NotImplementedError until the codec libs
    exist in the image.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("decoded", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _real_decode(payload: bytes | None) -> np.ndarray:
        # PPM/WAV have pure-Python decoders (multimodal/codecs.py);
        # formats that need PIL/ffmpeg still raise at this boundary.
        from bigdatasearchpro_spark.multimodal.codecs import decode_ppm

        if payload is None:
            return np.zeros(FEATURE_DIM, dtype="float32")
        if payload[:2] == b"P6":
            stats = decode_ppm(bytes(payload))
            n = 3 * stats["width"] * stats["height"]
            pix = np.frombuffer(
                bytes(payload), dtype=np.uint8, count=n, offset=len(payload) - n
            )
            head = pix[:FEATURE_DIM].astype("float32") / 255.0
        elif payload[:4] == b"RIFF":
            from bigdatasearchpro_spark.multimodal.codecs import wav_samples

            _, samples = wav_samples(bytes(payload))
            head = samples[:FEATURE_DIM].astype("float32") / 32768.0
        elif payload[:2] == b"\xff\xd8":
            from bigdatasearchpro_spark.multimodal.jpeg import decode_jpeg

            pix = decode_jpeg(bytes(payload)).reshape(-1)
            head = pix[:FEATURE_DIM].astype("float32") / 255.0
        else:
            raise NotImplementedError(
                "real decode supports PPM/WAV/baseline JPEG (pure Python); "
                "video formats need ffmpeg, absent in this container"
            )
        if head.size < FEATURE_DIM:
            head = np.pad(head, (0, FEATURE_DIM - head.size))
        return head

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if real else _fake_decode
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "decoded": [list(decode(p)) for p in pdf["payload"]],
                }
            )

    from bigdatasearchpro_spark.sources.files import fan_out

    narrow = fan_out(assets.select("asset_id", "kind", "payload"))
    return narrow.mapInPandas(gen, out_schema)


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode + L2-normalize into an embedding-compatible feature column
    (``array<float>``), ready for the L4 similarity operators."""
    decoded = decode_payload(assets)
    vec = F.transform(F.col("decoded"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(
        norm > 0, F.transform(vec, lambda x: (x / norm).cast("float"))
    ).otherwise(F.col("decoded"))
    return decoded.select("asset_id", "kind", unit.alias("feature"))


def resize_plan(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize planning: output dims + scale factors per image asset.

    The arithmetic (aspect-preserving fit inside target box) runs
    JVM-side; the pixel resample itself belongs in the decode UDF and is
    part of the codec stub. Only rows with kind='image' survive.
    """
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
    return assets.filter(F.col("kind") == "image").select(
        "asset_id",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
        F.floor(w * scale).cast("int").alias("out_w"),
        F.floor(h * scale).cast("int").alias("out_h"),
        F.round(scale, 4).alias("scale"),
    )


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (0, every_n, 2*every_n, … < n_frames).

    Row-expanding transform — expressed with ``sequence`` + ``explode``
    (fully JVM-side; a per-frame decode would chain ``mapInPandas`` on
    this output). At scale the explode happens after partition-local
    filtering on kind, so only video rows widen.
    """
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.col("meta.n_frames").alias("n_frames"),
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.n_frames") - 1, F.lit(int(every_n))
                )
            ).alias("frame_idx"),
        )
        .select("asset_id", "frame_idx", "n_frames")
    )


def chunk_audio(
    assets: DataFrame,
    *,
    chunk_seconds: float = 1.0,
    hop_seconds: float | None = None,
) -> DataFrame:
    """Fixed-length (optionally overlapping) chunk boundaries for audio
    assets — the windowing a feature extractor (fbank/wav2vec-style)
    consumes. Sample count stands in as payload length until the codec
    stub is replaced; boundary arithmetic (the Spark-side plumbing) is
    real: sequence + explode per asset, JVM-side, one narrow pass.
    """
    hop_seconds = hop_seconds or chunk_seconds
    audio = assets.filter(F.col("kind") == "audio")
    sr = F.col("meta.sample_rate")
    n = F.octet_length("payload")  # stand-in for decoded sample count
    hop = (sr * F.lit(float(hop_seconds))).cast("int")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), hop)
    chunk = (F.col("sample_rate") * F.lit(float(chunk_seconds))).cast("int")
    return (
        audio.select(
            "asset_id",
            sr.alias("sample_rate"),
            n.alias("n_samples"),
            F.posexplode(starts).alias("chunk_idx", "start_sample"),
        )
        .filter(F.col("start_sample") < F.col("n_samples"))
        .select(
            "asset_id",
            "chunk_idx",
            "start_sample",
            F.least(F.col("start_sample") + chunk, F.col("n_samples")).alias(
                "end_sample"
            ),
            "sample_rate",
        )
    )

"""L6 multimodal ring: asset derivation, codec stub, Arrow plumbing."""

from __future__ import annotations

import pytest
from struct import error as struct_error
from pyspark.sql import functions as F

from bigdatasearchpro_spark.multimodal import (
    ASSET_SCHEMA,
    FEATURE_DIM,
    assets_from_documents,
    decode_payload,
    extract_features,
    resize_plan,
    sample_frames,
)
from bigdatasearchpro_spark.sources.files import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return assets_from_documents(load_table(spark, sf_dir, "documents")).cache()


def test_asset_schema_and_counts(assets, docs):
    assert assets.schema == ASSET_SCHEMA
    assert assets.count() == docs.count()
    kinds = {r["kind"] for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_payload_is_opaque_bytes(assets, docs):
    row = assets.orderBy("asset_id").first()
    txt = docs.orderBy("doc_id").first()["text"]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert bytes(row["payload"]) == txt.encode("utf-8")


def test_meta_typed_per_kind(assets):
    img = assets.filter(F.col("kind") == "image")
    assert img.filter(F.col("meta.width").isNull()).count() == 0
    assert img.filter(F.col("meta.sample_rate").isNotNull()).count() == 0
    vid = assets.filter(F.col("kind") == "video")
    assert vid.filter(F.col("meta.n_frames").isNull()).count() == 0


def test_decode_is_deterministic_and_batched(assets):
    a = decode_payload(assets).orderBy("asset_id").collect()
    b = decode_payload(assets).orderBy("asset_id").collect()
    assert [r["decoded"] for r in a] == [r["decoded"] for r in b]
    assert all(len(r["decoded"]) == FEATURE_DIM for r in a)


def test_decode_real_raises_not_implemented(assets):
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_payload(assets, real=True).count()


def test_features_unit_norm(assets):
    feats = extract_features(assets)
    vec = F.transform(F.col("feature"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    bad = feats.filter((norm > 0) & (F.abs(norm - 1.0) > 1e-5)).count()
    assert bad == 0
    assert feats.count() == assets.count()


def test_resize_fits_target_box(assets):
    plan = resize_plan(assets, 224, 224)
    assert plan.filter((F.col("out_w") > 224) | (F.col("out_h") > 224)).count() == 0
    # the binding dimension lands exactly on the target edge
    assert plan.filter((F.col("out_w") == 224) | (F.col("out_h") == 224)).count() == (
        plan.count()
    )


def test_frame_sample_stride_and_bounds(assets):
    frames = sample_frames(assets, every_n=10)
    assert frames.filter(F.col("frame_idx") % 10 != 0).count() == 0
    assert frames.filter(F.col("frame_idx") >= F.col("n_frames")).count() == 0
    n_video = assets.filter(F.col("kind") == "video").count()
    assert frames.select("asset_id").distinct().count() == n_video


def test_payload_pruned_when_untouched(spark, sf_dir):
    """Column pruning: a metadata-only projection must not read payload
    bytes from the scan (100 TB design point — payload dominates width).
    The extra no-op filter keeps the plan from matching the cached
    module fixture (cache substitution would hide the pruned scan)."""
    a = assets_from_documents(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= 0)
    )
    plan = (
        a.select("asset_id", "kind", F.col("meta.width"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "doc_id" in read_schema
    assert "text" not in read_schema


def test_pure_python_codecs_roundtrip():
    """encode->decode round-trip byte-level; stdlib wave opens our WAV
    (i.e. the files are REAL, not engine-private blobs)."""
    import io
    import wave as _wave

    from bigdatasearchpro_spark.multimodal import codecs

    p = codecs.encode_ppm(6, 4, 99)
    s = codecs.decode_ppm(p)
    assert (s["width"], s["height"], s["n_units"]) == (6, 4, 24)
    assert s["val_sum"] == sum((99 * 7 + i) % 256 for i in range(3 * 6 * 4))
    # header comments are part of the PPM spec
    body = p[len(b"P6\n6 4\n255\n"):]
    assert codecs.decode_ppm(b"P6\n# c\n6 4\n255\n" + body)["val_sum"] == s["val_sum"]

    w = codecs.encode_wav_pcm16(16000, 333, 7)
    sw = codecs.decode_wav(w)
    assert (sw["sample_rate"], sw["n_units"]) == (16000, 333)
    assert sw["val_sum"] == sum(
        ((7 * 31 + i * 7919) % 65536) - 32768 for i in range(333)
    )
    wf = _wave.open(io.BytesIO(w))
    assert (wf.getframerate(), wf.getnchannels(), wf.getnframes()) == (16000, 1, 333)

    for bad in (b"\x89PNG", b"P6\n", b"RIFF1234WAVE"):
        with pytest.raises((NotImplementedError, ValueError, struct_error)):
            codecs.decode_media(bad)


def test_decode_real_parses_actual_bytes(spark):
    """real=True decodes PPM/WAV payloads byte-level: the feature head
    must equal the known pixel/sample ramp, not any fake."""
    from bigdatasearchpro_spark.multimodal import codecs

    ids = spark.range(0, 8).selectExpr("id AS doc_id")
    assets = codecs.synthesize_media_assets(ids)
    feats = {
        r["asset_id"]: r["decoded"]
        for r in decode_payload(assets, real=True).collect()
    }
    assert len(feats) == 8
    # even id 2 -> PPM, first byte of the ramp is (2*7 + 0) % 256 = 14
    assert abs(feats[2][0] - 14 / 255.0) < 1e-6
    # odd id 3 -> WAV, first sample is ((3*31) % 65536) - 32768
    assert abs(feats[3][0] - (((3 * 31) % 65536) - 32768) / 32768.0) < 1e-6

    stats = {r["asset_id"]: r for r in codecs.decode_media_stats(assets).collect()}
    assert stats[2]["fmt"] == "ppm" and stats[2]["width"] == 4 + 2 % 5
    assert stats[3]["fmt"] == "wav" and stats[3]["n_units"] == 200 + 3 % 64

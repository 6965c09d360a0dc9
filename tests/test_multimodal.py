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


# ---------------------------------------------------------------------------
# Baseline JPEG codec (multimodal/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_exact_on_block_constant():
    """Per-8x8-block constant images with even grays survive the lossy
    pipeline EXACTLY (DC divides the quant step; AC all zero) — the
    invariant the l6_decode_jpeg oracle relies on. The gradient also
    forces negative DC differentials through the Huffman path."""
    import numpy as np

    from bigdatasearchpro_spark.multimodal import jpeg

    blocks = np.array([[64, 190], [128, 66], [90, 180]])
    img = np.kron(blocks, np.ones((8, 8), int)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_jpeg_roundtrip_lossy_bounds_and_shapes():
    """Smooth content round-trips within tight error; non-block-aligned
    dims crop correctly; color (4:4:4 YCbCr) decodes to RGB; at least
    one produced stream contains a stuffed 0xFF00 (the unstuffing path
    is really exercised)."""
    import numpy as np

    from bigdatasearchpro_spark.multimodal import jpeg

    x, y = np.meshgrid(np.arange(64), np.arange(48))
    smooth = ((np.sin(x / 10) + np.cos(y / 13) + 2) / 4 * 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(smooth))
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert np.sqrt((err**2).mean()) < 4.0 and err.max() <= 20

    rng = np.random.default_rng(7)
    odd = rng.integers(0, 256, (13, 19), dtype=np.uint8)
    assert jpeg.decode_jpeg(jpeg.encode_jpeg(odd)).shape == (13, 19)

    color = np.stack([smooth, smooth[::-1], 255 - smooth], axis=-1)
    cout = jpeg.decode_jpeg(jpeg.encode_jpeg(color))
    cerr = np.abs(cout.astype(int) - color.astype(int))
    assert cout.shape == (48, 64, 3) and np.sqrt((cerr**2).mean()) < 6.0

    # byte stuffing: a writer emitting 0xFF must stuff 0x00, and the
    # reader must transparently unstuff it
    w = jpeg._BitWriter()
    w.write(0xFF, 8)
    w.write(0b1010, 4)
    stuffed = w.flush()
    assert stuffed[:2] == b"\xff\x00"
    r = jpeg._BitReader(stuffed, 0)
    assert r.read_bits(8) == 0xFF and r.read_bits(4) == 0b1010


def test_jpeg_decoder_against_hand_assembled_stream():
    """Decode a byte-stream assembled BY HAND in this test (markers,
    custom Huffman tables, hand-computed entropy bits) and compare to
    pixel values computed with the textbook T.81 IDCT double loop —
    fully independent of the encoder AND of the module's DCT matrix, so
    a shared sign/transpose bug between encode and decode cannot
    cancel out."""
    import math
    import struct

    import numpy as np

    from bigdatasearchpro_spark.multimodal import jpeg

    # one 8x8 block, quant all-16: DC quantized 3 at (0,0), AC -2 at
    # zigzag index 2 = (u=1, v=0)
    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    dht_dc = b"\x00" + bytes([1] + [0] * 15) + bytes([2])  # '0' -> cat 2
    # AC canonical, two len-2 codes: '00' -> EOB, '01' -> (run1,size2)
    dht_ac = b"\x10" + bytes([0, 2] + [0] * 14) + bytes([0x00, 0x12])
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    sos = seg(0xFFDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    # bits: DC '0'+'11'(diff=3), AC '01'+'01'(value -2), EOB '00', pad 1s
    entropy = bytes([0b01101010, 0b01111111])
    payload = (
        b"\xff\xd8"
        + seg(0xFFDB, b"\x00" + bytes([16] * 64))
        + sof
        + seg(0xFFC4, dht_dc)
        + seg(0xFFC4, dht_ac)
        + sos
        + entropy
        + b"\xff\xd9"
    )
    got = jpeg.decode_jpeg(payload)

    coef = np.zeros((8, 8))
    coef[0, 0] = 3 * 16
    coef[1, 0] = -2 * 16
    want = np.empty((8, 8))
    for xr in range(8):
        for yc in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * math.cos((2 * xr + 1) * u * math.pi / 16)
                        * math.cos((2 * yc + 1) * v * math.pi / 16)
                    )
            want[xr, yc] = s / 4 + 128
    want = np.clip(np.rint(want), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_jpeg_rejects_non_baseline():
    import numpy as np
    import pytest as _pytest

    from bigdatasearchpro_spark.multimodal import jpeg

    good = jpeg.encode_jpeg(np.full((8, 8), 100, np.uint8))
    with _pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG")
    # flip SOF0 to SOF2 (progressive): must refuse, not mis-decode
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with _pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(prog)


def test_jpeg_media_stats_dispatch(spark):
    """decode_media_stats routes FFD8 payloads through the real JPEG
    decoder; stats match the closed-form fixture arithmetic."""
    from bigdatasearchpro_spark.multimodal import codecs

    ids = spark.range(0, 6).selectExpr("id AS doc_id")
    stats = {
        r["asset_id"]: r
        for r in codecs.decode_media_stats(
            codecs.synthesize_jpeg_assets(ids)
        ).collect()
    }
    for d in range(6):
        nb = 2 + d % 3
        want_sum = 64 * sum(2 * ((d * 5 + i) % 64) + 64 for i in range(2 * nb))
        r = stats[d]
        assert (r["fmt"], r["width"], r["height"]) == ("jpeg", 16, 8 * nb)
        assert r["n_units"] == 128 * nb and r["val_sum"] == want_sum


# ---------------------------------------------------------------------------
# AVI/MJPEG video codec (multimodal/video.py)
# ---------------------------------------------------------------------------


def test_avi_mjpeg_roundtrip_and_stride():
    import numpy as np

    from bigdatasearchpro_spark.multimodal import video

    frames = []
    for f in range(5):
        blocks = np.array([[64 + 2 * f, 100], [150, 200 - 2 * f]])
        frames.append(np.kron(blocks, np.ones((8, 8), int)).astype(np.uint8))
    avi = video.encode_avi_mjpeg(frames, fps=12)
    w, h, total, dec = video.decode_avi_mjpeg(avi)
    assert (w, h, total) == (16, 16, 5)
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    # stride samples frames 0, 2, 4; header count still reports all 5
    w2, h2, t2, dec2 = video.decode_avi_mjpeg(avi, stride=2)
    assert t2 == 5 and len(dec2) == 3
    assert all(
        np.array_equal(d, frames[i]) for d, i in zip(dec2, (0, 2, 4))
    )
    # color frames lossy-bounded
    cf = [np.stack([f, f[::-1], 255 - f], axis=-1) for f in frames[:2]]
    _, _, _, cdec = video.decode_avi_mjpeg(video.encode_avi_mjpeg(cf))
    err = np.abs(cdec[0].astype(int) - cf[0].astype(int))
    assert np.sqrt((err**2).mean()) < 6.0


def test_avi_mjpeg_rejects_corruption():
    import numpy as np
    import pytest as _pytest

    from bigdatasearchpro_spark.multimodal import video

    f = [np.full((8, 8), 100, np.uint8)]
    avi = video.encode_avi_mjpeg(f)
    with _pytest.raises(ValueError):
        video.decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        video.decode_avi_mjpeg(avi[:-10])  # truncated: RIFF size mismatch
    # header frame count must agree with movi chunks
    bad = bytearray(avi)
    import struct as _s

    # avih total_frames field: find 'avih', body starts 8 after
    i = avi.find(b"avih") + 8
    bad[i + 16 : i + 20] = _s.pack("<I", 7)
    with _pytest.raises(ValueError, match="frame count"):
        video.decode_avi_mjpeg(bytes(bad))


def test_video_media_stats_dispatch(spark):
    from bigdatasearchpro_spark.multimodal import codecs

    ids = spark.range(0, 5).selectExpr("id AS doc_id")
    stats = {
        r["asset_id"]: r
        for r in codecs.decode_media_stats(
            codecs.synthesize_video_assets(ids)
        ).collect()
    }
    for d in range(5):
        nf = 2 + d % 3
        want = 64 * sum(
            2 * ((d * 3 + f * 5 + i) % 64) + 64
            for f in range(nf)
            for i in range(4)
        )
        r = stats[d]
        assert (r["fmt"], r["n_units"], r["val_sum"]) == ("avi_mjpeg", nf, want)


def test_jpeg_standalone_markers_and_fill_bytes():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker, and
    TEM (0x01) / RSTn (0xD0-D7) are standalone (no length field) — the
    segment walk must skip them rather than misread a length and
    desync (round-5 advice)."""
    import numpy as np

    from bigdatasearchpro_spark.multimodal import jpeg

    blocks = np.array([[64, 190], [128, 66]])
    img = np.kron(blocks, np.ones((8, 8), int)).astype(np.uint8)
    clean = jpeg.encode_jpeg(img)
    assert clean[:2] == b"\xff\xd8"
    # splice fill bytes + TEM + a restart marker between SOI and the
    # first real segment
    doctored = clean[:2] + b"\xff\xff\xff\x01\xff\xd0" + clean[2:]
    out = jpeg.decode_jpeg(doctored)
    assert np.array_equal(out, img)


def test_audio_frame_energy_exact(spark):
    """Frame energy equals the closed-form numpy replay; the last
    partial frame is kept with its true sample count."""
    import numpy as np

    from bigdatasearchpro_spark.multimodal import codecs

    ids = spark.createDataFrame([(1,), (3,)], "doc_id long")
    wav = codecs.synthesize_media_assets(ids)
    out = codecs.audio_frame_energy(wav, frame_samples=64).collect()
    got = {(r["asset_id"], r["frame_idx"]): (r["n_samples"], r["energy"]) for r in out}
    for d in (1, 3):
        n = 200 + d % 64
        i = np.arange(n, dtype=np.int64)
        s = (d * 31 + i * 7919) % 65536 - 32768
        for fi in range(0, n, 64):
            fr = s[fi : fi + 64]
            assert got[(d, fi // 64)] == (len(fr), int((fr * fr).sum()))
    import pytest

    with pytest.raises(ValueError):
        codecs.audio_frame_energy(wav, frame_samples=0)


def test_image_histogram_counts_blocks(spark):
    """Block-constant fixture: each 8x8 block lands 64 pixels in the
    bin of its gray; totals equal the image size."""
    from bigdatasearchpro_spark.multimodal import codecs

    ids = spark.createDataFrame([(2,), (5,)], "doc_id long")
    out = codecs.image_gray_histogram(
        codecs.synthesize_jpeg_assets(ids), bins=16
    ).collect()
    per = {}
    for r in out:
        assert r["n_pixels"] % 64 == 0  # whole blocks only
        per[r["asset_id"]] = per.get(r["asset_id"], 0) + r["n_pixels"]
    for d in (2, 5):
        nb = 2 + d % 3
        assert per[d] == 16 * 8 * nb  # width 16, nb block-rows of 8px
    import pytest

    with pytest.raises(ValueError):
        codecs.image_gray_histogram(
            codecs.synthesize_jpeg_assets(ids), bins=15
        ).collect()


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
def _png_unfilter_py(raw, height, stride, ch):
    """Independent filter reversal written straight from the RFC 2083
    filter definitions (byte-at-a-time, no numpy) — a different
    formulation than the shipped decoder, so a mirrored encoder+decoder
    bug cannot cancel out."""
    rows = []
    prev = [0] * stride
    for r in range(height):
        off = r * (stride + 1)
        ft = raw[off]
        line = list(raw[off + 1 : off + 1 + stride])
        cur = []
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise AssertionError(ft)
            cur.append((line[i] + pred) & 0xFF)
        rows.append(cur)
        prev = cur
    return rows


def test_png_roundtrip_all_color_types_and_filters():
    from bigdatasearchpro_spark.multimodal import png as P
    import zlib as Z
    import struct as S

    for seed, ct, ch in [(0, 0, 1), (1, 2, 3), (2, 6, 4), (7, 2, 3)]:
        w, h = 5, 6  # 6 rows -> every filter type 0..4 appears
        payload = P.encode_png(w, h, seed, color_type=ct)
        img = P.decode_png(payload)
        n = w * h * ch
        expect = ((seed * 7 + __import__("numpy").arange(n)) % 256)
        got = img.reshape(-1)
        assert (got == expect.astype("uint8")).all(), (seed, ct)
        # independent spec-twin agrees with the shipped decoder
        pos = len(b"\x89PNG\r\n\x1a\n")
        idat = bytearray()
        while pos + 8 <= len(payload):
            (length,) = S.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            if ctype == b"IDAT":
                idat.extend(payload[pos + 8 : pos + 8 + length])
            pos += 12 + length
        raw = Z.decompress(bytes(idat))
        twin = _png_unfilter_py(raw, h, w * ch, ch)
        assert [b for row in twin for b in row] == [int(x) for x in got]


def test_png_decode_guards():
    from bigdatasearchpro_spark.multimodal import png as P
    import pytest as pt

    good = P.encode_png(4, 3, 5, color_type=0)
    with pt.raises(ValueError, match="signature"):
        P.decode_png(b"JFIF" + good)
    # flip one IDAT byte -> CRC check trips
    bad = bytearray(good)
    idx = good.index(b"IDAT") + 6
    bad[idx] ^= 0xFF
    with pt.raises(ValueError, match="CRC"):
        P.decode_png(bytes(bad))
    with pt.raises(ValueError, match="truncated|IHDR|IDAT"):
        P.decode_png(good[:20])
    with pt.raises(ValueError):
        P.encode_png(4, 3, 5, color_type=3)  # palette not supported


def test_png_stats_df_matches_closed_form(spark):
    from bigdatasearchpro_spark.multimodal import png as P

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = P.decode_png_stats_df(P.synthesize_png_assets(ids)).collect()
    assert len(rows) == 12
    for r in sorted(rows, key=lambda r: r["asset_id"]):
        d = r["asset_id"]
        w, h = 4 + d % 5, 3 + d % 4
        ch = (1, 3, 4)[d % 3]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["n_units"] == w * h
        assert r["val_sum"] == sum((d * 7 + i) % 256 for i in range(ch * w * h))


def test_image_resize_nearest_identity_and_mapping(spark):
    """Resizing to the source dims is the identity; downsizing picks
    the floor-mapped source pixel; guards raise."""
    import numpy as np

    from bigdatasearchpro_spark.multimodal.codecs import (
        encode_ppm,
        image_resize_nearest,
        ppm_raster,
    )

    payload = encode_ppm(4, 2, seed=9)
    w, h, raster = ppm_raster(payload)
    px = raster.reshape(h, w, 3)
    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "asset_id long, payload binary"
    )
    same = image_resize_nearest(assets, 4, 2).collect()
    assert len(same) == 8
    for r in same:
        assert (r["r"], r["g"], r["b"]) == tuple(
            int(v) for v in px[r["out_r"], r["out_c"]]
        )
    down = image_resize_nearest(assets, 2, 1).collect()
    assert len(down) == 2
    for r in down:
        sr, sc = (r["out_r"] * 2) // 1 // 2, (r["out_c"] * 4) // 2
        assert (r["r"], r["g"], r["b"]) == tuple(int(v) for v in px[0, sc])
    up = image_resize_nearest(assets, 8, 4).collect()
    assert len(up) == 32  # upsampling replicates source pixels
    import pytest as pt

    with pt.raises(ValueError):
        image_resize_nearest(assets, 0, 2)


def test_video_scene_cuts_hand_fixture(spark):
    """Three 16x16 frames: identical pair (diff 0, no cut) then a
    uniform +40 jump (diff 40*256, cut at threshold 20)."""
    import numpy as np

    from bigdatasearchpro_spark.multimodal import codecs
    from bigdatasearchpro_spark.multimodal.video import encode_avi_mjpeg

    f0 = np.full((16, 16), 64, dtype=np.uint8)
    f2 = np.full((16, 16), 104, dtype=np.uint8)  # +40 everywhere
    payload = encode_avi_mjpeg([f0, f0.copy(), f2])
    assets = spark.createDataFrame(
        [(7, bytearray(payload))], "asset_id long, payload binary"
    )
    rows = {
        r["frame_idx"]: r
        for r in codecs.video_scene_cuts(assets, mean_diff_threshold=20).collect()
    }
    assert set(rows) == {1, 2}
    assert (rows[1]["diff_sum"], rows[1]["is_cut"]) == (0, False)
    assert (rows[2]["diff_sum"], rows[2]["is_cut"]) == (40 * 256, True)


def test_image_phash_neardup_recall_and_precision(spark):
    """Planted local-edit variants pair with their sources (recall >=
    0.9 at radius 7 — a perceptual hash legitimately misses a few
    larger-looking edits) with ZERO false positives among distinct
    photos; hashes are deterministic across calls."""
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark.multimodal import codecs
    from bigdatasearchpro_spark.operators import neardup

    ids = spark.createDataFrame(
        [(i,) for i in range(0, 200, 5)], "doc_id long"
    )
    base = codecs.synthesize_photo_assets(ids)
    var = codecs.synthesize_photo_assets(ids, patch=True, id_offset=100000)
    hashes = codecs.image_phash(base.unionByName(var)).select(
        "asset_id", F.col("phash").alias("__sim")
    )
    pairs = neardup.hamming_signature_pairs(
        hashes, id_col="asset_id", n_bits=64, max_hamming=7, n_chunks=8
    ).collect()
    planted = {(r["left_id"], r["right_id"]) for r in pairs
               if r["right_id"] == r["left_id"] + 100000}
    cross = [r for r in pairs if r["right_id"] != r["left_id"] + 100000]
    assert not cross
    assert len(planted) >= 0.9 * 40
    # determinism
    again = {r["asset_id"]: r["phash"]
             for r in codecs.image_phash(base).collect()}
    first = {r["asset_id"]: r["__sim"]
             for r in hashes.filter(F.col("asset_id") < 100000).collect()}
    assert again == first


def test_audio_fingerprint_neardup_and_gain_invariance(spark):
    """Every planted re-master pairs with its source at radius 3 with
    zero cross pairs; a PURE gain change flips no contour bit at all."""
    import numpy as np

    from pyspark.sql import functions as F

    from bigdatasearchpro_spark.multimodal import codecs
    from bigdatasearchpro_spark.operators import neardup

    ids = spark.createDataFrame([(i,) for i in range(0, 100, 5)], "doc_id long")
    base = codecs.synthesize_tone_assets(ids)
    var = codecs.synthesize_tone_assets(ids, variant=True, id_offset=100000)
    fps = codecs.audio_energy_fingerprint(base.unionByName(var)).select(
        "asset_id", F.col("fp").alias("__sim")
    )
    pairs = neardup.hamming_signature_pairs(
        fps, id_col="asset_id", n_bits=64, max_hamming=3, n_chunks=4
    ).collect()
    assert len(pairs) == 20
    assert all(r["right_id"] == r["left_id"] + 100000 for r in pairs)
    # pure gain: scale samples 2x via a hand-built WAV; fingerprint equal
    import struct as _struct

    def wav(samples):
        data = samples.astype("<i2").tobytes()
        fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = b"".join([b"WAVE", b"fmt ", _struct.pack("<I", len(fmt)), fmt,
                         b"data", _struct.pack("<I", len(data)), data])
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    s = (np.sin(np.arange(64 * 65) / 9.0) * 2000).astype(np.int64)
    a = spark.createDataFrame(
        [(1, bytearray(wav(s))), (2, bytearray(wav(s * 2)))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r["fp"]
           for r in codecs.audio_energy_fingerprint(a).collect()}
    assert got[1] == got[2]

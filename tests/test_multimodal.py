"""Multimodal plumbing: container codecs, actor-pool stages for decode /
feature-extract / resize / frame-sample / audio-chunk, and the stub path
for real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from markdown_query_ray.pipelines.multimodal import (
    AudioChunkStage,
    FrameSampleStage,
    MediaFeatureStage,
    ResizeStage,
    _decode_raw8,
    _decode_rawa,
    _decode_raw8_video,
    encode_raw8,
    encode_raw8_video,
    encode_rawa,
    make_audio_table,
    make_media_table,
    make_video_table,
)


def test_raw8_roundtrip():
    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert np.array_equal(_decode_raw8(encode_raw8(px)), px)


def test_video_roundtrip():
    fr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    assert np.array_equal(_decode_raw8_video(encode_raw8_video(fr)), fr)


def test_audio_roundtrip():
    s = (np.sin(np.linspace(0, 10, 500)) * 1000).astype(np.int16)
    rate, out = _decode_rawa(encode_rawa(s, rate=8000))
    assert rate == 8000 and np.array_equal(out, s)


def test_feature_stage_matches_numpy():
    t = make_media_table(8)
    out = MediaFeatureStage()(t)
    assert out.column_names == ["media_id", "features", "mean_intensity",
                                "std_intensity"]
    px0 = _decode_raw8(t.column("media")[0].as_py())
    assert out.column("mean_intensity")[0].as_py() == \
        pytest.approx(float(px0.mean()))
    feats = out.column("features")[0].as_py()
    assert len(feats) == 16 and sum(feats) == pytest.approx(1.0, abs=1e-5)


def test_resize_stage_shape():
    t = make_media_table(4)
    out = ResizeStage(out_h=8, out_w=8)(t)
    for v in out.column("resized").to_pylist():
        assert len(v) == 64


def test_frame_sampling_counts_and_composability():
    t = make_video_table(6)
    frames = FrameSampleStage(n_samples=4)(t)
    # every output frame is a decodable RAW8 image
    for v in frames.column("media").to_pylist():
        _decode_raw8(v)
    per_vid = {}
    for mid in frames.column("media_id").to_pylist():
        per_vid[mid] = per_vid.get(mid, 0) + 1
    nf = dict(zip(t.column("media_id").to_pylist(),
                  t.column("n_frames").to_pylist()))
    for mid, cnt in per_vid.items():
        assert cnt == min(4, nf[mid])
    # composes with the image feature stage through the shared schema
    feats = MediaFeatureStage()(frames)
    assert len(feats) == len(frames)


def test_frame_indices_uniform():
    fr = np.zeros((10, 4, 4), np.uint8)
    import pyarrow as pa

    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "media": pa.array([encode_raw8_video(fr)], pa.binary()),
        "media_type": pa.array(["video/raw8v"], pa.string()),
    })
    out = FrameSampleStage(n_samples=5)(t)
    assert out.column("frame_idx").to_pylist() == [0, 2, 4, 6, 8]


def test_audio_chunking():
    t = make_audio_table(5)
    out = AudioChunkStage(chunk_samples=1024)(t)
    _, s0 = _decode_rawa(t.column("media")[0].as_py())
    n_chunks0 = -(-len(s0) // 1024)
    got0 = [i for i, m in enumerate(out.column("media_id").to_pylist())
            if m == 0]
    assert len(got0) == n_chunks0
    chunk0 = s0[:1024].astype(np.float64)
    assert out.column("rms")[got0[0]].as_py() == \
        pytest.approx(float(np.sqrt(np.mean(chunk0 ** 2))))
    assert 0.0 <= out.column("zero_crossing_rate")[got0[0]].as_py() <= 1.0


def test_real_codec_stub_raises():
    """jpeg decodes for real as of round 4 (tests/test_jpeg.py); the
    remaining container-forced stub is real video."""
    import pyarrow as pa

    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "media": pa.array([b"\x00\x00\x00\x18ftypmp42moovdata"], pa.binary()),
        "media_type": pa.array(["video/mp4"], pa.string()),
    })
    with pytest.raises(NotImplementedError):
        MediaFeatureStage()(t)


def test_distributed_video_pipeline(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.multimodal import video_frame_features

    ds = ray.data.from_arrow(make_video_table(12))
    out = video_frame_features(ds, n_samples=3, batch_size=4).to_pandas()
    assert len(out) > 0
    # frame_idx rides through the feature stage so per-frame rows keep
    # their provenance (golden-oracle comparisons key on it)
    assert set(out.columns) == {"media_id", "frame_idx", "features",
                                "mean_intensity", "std_intensity"}


# --- REAL codecs (stdlib zlib / wave) ----------------------------------------

def _rng(seed=123):
    return np.random.Generator(np.random.PCG64(seed))


def test_png_roundtrip_gray():
    from markdown_query_ray.pipelines.multimodal import (
        decode_png_gray,
        encode_png_gray,
    )

    px = _rng().integers(0, 256, size=(23, 17), dtype=np.uint8)
    assert np.array_equal(decode_png_gray(encode_png_gray(px)), px)


def _png_manual(w, h, channels, color_type, rows_filtered: list[bytes]):
    """Hand-build a PNG from pre-filtered scanlines (tests every filter)."""
    import struct
    import zlib

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    raw = b"".join(rows_filtered)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                         0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_all_filter_types_gray():
    """Decode correctness for Sub/Up/Average/Paeth: filter each row of a
    known image manually (per the PNG spec definitions), then require the
    decoder to reconstruct the original."""
    from markdown_query_ray.pipelines.multimodal import decode_png_gray

    px = _rng(7).integers(0, 256, size=(5, 9), dtype=np.uint8).astype(int)
    bpp = 1
    rows = []
    filters = [0, 1, 2, 3, 4]
    prev = np.zeros(9, int)
    for y, f in enumerate(filters):
        cur = px[y]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = np.array([cur[x] - (cur[x - bpp] if x >= bpp else 0)
                            for x in range(9)])
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = np.array([
                cur[x] - (((cur[x - bpp] if x >= bpp else 0) + prev[x]) >> 1)
                for x in range(9)])
        else:
            def paeth(a, b, c):
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                return a if (da <= db and da <= dc) else \
                    (b if db <= dc else c)
            enc = np.array([
                cur[x] - paeth(cur[x - bpp] if x >= bpp else 0, prev[x],
                               prev[x - bpp] if x >= bpp else 0)
                for x in range(9)])
        rows.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    data = _png_manual(9, 5, 1, 0, rows)
    assert np.array_equal(decode_png_gray(data), px.astype(np.uint8))


def test_png_rgb_luma_and_rgba():
    from markdown_query_ray.pipelines.multimodal import decode_png_gray

    rgb = _rng(11).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    rows = [b"\x00" + rgb[y].tobytes() for y in range(4)]
    got = decode_png_gray(_png_manual(6, 4, 3, 2, rows))
    want = np.clip(np.round(0.299 * rgb[:, :, 0].astype(float)
                            + 0.587 * rgb[:, :, 1]
                            + 0.114 * rgb[:, :, 2]), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)
    rgba = np.dstack([rgb, np.full((4, 6), 128, np.uint8)])
    rows = [b"\x00" + rgba[y].tobytes() for y in range(4)]
    assert np.array_equal(decode_png_gray(_png_manual(6, 4, 4, 6, rows)),
                          want)


def test_png_unsupported_raises():
    import struct
    import zlib

    from markdown_query_ray.pipelines.multimodal import decode_png_gray

    with pytest.raises(ValueError):
        decode_png_gray(b"not a png")
    # palette without a PLTE chunk is malformed, not unsupported
    rows = [b"\x00" + bytes(4)]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_gray(_png_manual(4, 1, 1, 3, rows))

    def ihdr_png(bit, color, interlace):
        def chunk(typ, payload):
            return (struct.pack(">I", len(payload)) + typ + payload
                    + struct.pack(">I", zlib.crc32(typ + payload)))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, bit,
                                             color, 0, 0, interlace))
                + chunk(b"IDAT", zlib.compress(bytes(5)))
                + chunk(b"IEND", b""))

    # sub-byte RGB, 16-bit palette, and invalid color types stay clean
    # NotImplementedError (16-bit gray/RGB[A] and Adam7 are supported now)
    for bit, color, inter in ((4, 2, 0), (16, 3, 0), (8, 5, 0)):
        with pytest.raises(NotImplementedError):
            decode_png_gray(ihdr_png(bit, color, inter))


def test_png_palette_roundtrip_all_depths():
    """Palette decode at bit 1/2/4/8: a gray (v,v,v) palette makes the
    decode lossless, so decode(encode(idx, pal)) == pal_values[idx]."""
    from markdown_query_ray.pipelines.multimodal import (
        decode_png_gray,
        encode_png_palette,
    )

    rng = _rng(23)
    for bit in (1, 2, 4, 8):
        n = 1 << bit
        vals = rng.permutation(256)[:n].astype(np.uint8)
        pal = np.repeat(vals[:, None], 3, axis=1)
        # widths that exercise partial trailing bytes in sub-byte packing
        for w in (1, 7, 8, 9):
            idx = rng.integers(0, n, (5, w), dtype=np.uint8)
            got = decode_png_gray(encode_png_palette(idx, pal, bit=bit))
            assert np.array_equal(got, vals[idx]), (bit, w)


def test_png_subbyte_gray_scaling():
    """1/2/4-bit grayscale rescales samples to the 8-bit range
    (spec 12.5): v * 255 // (2^bit - 1)."""
    import struct
    import zlib

    from markdown_query_ray.pipelines.multimodal import decode_png_gray

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    for bit in (1, 2, 4):
        n = 1 << bit
        w = n  # one row holding every sample value once
        vals = np.arange(n, dtype=np.uint8)
        bits = ((vals[:, None] >> np.arange(bit - 1, -1, -1)) & 1) \
            .reshape(-1)
        row = b"\x00" + np.packbits(bits).tobytes()
        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 1, bit, 0,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(row))
               + chunk(b"IEND", b""))
        got = decode_png_gray(png)
        want = (vals.astype(np.uint16) * 255 // (n - 1)).astype(np.uint8)
        assert np.array_equal(got[0], want), bit


def test_png_palette_rgb_match_jdk_goldens():
    """Palette (bit 1/2/4/8), RGB/RGBA, Adam7-INTERLACED rgb/palette and
    16-bit RGB decodes match the JDK ImageIO oracle bit-for-bit
    (golden/png.json, tools/gen_goldens.py gen_png — the PLTE lookup,
    interlace reassembly and 16->8 reduction happen inside the JDK
    there)."""
    import hashlib
    import json
    import os

    from markdown_query_ray.pipelines.multimodal import (
        decode_png_gray,
        make_png_fixture_set,
    )

    gp = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "png.json")
    golden = {r["name"]: r for r in json.load(open(gp))["png_luma"]}
    fixtures = {nm: data for nm, data in make_png_fixture_set()}
    assert len(golden) == 36
    for nm, g in golden.items():
        luma = decode_png_gray(fixtures[nm])
        assert luma.shape == (g["h"], g["w"]), nm
        assert hashlib.sha256(luma.tobytes()).hexdigest() == \
            g["luma_sha256"], nm


def test_wav_roundtrip_and_stereo_mono_fold():
    import io
    import wave

    from markdown_query_ray.pipelines.multimodal import decode_wav, encode_wav

    s = (_rng(3).standard_normal(4000) * 5000).astype(np.int16)
    rate, got = decode_wav(encode_wav(s, rate=22050))
    assert rate == 22050
    assert np.array_equal(got, s)
    # stereo: decoder averages channels
    left = s[:100]
    right = (s[:100] // 2).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        inter = np.empty(200, np.int16)
        inter[0::2] = left
        inter[1::2] = right
        wf.writeframes(inter.tobytes())
    rate, mono = decode_wav(buf.getvalue())
    assert rate == 8000
    want = np.round((left.astype(float) + right) / 2).astype(np.int16)
    assert np.array_equal(mono, want)


def test_png_and_wav_flow_through_stages():
    """Mixed-format batches: a PNG row produces the same features as the
    RAW8 row with identical pixels, and WAV audio chunks match RAWA."""
    import pyarrow as pa

    from markdown_query_ray.pipelines.multimodal import (
        AudioChunkStage,
        encode_png_gray,
        encode_rawa,
        encode_wav,
    )

    px = _rng(21).integers(0, 256, size=(12, 12), dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "media": pa.array([encode_raw8(px), encode_png_gray(px)],
                          pa.binary()),
        "media_type": pa.array(["image/raw8", "image/png"], pa.string()),
    })
    out = MediaFeatureStage()(t)
    assert out.column("mean_intensity")[0].as_py() == \
        out.column("mean_intensity")[1].as_py()
    assert out.column("features")[0].as_py() == \
        out.column("features")[1].as_py()

    s = (_rng(22).standard_normal(3000) * 2000).astype(np.int16)
    ta = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "media": pa.array([encode_rawa(s), encode_wav(s)], pa.binary()),
        "media_type": pa.array(["audio/rawa", "audio/wav"], pa.string()),
    })
    oa = AudioChunkStage(chunk_samples=1024)(ta)
    a = oa.filter(pa.compute.equal(oa.column("media_id"), 0))
    b = oa.filter(pa.compute.equal(oa.column("media_id"), 1))
    assert a.column("rms").to_pylist() == b.column("rms").to_pylist()
    assert a.column("zero_crossing_rate").to_pylist() == \
        b.column("zero_crossing_rate").to_pylist()


def test_png_16bit_gray_scaling():
    """16-bit grayscale reduces by round(v/257) — the exact 16->8
    inverse (the JDK-checked convention on the RGB fixtures)."""
    from markdown_query_ray.pipelines.multimodal import (
        _encode_png_16bit,
        decode_png_gray,
    )

    v = np.array([[0, 1, 128, 257, 385, 386, 32767, 65535,
                   0xAB00, 0xABFF, 0x00FF, 0xFF00]], np.uint16)
    got = decode_png_gray(_encode_png_16bit(v, 0))
    want = ((v.astype(np.uint32) + 128) // 257).astype(np.uint8)
    assert np.array_equal(got, want)

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
    import pyarrow as pa

    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "media": pa.array([b"\xff\xd8\xff\xe0jpegdata"], pa.binary()),
        "media_type": pa.array(["image/jpeg"], pa.string()),
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

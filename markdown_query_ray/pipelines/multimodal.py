"""Multimodal columns: opaque binary media + typed metadata, processed by
actor-pool map_batches stages.

Real image/audio codecs are not in this container, so the decode surface is
split (per the build brief):

- ``RAW8`` (our deterministic fake format: 8-byte header ``R8xx`` + width +
  height + grayscale bytes) decodes for real — the Ray-side plumbing
  (schema, actor signature, batch sizing for fat binaries, output layout)
  is fully exercised and tested.
- real formats (jpeg/png/wav/...) raise ``NotImplementedError`` in
  ``_decode_real`` — a clearly marked stub; plugging in PIL/ffmpeg changes
  one function, not the pipeline.

Feature extraction (byte histograms, moments) is real numpy — the shape a
CLIP/whisper embedding stage would have (load model per actor in __init__,
batch-infer in __call__).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"R8IM"


def encode_raw8(pixels: np.ndarray) -> bytes:
    """Pack a (h, w) uint8 image into the RAW8 container."""
    h, w = pixels.shape
    return MAGIC + struct.pack("<II", w, h) + pixels.tobytes()


def make_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fixture: n small RAW8 'images' with metadata."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        rows.append((i, encode_raw8(px), "image/raw8", w, h))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array([r[2] for r in rows], pa.string()),
        "width": pa.array([r[3] for r in rows], pa.int32()),
        "height": pa.array([r[4] for r in rows], pa.int32()),
    })


def _decode_raw8(data: bytes) -> np.ndarray:
    if data[:4] != MAGIC:
        raise ValueError("not a RAW8 payload")
    w, h = struct.unpack("<II", data[4:12])
    return np.frombuffer(data[12:12 + w * h], np.uint8).reshape(h, w)


def _decode_real(data: bytes, media_type: str) -> np.ndarray:
    # STUB: real codecs (jpeg/png/wav) are not available in this container.
    raise NotImplementedError(
        f"decoder for {media_type!r} not available in this environment; "
        "plug PIL/ffmpeg in here — the surrounding pipeline is format-"
        "agnostic")


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract small batches of fat binary
    rows. batch_size must be small for media columns (the batch bytes, not
    the row count, bound worker memory)."""

    def __init__(self, n_bins: int = 16):
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means, stds = [], [], []
        for data, mt in zip(batch.column("media").to_pylist(),
                            batch.column("media_type").to_pylist()):
            px = _decode_raw8(data) if mt == "image/raw8" \
                else _decode_real(data, mt)
            hist, _ = np.histogram(px, bins=self.edges)
            hist = hist / max(1, px.size)
            feats.append(hist.astype(np.float32).tolist())
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        cols = {
            "media_id": batch.column("media_id"),
            "features": pa.array(feats, pa.list_(pa.float32())),
            "mean_intensity": pa.array(means, pa.float64()),
            "std_intensity": pa.array(stds, pa.float64()),
        }
        # carry per-frame provenance through (video frames keep their index)
        if "frame_idx" in batch.column_names:
            cols["frame_idx"] = batch.column("frame_idx")
        return pa.table(cols)


class ResizeStage:
    """Nearest-neighbour resize to a fixed (h, w) — the shape of a
    preprocessing stage feeding batched model inference."""

    def __init__(self, out_h: int = 16, out_w: int = 16):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for data, mt in zip(batch.column("media").to_pylist(),
                            batch.column("media_type").to_pylist()):
            px = _decode_raw8(data) if mt == "image/raw8" \
                else _decode_real(data, mt)
            h, w = px.shape
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            out.append(px[yi][:, xi].tobytes())
        return pa.table({
            "media_id": batch.column("media_id"),
            "resized": pa.array(out, pa.binary()),
        })


def media_features(ds, batch_size: int = 64):
    """Full decode->features pipeline (actor pool, small batches)."""
    return ds.map_batches(MediaFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=(1, 8))


# ---------------------------------------------------------------------------
# video: frame sampling (RAW8V = MAGIC_V + n_frames + w + h + frames)
# ---------------------------------------------------------------------------

MAGIC_V = b"R8VD"


def encode_raw8_video(frames: np.ndarray) -> bytes:
    """Pack an (n, h, w) uint8 frame stack into the RAW8V container."""
    n, h, w = frames.shape
    return MAGIC_V + struct.pack("<III", n, w, h) + frames.tobytes()


def _decode_raw8_video(data: bytes) -> np.ndarray:
    if data[:4] != MAGIC_V:
        raise ValueError("not a RAW8V payload")
    n, w, h = struct.unpack("<III", data[4:16])
    return np.frombuffer(data[16:16 + n * w * h], np.uint8).reshape(n, h, w)


def make_video_table(n: int, seed: int = 9) -> pa.Table:
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        nf = int(rng.integers(4, 24))
        w, h = int(rng.integers(8, 16)), int(rng.integers(8, 16))
        fr = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
        rows.append((i, encode_raw8_video(fr), "video/raw8v", nf))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array([r[2] for r in rows], pa.string()),
        "n_frames": pa.array([r[3] for r in rows], pa.int32()),
    })


class FrameSampleStage:
    """Uniformly sample ``n_samples`` frames per video and emit ONE ROW PER
    FRAME (the flat_map shape feeding per-frame model inference): each
    output frame is a RAW8 image row MediaFeatureStage can consume
    directly — decode composes with feature-extract through the schema, not
    special cases."""

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, media, mtypes = [], [], [], []
        for mid, data, mt in zip(batch.column("media_id").to_pylist(),
                                 batch.column("media").to_pylist(),
                                 batch.column("media_type").to_pylist()):
            # same dispatch shape as MediaFeatureStage: a real decoder
            # plugged into _decode_real must feed the sampler, not be
            # discarded before an unconditional raw8 parse
            frames = _decode_raw8_video(data) if mt == "video/raw8v" \
                else _decode_real(data, mt)
            n = len(frames)
            take = np.unique((np.arange(self.n_samples) * n)
                             // self.n_samples)
            for j in take:
                ids.append(mid)
                fidx.append(int(j))
                media.append(encode_raw8(frames[j]))
                mtypes.append("image/raw8")
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "media": pa.array(media, pa.binary()),
            "media_type": pa.array(mtypes, pa.string()),
        })


def video_frame_features(ds, n_samples: int = 4, batch_size: int = 32):
    """video -> sampled frames -> per-frame features: two actor-pool stages
    composed through the shared media schema."""
    frames = ds.map_batches(FrameSampleStage,
                            fn_constructor_args=(n_samples,),
                            batch_format="pyarrow", batch_size=batch_size,
                            concurrency=(1, 8))
    return frames.map_batches(MediaFeatureStage, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=(1, 8))


# ---------------------------------------------------------------------------
# audio: chunking + features (RAWA = MAGIC_A + rate + int16 samples)
# ---------------------------------------------------------------------------

MAGIC_A = b"R8AU"


def encode_rawa(samples: np.ndarray, rate: int = 16000) -> bytes:
    return MAGIC_A + struct.pack("<I", rate) + \
        samples.astype("<i2").tobytes()


def _decode_rawa(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != MAGIC_A:
        raise ValueError("not a RAWA payload")
    rate = struct.unpack("<I", data[4:8])[0]
    return rate, np.frombuffer(data[8:], "<i2")


def make_audio_table(n: int, seed: int = 17) -> pa.Table:
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        n_s = int(rng.integers(1000, 8000))
        samples = (rng.standard_normal(n_s) * 3000).astype(np.int16)
        rows.append((i, encode_rawa(samples), "audio/rawa"))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array([r[2] for r in rows], pa.string()),
    })


class AudioChunkStage:
    """Fixed-length chunking + per-chunk features (RMS, zero-crossing rate)
    — the whisper-style pre-segmentation shape, one output row per chunk."""

    def __init__(self, chunk_samples: int = 2048):
        self.chunk_samples = chunk_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, cidx, rms, zcr = [], [], [], []
        for mid, data, mt in zip(batch.column("media_id").to_pylist(),
                                 batch.column("media").to_pylist(),
                                 batch.column("media_type").to_pylist()):
            _, samples = _decode_rawa(data) if mt == "audio/rawa" \
                else _decode_real(data, mt)
            for j in range(0, len(samples), self.chunk_samples):
                chunk = samples[j:j + self.chunk_samples].astype(np.float64)
                ids.append(mid)
                cidx.append(j // self.chunk_samples)
                rms.append(float(np.sqrt(np.mean(chunk ** 2))))
                sign = np.signbit(chunk)
                zcr.append(float(np.mean(sign[1:] != sign[:-1]))
                           if len(chunk) > 1 else 0.0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int32()),
            "rms": pa.array(rms, pa.float64()),
            "zero_crossing_rate": pa.array(zcr, pa.float64()),
        })

"""Multimodal columns: opaque binary media + typed metadata, processed by
actor-pool map_batches stages.

Decode surface (the container has no PIL/cv2/soundfile; everything below
is stdlib + numpy):

- ``RAW8`` (our deterministic fake format: 8-byte header ``R8xx`` + width +
  height + grayscale bytes) — trivially real; exercises the Ray-side
  plumbing (schema, actor signature, batch sizing for fat binaries).
- ``image/png`` — REAL decoder: stdlib zlib + numpy scanline unfiltering
  (all five PNG filter types; gray at bit 1/2/4/8/16, gray+alpha,
  RGB/RGBA at 8/16 bit, PALETTE at bit 1/2/4/8 via PLTE lookup, Adam7
  INTERLACED or progressive-scan), RGB folded to BT.601 luma, 16-bit
  reduced by the exact round(v/257). Palette/RGB/interlaced/16-bit paths
  are verified bit-exact against the JDK's ImageIO (golden/png.json via
  tools/PngGolden.java). Filter-0/2 rows unfilter vectorized;
  Sub/Average/Paeth rows pay a per-pixel loop (documented perf caveat —
  plug PIL here for throughput, the function signature doesn't change).
- ``audio/wav`` — REAL decoder: stdlib ``wave`` (PCM16, channels averaged
  to mono).
- ``image/jpeg`` — REAL decoder: from-scratch baseline sequential
  decoder (functions/jpeg_codec, IJG islow IDCT + fancy upsampling)
  verified BIT-EXACT against Java ImageIO (libjpeg-6b lineage) over the
  fixture corpus; grayscale + YCbCr 4:4:4/4:2:2/4:2:0 and progressive
  (SOF2), incl. streams the JDK's own encoder produced.
- real video containers still raise ``NotImplementedError`` in
  ``_decode_real`` — clearly marked; plugging ffmpeg changes one
  function, not the pipeline.

Feature extraction (byte histograms, moments) is real numpy — the shape a
CLIP/whisper embedding stage would have (load model per actor in __init__,
batch-infer in __call__).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"R8IM"


def encode_raw8(pixels: np.ndarray) -> bytes:
    """Pack a (h, w) uint8 image into the RAW8 container."""
    h, w = pixels.shape
    return MAGIC + struct.pack("<II", w, h) + pixels.tobytes()


def make_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fixture: n small 'images' with metadata. Every third
    row ships as a REAL PNG (same pixels, so the independently recomputed
    goldens hold) — the driver entries exercise the real decoder, not just
    the RAW8 fast path. Every second PNG row is a PALETTE PNG with a
    permuted gray palette (palette[j] = (p[j],)*3, indices = p^-1[px]):
    lossless — decoded BT.601 luma of (v,v,v) rounds back to v exactly —
    so the pixel-spec goldens still hold while the PLTE lookup path is
    exercised end to end."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if i % 6 == 5:
            perm = rng.permutation(256).astype(np.uint8)
            inv = np.empty(256, np.uint8)
            inv[perm] = np.arange(256, dtype=np.uint8)
            pal = np.repeat(perm[:, None], 3, axis=1)
            rows.append((i, encode_png_palette(inv[px], pal),
                         "image/png", w, h))
        elif i % 3 == 2:
            rows.append((i, encode_png_gray(px), "image/png", w, h))
        else:
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# IHDR color type -> channel count (3 = palette indices, 1/px)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png_gray(px: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder for 8-bit grayscale (filter 0 rows) —
    deterministic fixture source; output opens in any PNG viewer."""
    h, w = px.shape
    chunk = _png_chunk
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def encode_png_palette(px: np.ndarray, palette: np.ndarray,
                       bit: int = 8) -> bytes:
    """Minimal REAL palette (color type 3) PNG encoder: ``px`` holds
    palette INDICES (< 2^bit), ``palette`` is (n, 3) uint8 RGB. bit in
    {1, 2, 4, 8}; sub-byte indices pack MSB-first per scanline (spec
    7.2), rows use filter 0. Deterministic fixture source; output opens
    in any PNG viewer."""
    h, w = px.shape
    if palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("palette must be (n, 3) uint8")
    if px.max(initial=0) >= (1 << bit):
        raise ValueError(f"palette index >= 2^{bit}")
    chunk = _png_chunk
    lines = []
    for y in range(h):
        if bit == 8:
            lines.append(b"\x00" + px[y].astype(np.uint8).tobytes())
        else:
            bits = ((px[y].astype(np.uint8)[:, None]
                     >> np.arange(bit - 1, -1, -1)) & 1).reshape(-1)
            lines.append(b"\x00" + np.packbits(bits).tobytes())
    return (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, bit, 3, 0,
                                         0, 0))
            + chunk(b"PLTE", palette.astype(np.uint8).tobytes())
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def _encode_png_8bit(arr: np.ndarray, color: int) -> bytes:
    """Filter-0 8-bit PNG for color types 0/2/4/6 from an (h, w, c)
    (or (h, w) gray) uint8 array — fixture-only sibling of
    ``encode_png_gray``."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    chunk = _png_chunk
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color,
                                         0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))


def _encode_png_adam7(arr: np.ndarray, color: int,
                      palette: np.ndarray | None = None) -> bytes:
    """Adam7-INTERLACED 8-bit PNG (filter-0 rows per pass) from (h, w)
    indices/gray or (h, w, c) samples — fixture source for the
    interlaced decode path."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    passes = []
    for x0, y0, dx, dy in _ADAM7:
        sub = arr[y0::dy, x0::dx, :]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            passes.append(b"\x00" + sub[y].astype(np.uint8).tobytes())
    out = (_PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)))
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(b"".join(passes))) \
        + _png_chunk(b"IEND", b"")


def _encode_png_16bit(arr16: np.ndarray, color: int) -> bytes:
    """16-bit big-endian PNG (filter-0 rows) from (h, w[, c]) uint16."""
    if arr16.ndim == 2:
        arr16 = arr16[:, :, None]
    h, w, c = arr16.shape
    raw = b"".join(b"\x00" + arr16[y].astype(">u2").tobytes()
                   for y in range(h))
    return (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16,
                                              color, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def make_png_fixture_set(seed: int = 31) -> list:
    """Deterministic (name, png_bytes) pairs covering every decoder
    branch — 8-bit gray / gray+alpha / RGB / RGBA, palette at bit
    1/2/4/8 with random RGB palettes, sub-byte grayscale. Shared by
    tools/gen_goldens.py (which decodes the SAME bytes with the JDK's
    ImageIO as the independent oracle) and the pytest golden
    comparison."""
    out = []
    rng = np.random.Generator(np.random.PCG64(seed))
    for k in range(4):
        w, h = int(rng.integers(5, 24)), int(rng.integers(5, 24))
        out.append((f"gray8_{k}", encode_png_gray(
            rng.integers(0, 256, (h, w), dtype=np.uint8))))
        out.append((f"rgb8_{k}", _encode_png_8bit(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), 2)))
        out.append((f"rgba8_{k}", _encode_png_8bit(
            rng.integers(0, 256, (h, w, 4), dtype=np.uint8), 6)))
        out.append((f"graya8_{k}", _encode_png_8bit(
            rng.integers(0, 256, (h, w, 2), dtype=np.uint8), 4)))
        for bit in (1, 2, 4, 8):
            n = 1 << bit
            pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
            idx = rng.integers(0, n, (h, w), dtype=np.uint8)
            out.append((f"pal{bit}_{k}",
                        encode_png_palette(idx, pal, bit=bit)))
        # Adam7 interlaced RGB + palette, and 16-bit RGB (random low
        # bytes prove the high-byte reduction) — all JDK-checked
        out.append((f"rgb8i_{k}", _encode_png_adam7(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), 2)))
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        out.append((f"pal8i_{k}", _encode_png_adam7(
            rng.integers(0, 256, (h, w), dtype=np.uint8), 3,
            palette=pal)))
        out.append((f"rgb16_{k}", _encode_png_16bit(
            rng.integers(0, 1 << 16, (h, w, 3)).astype(np.uint16), 2)))
    return out


def decode_png_gray(data: bytes) -> np.ndarray:
    """REAL PNG decode (stdlib zlib + numpy) to an (h, w) uint8 grayscale
    image: gray (bit 1/2/4/8), gray+alpha, RGB, RGBA (8-bit), and PALETTE
    (bit 1/2/4/8, PLTE lookup), non-interlaced, all five scanline
    filters. RGB — including palette entries — folds to BT.601 luma;
    alpha (channel or tRNS) is dropped; sub-byte grayscale rescales to
    the full 8-bit range (spec 12.5 sample depth scaling); 16-bit
    samples reduce by the exact round(v/257); Adam7 interlace is
    reassembled. Unsupported combinations (sub-byte RGB, 16-bit
    palette, unknown color types) raise NotImplementedError."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat: list[bytes] = []
    w = h = channels = bit = color = None
    plte = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bit, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            channels = _PNG_CHANNELS.get(color)
            bit_ok = (bit == 8
                      or (color in (0, 3) and bit in (1, 2, 4))
                      or (bit == 16 and color in (0, 2, 4, 6)))
            if channels is None or interlace not in (0, 1) or not bit_ok:
                raise NotImplementedError(
                    f"PNG bit={bit} color={color} interlace={interlace} "
                    "unsupported")
        elif typ == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("malformed PNG (missing IHDR/IDAT)")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    bpp = max(1, channels * bit // 8)  # filters act on bytes (spec 9.2)

    def extract(rows_bytes: np.ndarray, ph: int, pw: int) -> np.ndarray:
        """(ph, stride) unfiltered bytes -> (ph, pw, channels) uint8
        samples. 16-bit samples scale by round(v / 257) — the exact
        16->8 inverse (65535/255 == 257), matching the JDK's ImageIO
        reduction bit for bit; sub-byte samples unpack MSB-first
        (spec 7.2)."""
        if bit == 8:
            return rows_bytes[:, :pw * channels] \
                .reshape(ph, pw, channels)
        if bit == 16:
            v = rows_bytes[:, :pw * channels * 2] \
                .reshape(ph, pw, channels, 2).astype(np.uint32)
            v16 = (v[:, :, :, 0] << 8) | v[:, :, :, 1]
            return ((v16 + 128) // 257).astype(np.uint8)
        bits = np.unpackbits(rows_bytes, axis=1)[:, :pw * bit] \
            .reshape(ph, pw, bit).astype(np.uint8)
        weights = (1 << np.arange(bit - 1, -1, -1)).astype(np.uint8)
        return (bits * weights).sum(axis=2).astype(np.uint8)[:, :, None]

    if interlace == 0:
        stride = (w * channels * bit + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        samples = extract(_png_unfilter(raw.reshape(h, stride + 1),
                                        bpp), h, w)
    else:  # Adam7: 7 sub-images, each filtered independently
        samples = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = (pw * channels * bit + 7) // 8
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise ValueError("PNG data length mismatch (interlace)")
            block = raw[off:off + need].reshape(ph, stride + 1)
            off += need
            samples[y0::dy, x0::dx, :] = extract(
                _png_unfilter(block, bpp), ph, pw)
        if off != len(raw):
            raise ValueError("PNG data length mismatch (interlace)")

    if color == 3:
        px = plte[samples[:, :, 0]]  # palette indices -> (h, w, 3) RGB
    elif color == 0 and bit in (1, 2, 4):
        # sub-byte gray: rescale to the 8-bit range (spec 12.5)
        return (samples[:, :, 0].astype(np.uint16) * 255
                // ((1 << bit) - 1)).astype(np.uint8)
    elif channels in (1, 2):  # gray / gray+alpha
        return np.ascontiguousarray(samples[:, :, 0])
    else:
        px = samples
    luma = (0.299 * px[:, :, 0].astype(np.float64)
            + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2])
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)


def _png_unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters over (n, stride+1) bytes
    (leading filter-type byte per row); returns (n, stride) uint8."""
    n, s1 = rows.shape
    stride = s1 - 1
    ftype = rows[:, 0]
    out = np.zeros((n, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(n):
        cur = rows[y, 1:].astype(np.int32)
        f = int(ftype[y])
        if f == 0:
            rec = cur
        elif f == 2:  # Up — vectorized
            rec = cur + prev
        elif f == 1:  # Sub — sequential in x (per-pixel dependency);
            rec = cur  # mod-256 applies PER BYTE (PNG spec 9.2), so mask
            for x in range(bpp, stride):  # as we go — Average/Paeth read
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF  # the masked left
        elif f == 3:  # Average
            rec = cur
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                rec[x] = (rec[x] + (a if (da <= db and da <= dc)
                                    else (b if db <= dc else c))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        rec &= 0xFF
        out[y] = rec
        prev = rec
    return out


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """REAL mono PCM16 WAV bytes via stdlib ``wave``."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """REAL WAV decode via stdlib ``wave``: (rate, int16 mono samples);
    multi-channel audio averages to mono. PCM16 only (the overwhelmingly
    common crawl shape); other sample widths raise."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV sample width {wf.getsampwidth() * 8}-bit unsupported "
                "(PCM16 only)")
        nch = wf.getnchannels()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    samples = np.frombuffer(frames, "<i2")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1).round() \
            .astype(np.int16)
    return rate, samples


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """REAL baseline JPEG decode (functions/jpeg_codec — from-scratch
    islow decoder, bit-exact vs the Java ImageIO/libjpeg golden oracle)
    to (h, w) uint8; color images fold to BT.601 luma with the same
    round/clip convention as the PNG path."""
    from ..functions.jpeg_codec import decode_jpeg

    px = decode_jpeg(data)
    if px.ndim == 2:
        return px
    luma = (0.299 * px[:, :, 0].astype(np.float64)
            + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2])
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)


def _golden_jpeg_streams() -> list[tuple[int, bytes]]:
    """The Java-ImageIO-ENCODED fixture streams stored (base64) in
    golden/jpeg.json — real 4:2:0-subsampled and progressive files from
    an encoder that is not ours. Stable ids 1000+idx, jpeg420 rows first
    then jpeg_progressive, in stored order."""
    import base64
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "..", "golden", "jpeg.json")
    with open(os.path.normpath(path)) as f:
        g = json.load(f)
    out = []
    i = 1000
    for key in ("jpeg420", "jpeg_progressive"):
        for r in g.get(key, []):
            out.append((i, base64.b64decode(r["jpg_b64"])))
            i += 1
    return out


def make_jpeg_table(n: int, seed: int = 23,
                    with_golden: bool = False) -> pa.Table:
    """Deterministic REAL-JPEG fixture: alternating grayscale / RGB 4:4:4
    baseline images across content kinds (noise, gradient, flat, blocky)
    and the full quality range. Golden features come from decoding THESE
    BYTES with Java ImageIO (tools/JpegGolden.java) — the fixture-spec
    recompute used for RAW8/PNG cannot apply here because JPEG is lossy.
    ``with_golden`` appends the Java-ENCODED 4:2:0 + progressive streams
    (ids 1000+) so the driver entry also exercises the subsampled and
    multi-scan decode paths."""
    from ..functions.jpeg_codec import encode_jpeg_gray, encode_jpeg_rgb

    qualities = (35, 50, 75, 85, 95)
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
        kind = i % 4
        if kind == 0:
            px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        elif kind == 1:
            px = (np.add.outer(np.arange(h), np.arange(w))
                  * 3 % 256).astype(np.uint8)
        elif kind == 2:
            px = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        else:
            px = ((np.add.outer(np.arange(h) // 4, np.arange(w) // 4) % 2)
                  * 255).astype(np.uint8)
        q = qualities[i % len(qualities)]
        if i % 2 == 0:
            data = encode_jpeg_gray(px, quality=q)
        else:
            rgb = np.stack([px,
                            np.roll(px, 1, axis=0),
                            np.roll(px, 1, axis=1)], axis=-1)
            data = encode_jpeg_rgb(rgb, quality=q)
        rows.append((i, data, w, h))
    if with_golden:
        for mid, data in _golden_jpeg_streams():
            i = data.index(b"\xff\xc0") if b"\xff\xc0" in data else \
                data.index(b"\xff\xc2")
            gh, gw = struct.unpack(">HH", data[i + 5:i + 9])
            rows.append((mid, data, gw, gh))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array(["image/jpeg"] * len(rows), pa.string()),
        "width": pa.array([r[2] for r in rows], pa.int32()),
        "height": pa.array([r[3] for r in rows], pa.int32()),
    })


def _decode_real(data: bytes, media_type: str):
    if media_type == "image/png":
        return decode_png_gray(data)
    if media_type == "image/jpeg":
        return decode_jpeg_gray(data)
    if media_type in ("audio/wav", "audio/x-wav"):
        return decode_wav(data)
    if media_type == "video/x-msvideo":
        return decode_avi_mjpeg(data)
    if media_type == "video/mpeg":
        from ..functions.mpeg1_codec import decode_mpeg1_iframes

        return decode_mpeg1_iframes(data)
    # remaining stub: inter-frame video codecs (H.264/VP9/... and
    # MPEG-1 P/B pictures) need motion compensation — ffmpeg (absent
    # here) or a from-scratch inter decoder; plug in below — the
    # surrounding pipeline is format-agnostic
    raise NotImplementedError(
        f"decoder for {media_type!r} not available in this environment; "
        "plug ffmpeg in here")


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


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25,
                     quality: int = 85) -> bytes:
    """REAL Motion-JPEG AVI (RIFF container per the public msdn/OpenDML
    spec): avih/strh('vids'/'MJPG')/strf headers + one '00dc' chunk per
    frame holding a full baseline JPEG from functions/jpeg_codec."""
    from ..functions.jpeg_codec import encode_jpeg_gray

    h, w = frames[0].shape
    jpegs = [encode_jpeg_gray(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    max_sz = max(len(j) for j in jpegs)
    avih = struct.pack("<10I", 1000000 // fps, max_sz * fps, 0, 0x10,
                       len(frames), 0, 1, max_sz, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            max_sz, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_mjpeg(data: bytes) -> np.ndarray:
    """REAL MJPEG AVI decode: RIFF walk to the 'movi' LIST, decode every
    '00dc'/'00db' frame chunk with the from-scratch JPEG decoder. Returns
    (n, h, w) uint8 (grayscale streams; color folds to luma)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            sz = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            yield fourcc, pos + 8, sz
            pos += 8 + sz + (sz & 1)

    frames = []
    for fourcc, off, sz in walk(data, 12, len(data)):
        if fourcc == b"LIST" and data[off:off + 4] == b"movi":
            for fc, o, s in walk(data, off + 4, off + sz):
                if fc[2:4] in (b"dc", b"db") and s:
                    frames.append(decode_jpeg_gray(data[o:o + s]))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return np.stack(frames)


def make_mjpeg_video_table(n: int, seed: int = 31) -> pa.Table:
    """Deterministic REAL-MJPEG-AVI fixture (grayscale frames, mixed
    content, quality 85). Golden features come from Java-ImageIO-decoding
    the per-frame JPEG bytes (recomputed from this same spec by
    tools/gen_goldens.py) — matching them proves both the RIFF extraction
    and the JPEG decode."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        nf = int(rng.integers(4, 12))
        w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        frames = [rng.integers(0, 256, (h, w), dtype=np.uint8)
                  if (i + j) % 2 == 0 else
                  ((np.add.outer(np.arange(h), np.arange(w)) * (j + 2))
                   % 256).astype(np.uint8)
                  for j in range(nf)]
        rows.append((i, encode_avi_mjpeg(frames), "video/x-msvideo", nf))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array([r[2] for r in rows], pa.string()),
        "n_frames": pa.array([r[3] for r in rows], pa.int32()),
    })


def make_mpeg1_video_table(n: int, seed: int = 47) -> pa.Table:
    """Deterministic REAL-MPEG-1 fixture: every frame is an 8x8-constant
    mosaic, which the intra codec reproduces LOSSLESSLY (DC-only blocks:
    dc_level = round(8v/8) = v exactly, zero AC) — so golden features
    recompute from this pixel spec alone, independent of the decoder,
    the same pattern as the RAW8/PNG fixtures. Exercises sequence/GOP/
    picture/slice parsing, macroblock addressing, B.5a/B.5b DC
    prediction chains and the islow IDCT end to end."""
    from ..functions.mpeg1_codec import encode_mpeg1_iframes

    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        nf = int(rng.integers(3, 9))
        mw, mh = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        frames = [np.repeat(np.repeat(
            rng.integers(0, 256, (mh * 2, mw * 2), dtype=np.uint8),
            8, axis=0), 8, axis=1) for _ in range(nf)]
        rows.append((i, encode_mpeg1_iframes(frames), "video/mpeg", nf))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array([r[2] for r in rows], pa.string()),
        "n_frames": pa.array([r[3] for r in rows], pa.int32()),
    })


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
    """Every third row ships as a REAL PCM16 WAV (same samples — goldens
    hold); the rest stay RAWA."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        n_s = int(rng.integers(1000, 8000))
        samples = (rng.standard_normal(n_s) * 3000).astype(np.int16)
        if i % 3 == 2:
            rows.append((i, encode_wav(samples), "audio/wav"))
        else:
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

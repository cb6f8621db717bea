"""From-scratch baseline JPEG codec (ITU-T T.81, public spec).

Decoder (`decode_jpeg`): baseline/extended sequential (SOF0/SOF1) AND
progressive Huffman (SOF2 — spectral selection + successive
approximation, DC/AC first and refinement passes with jdphuff's exact
EOB-run semantics), 8-bit, grayscale or YCbCr with any 1x1/2x1/1x2/2x2
per-component sampling (so real-world 4:2:0 and 4:2:2 streams decode,
with libjpeg's default "fancy" triangle-filter upsampling reproduced
exactly) — marker parse (SOI/APP/DQT/SOF/DHT/SOS/DRI/RST/EOI),
MCU-interleaved and non-interleaved entropy layouts, canonical Huffman
entropy decode with DC prediction and byte unstuffing, dequantization,
and the IJG libjpeg "islow" fixed-point inverse DCT
(Loeffler-Ligtenberg-Moshovitz algorithm, CONST_BITS=13/PASS1_BITS=2
scaling with round-half-up descales) so the output matches what a
libjpeg-6b-derived decoder (e.g. Java ImageIO, which the golden
generator drives) produces BIT-FOR-BIT on valid baseline streams; the
final level shift uses a plain clamp, which equals libjpeg's
range-limit table on any stream whose descaled samples stay inside the
table's linear band (always true for streams produced by a real
encoder). Color output applies libjpeg's fixed-point YCbCr->RGB
(SCALEBITS=16, round-half-up, clamp). Arithmetic coding, 12-bit,
hierarchical, and sampling factors beyond 2 raise NotImplementedError
loudly. Verified bit-exact against Java ImageIO over 180+ streams
including real 4:2:0 and progressive files produced by the JDK's own
encoder (tests/test_jpeg.py, golden/jpeg.json).

Encoder (`encode_jpeg_gray` / `encode_jpeg_rgb`): fixture source only —
Annex K example quantization tables (quality-scaled per the public IJG
formula) and Annex K typical Huffman tables, float forward DCT,
round-half-away quantization. The encoder needs no bit-parity with
anything: goldens come from decoding its OUTPUT BYTES independently.

The IDCT is vectorized over all blocks of a component at once (numpy
int64 lanes; every intermediate of a valid stream fits int32, so int64
reproduces libjpeg's INT32 arithmetic exactly). The entropy decode is
per-symbol Python — fine for the fixture sizes this repo decodes;
plug a C kernel behind the same function if corpus-scale JPEG ever
lands (same caveat as the PNG unfilter loop in pipelines/multimodal).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (ITU-T T.81 Annex K — public spec content)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 example quantization tables (luminance, chrominance)
QTAB_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
QTAB_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUM = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
          tuple(range(12)))
DC_CHR = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
          tuple(range(12)))
AC_LUM = ((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d), (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
AC_CHR = ((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77), (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))


def _scaled_qtab(base: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling: q<50 -> 5000/q, else 200-2*q percent;
    entries clamped to [1, 255] (8-bit baseline)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _build_huff_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): returns
    {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huff_decode(bits, vals):
    """{(length, code): symbol} for the bit-serial decoder."""
    enc = _build_huff_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


# ---------------------------------------------------------------------------
# encoder (fixture source)
# ---------------------------------------------------------------------------

_DCT_COS = np.array([[np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
                     for u in range(8)])
_DCT_SCALE = np.array([np.sqrt(0.125) if u == 0 else 0.5 for u in range(8)])


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Float forward DCT-II of (n, 8, 8) level-shifted samples."""
    a = np.einsum("ux,nxy->nuy", _DCT_COS, blocks)
    a = np.einsum("vy,nuy->nuv", _DCT_COS, a)
    return a * _DCT_SCALE[:, None] * _DCT_SCALE[None, :]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _encode_magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _tile_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate to multiples of 8 and tile into (n, 8, 8),
    row-major block order."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    t = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return t, bh, bw


def _entropy_encode_component(coefs: np.ndarray, dc_tab, ac_tab,
                              bw: _BitWriter, pred: int) -> int:
    dc_codes = _build_huff_codes(*dc_tab)
    ac_codes = _build_huff_codes(*ac_tab)
    for blk in coefs:
        zz = blk.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s, bits = _encode_magnitude(diff)
        code, ln = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(bits, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            s, bits = _encode_magnitude(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(bits, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]  # EOB
            bw.put(code, ln)
    return pred


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks, _, _ = _tile_blocks(plane.astype(np.float64) - 128.0)
    coefs = _fdct_blocks(blocks)
    q = coefs / qtab[None, :, :]
    # round half away from zero (any deterministic rule works here)
    return (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _dht_payload(tc_th: int, tab) -> bytes:
    bits, vals = tab
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def encode_jpeg_gray(px: np.ndarray, quality: int = 85) -> bytes:
    """Baseline sequential grayscale JPEG of an (h, w) uint8 array."""
    h, w = px.shape
    qt = _scaled_qtab(QTAB_LUM, quality)
    coefs = _quantize_plane(px, qt)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xDB, bytes([0]) + bytes(
        qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += _marker(0xC0, struct.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0]))
    out += _marker(0xC4, _dht_payload(0x00, DC_LUM))
    out += _marker(0xC4, _dht_payload(0x10, AC_LUM))
    out += _marker(0xDA, struct.pack(">B", 1) + bytes([1, 0x00])
                   + bytes([0, 63, 0]))
    bw = _BitWriter()
    _entropy_encode_component(coefs, DC_LUM, AC_LUM, bw, 0)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr (float -> rounded uint8 planes)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.stack([y, cb, cr], axis=0) + 0.5, 0,
                   255).astype(np.uint8)


def encode_jpeg_rgb(rgb: np.ndarray, quality: int = 85) -> bytes:
    """Baseline sequential YCbCr 4:4:4 JPEG of an (h, w, 3) uint8 array."""
    h, w, _ = rgb.shape
    planes = _rgb_to_ycbcr(rgb)
    qt_l = _scaled_qtab(QTAB_LUM, quality)
    qt_c = _scaled_qtab(QTAB_CHR, quality)
    out = bytearray(b"\xff\xd8")
    out += _marker(0xDB, bytes([0]) + bytes(
        qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += _marker(0xDB, bytes([1]) + bytes(
        qt_c.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += _marker(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                   + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _marker(0xC4, _dht_payload(0x00, DC_LUM))
    out += _marker(0xC4, _dht_payload(0x10, AC_LUM))
    out += _marker(0xC4, _dht_payload(0x01, DC_CHR))
    out += _marker(0xC4, _dht_payload(0x11, AC_CHR))
    out += _marker(0xDA, struct.pack(">B", 3)
                   + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]))
    coefs = [_quantize_plane(planes[0], qt_l),
             _quantize_plane(planes[1], qt_c),
             _quantize_plane(planes[2], qt_c)]
    # 4:4:4 single-sample MCUs interleave one block per component
    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(DC_LUM, AC_LUM), (DC_CHR, AC_CHR), (DC_CHR, AC_CHR)]
    n_blocks = coefs[0].shape[0]
    for i in range(n_blocks):
        for c in range(3):
            preds[c] = _entropy_encode_component(
                coefs[c][i:i + 1], tabs[c][0], tabs[c][1], bw, preds[c])
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

CONST_BITS = 13
PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172


def _descale(x: np.ndarray, n: int) -> np.ndarray:
    return (x + (1 << (n - 1))) >> n


def _idct_1d(i0, i1, i2, i3, i4, i5, i6, i7, descale_bits):
    """One islow butterfly over numpy lanes; returns the 8 outputs in
    natural order, descaled by ``descale_bits``."""
    z1 = (i2 + i6) * _F_0_541196100
    tmp2 = z1 - i6 * _F_1_847759065
    tmp3 = z1 + i2 * _F_0_765366865
    tmp0 = (i0 + i4) << CONST_BITS
    tmp1 = (i0 - i4) << CONST_BITS
    t10, t13 = tmp0 + tmp3, tmp0 - tmp3
    t11, t12 = tmp1 + tmp2, tmp1 - tmp2
    o0, o1, o2, o3 = i7, i5, i3, i1
    z1 = o0 + o3
    z2 = o1 + o2
    z3 = o0 + o2
    z4 = o1 + o3
    z5 = (z3 + z4) * _F_1_175875602
    o0 = o0 * _F_0_298631336
    o1 = o1 * _F_2_053119869
    o2 = o2 * _F_3_072711026
    o3 = o3 * _F_1_501321110
    z1 = -z1 * _F_0_899976223
    z2 = -z2 * _F_2_562915447
    z3 = -z3 * _F_1_961570560 + z5
    z4 = -z4 * _F_0_390180644 + z5
    o0 += z1 + z3
    o1 += z2 + z4
    o2 += z2 + z3
    o3 += z1 + z4
    return (_descale(t10 + o3, descale_bits), _descale(t11 + o2, descale_bits),
            _descale(t12 + o1, descale_bits), _descale(t13 + o0, descale_bits),
            _descale(t13 - o0, descale_bits), _descale(t12 - o1, descale_bits),
            _descale(t11 - o2, descale_bits), _descale(t10 - o3, descale_bits))


def idct_islow_blocks(coefs: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """IJG islow IDCT of (n, 8, 8) natural-order quantized coefficients:
    returns (n, 8, 8) uint8 samples. Bit-exact vs libjpeg-6b for valid
    streams (see module docstring for the range-limit equivalence)."""
    x = coefs.astype(np.int64) * qtab[None, :, :].astype(np.int64)
    # pass 1: columns (libjpeg skips the butterfly for all-zero-AC
    # columns; the general path yields identical values, so no branch)
    cols = [x[:, k, :] for k in range(8)]
    r = _idct_1d(cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                 cols[6], cols[7], CONST_BITS - PASS1_BITS)
    ws = np.stack(r, axis=1)  # (n, row, col) workspace
    # pass 2: rows
    rows = [ws[:, :, k] for k in range(8)]
    r = _idct_1d(rows[0], rows[1], rows[2], rows[3], rows[4], rows[5],
                 rows[6], rows[7], CONST_BITS + PASS1_BITS + 3)
    out = np.stack(r, axis=2) + 128
    return np.clip(out, 0, 255).astype(np.uint8)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.
    Returns 0 bits past the end (libjpeg's fill behavior on truncated
    data; a valid stream never reads past its own payload)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.p >= len(self.d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.p += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
                else:  # EOI / next marker: behave as end of data
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
            else:
                self.p += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def align_restart(self) -> None:
        """Drop buffered bits and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        while self.p < len(self.d) and self.d[self.p] != 0xFF:
            self.p += 1
        if self.p + 1 < len(self.d) and 0xD0 <= self.d[self.p + 1] <= 0xD7:
            self.p += 2


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.get(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _ycbcr_to_rgb_libjpeg(y: np.ndarray, cb: np.ndarray,
                          cr: np.ndarray) -> np.ndarray:
    """libjpeg's fixed-point ycc_rgb_convert (SCALEBITS=16, ONE_HALF
    rounding, per-sample clamp) — (h, w, 3) uint8."""
    one_half = 1 << 15
    yv = y.astype(np.int64)
    cbv = cb.astype(np.int64) - 128
    crv = cr.astype(np.int64) - 128
    fix = lambda x: int(x * (1 << 16) + 0.5)  # noqa: E731
    r = yv + ((fix(1.40200) * crv + one_half) >> 16)
    b = yv + ((fix(1.77200) * cbv + one_half) >> 16)
    g = yv + ((-fix(0.34414) * cbv - fix(0.71414) * crv + one_half) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _scan_end(data: bytes, pos: int) -> int:
    """First non-stuffed, non-RST marker after ``pos`` (end of one scan's
    entropy data; 0xFF fill bytes before a marker are allowed)."""
    i = pos
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            return len(data)
        m = data[j + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            i = j + 2
        elif m == 0xFF:
            i = j + 1
        else:
            return j


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential (SOF0) or progressive-Huffman (SOF2)
    JPEG. Returns (h, w) uint8 for 1-component streams, (h, w, 3) uint8
    RGB for 3-component images (any 1x1/2x1/1x2/2x2 sampling)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    state = None
    restart_interval = 0
    p = 2
    while p < len(data):
        if data[p] != 0xFF:
            p += 1
            continue
        m = data[p + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            p += 2
            continue
        if m == 0xD9:
            break
        seg_len = struct.unpack(">H", data[p + 2:p + 4])[0]
        seg = data[p + 4:p + 2 + seg_len]
        p_next = p + 2 + seg_len
        if m == 0xDB:
            q = 0
            while q < len(seg):
                pq, tq = seg[q] >> 4, seg[q] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[q + 1:q + 65], np.uint8)
                t = np.zeros(64, np.int64)
                t[ZIGZAG] = zz
                qtabs[tq] = t.reshape(8, 8)
                q += 65
        elif m == 0xC4:
            q = 0
            while q < len(seg):
                tc, th = seg[q] >> 4, seg[q] & 0xF
                bits = tuple(seg[q + 1:q + 17])
                nv = sum(bits)
                vals = tuple(seg[q + 17:q + 17 + nv])
                htabs[(tc, th)] = _build_huff_decode(bits, vals)
                htabs[("raw", tc, th)] = (bits, vals)
                q += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} unsupported "
                        "(1x1/2x1/1x2/2x2 only)")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": m == 0xC2}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported SOF marker 0x{m:02x} (baseline sequential "
                "and progressive Huffman only)")
        elif m == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            if state is None:
                state = _alloc_state(frame)
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci, comp = next(
                    (i, x) for i, x in enumerate(frame["comps"])
                    if x["id"] == cs)
                scan.append((ci, comp, tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            _scan_pass(data, p_next, frame, state, scan, htabs,
                       restart_interval, ss, se, ahal >> 4, ahal & 0xF)
            p = _scan_end(data, p_next)
            continue
        p = p_next
    if state is None:
        raise ValueError("no SOS marker found")
    return _finish(frame, state, qtabs)


def _alloc_state(frame) -> dict:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    grids, coefs = [], []
    for comp in frame["comps"]:
        gw, gh = mcux * comp["h"], mcuy * comp["v"]
        grids.append((gw, gh))
        coefs.append(np.zeros((gw * gh, 64), np.int64))
    return {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
            "grids": grids, "coefs": coefs}


def _scan_pass(data, pos, frame, state, scan, htabs, ri, ss, se, ah, al):
    """Decode one scan's entropy data into the persistent coefficient
    arrays: sequential full-band, or one of the four progressive passes
    (DC/AC x first/refinement, T.81 Annex G / jdphuff.c semantics)."""
    br = _BitReader(data, pos)
    progressive = frame["progressive"]
    if progressive:
        if not ((ss == 0 and se == 0)
                or (0 < ss <= se <= 63 and len(scan) == 1)):
            raise ValueError(
                f"invalid progressive scan header Ss={ss} Se={se} "
                f"ns={len(scan)}")
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("invalid sequential scan header")
    preds = {ci: 0 for ci, *_ in scan}
    eobrun = 0
    interleaved = len(scan) > 1
    hmax, vmax = state["hmax"], state["vmax"]
    if interleaved:
        units = state["mcux"] * state["mcuy"]
        ux, uy = state["mcux"], state["mcuy"]
    else:
        ci0, comp0 = scan[0][0], scan[0][1]
        cw = -(-frame["w"] * comp0["h"] // hmax)
        ch = -(-frame["h"] * comp0["v"] // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        units = nbx * nby
        ux, uy = nbx, nby
    if not progressive and _scan_pass_c(data, pos, state, scan, htabs,
                                        ri, ux, uy, interleaved):
        return
    for u in range(units):
        if ri and u and u % ri == 0:
            br.align_restart()
            preds = {ci: 0 for ci, *_ in scan}
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, state["mcux"])
            for ci, comp, td, ta in scan:
                gw = state["grids"][ci][0]
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        blk = state["coefs"][ci][
                            (my * comp["v"] + v) * gw
                            + (mx * comp["h"] + hh)]
                        eobrun = _decode_block(
                            br, blk, htabs, td, ta, ss, se, ah, al,
                            progressive, preds, ci, eobrun)
        else:
            ci, comp, td, ta = scan[0]
            gw = state["grids"][ci][0]
            by, bx = divmod(u, nbx)
            blk = state["coefs"][ci][by * gw + bx]
            eobrun = _decode_block(br, blk, htabs, td, ta, ss, se, ah, al,
                                   progressive, preds, ci, eobrun)


def _scan_pass_c(data, pos, state, scan, htabs, ri, ux, uy,
                 interleaved) -> bool:
    """Dispatch a SEQUENTIAL scan to the C entropy decoder
    (functions/_ctok.c jpeg_scan_sequential — same bit-feed, restart and
    block semantics as the Python loop, ~200x faster). Returns False to
    fall back to Python (no compiled module, or exotic table ids)."""
    from .ctok import load as _load_ctok

    ct = _load_ctok()
    if ct is None or not hasattr(ct, "jpeg_scan_sequential"):
        return False
    huff = bytearray(8 * 272)
    seen = set()
    for key, spec in htabs.items():
        if not (isinstance(key, tuple) and len(key) == 3
                and key[0] == "raw"):
            continue
        _, tc, th = key
        if th > 3:
            return False
        bits, vals = spec
        base = (tc * 4 + th) * 272
        huff[base:base + 16] = bytes(bits)
        huff[base + 16:base + 16 + len(vals)] = bytes(vals)
        seen.add((tc, th))
    cfg = np.zeros((len(scan), 5), np.int32)
    outs = []
    for c, (ci, comp, td, ta) in enumerate(scan):
        if (0, td) not in seen or (1, ta) not in seen or td > 3 or ta > 3:
            return False
        gw, gh = state["grids"][ci]
        h, v = (comp["h"], comp["v"]) if interleaved else (1, 1)
        cfg[c] = (td, 4 + ta, h, v, gw)
        outs.append(np.zeros(gw * gh * 64, np.int32))
    ct.jpeg_scan_sequential(data, pos, ux, uy, ri, len(scan),
                            cfg.tobytes(), bytes(huff), outs)
    for c, (ci, comp, td, ta) in enumerate(scan):
        state["coefs"][ci][:] = outs[c].reshape(-1, 64)
    return True


def _decode_block(br, blk, htabs, td, ta, ss, se, ah, al, progressive,
                  preds, ci, eobrun) -> int:
    """Decode one block's contribution for this scan; returns the scan's
    carried EOB run."""
    if not progressive:
        dc_tab, ac_tab = htabs[(0, td)], htabs[(1, ta)]
        s = _huff_decode(br, dc_tab)
        preds[ci] += _extend(br.get(s), s)
        blk[0] = preds[ci]
        k = 1
        while k < 64:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            blk[ZIGZAG[k]] = _extend(br.get(s), s)
            k += 1
        return 0
    p1 = 1 << al
    if ss == 0:  # DC pass (se must be 0)
        if ah == 0:  # first
            s = _huff_decode(br, htabs[(0, td)])
            preds[ci] += _extend(br.get(s), s)
            blk[0] = preds[ci] << al
        else:  # refinement: one correction bit
            if br.get(1):
                blk[0] |= p1
        return eobrun
    ac_tab = htabs[(1, ta)]
    m1 = -p1
    if ah == 0:  # AC first pass
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s:
                k += r
                if k > se:
                    raise ValueError("AC index out of band")
                blk[ZIGZAG[k]] = _extend(br.get(s), s) << al
                k += 1
            else:
                if r != 15:
                    return (1 << r) - 1 + (br.get(r) if r else 0)
                k += 16
        return 0
    # AC refinement pass (jdphuff decode_mcu_AC_refine). NOTE: unlike the
    # first pass, the EOB run here is set WITHOUT the -1 — the current
    # block is completed by the correction-bit tail below and the run is
    # decremented after it, so a run of exactly 1 still refines this
    # block's remaining nonzero coefficients.
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (br.get(r) if r else 0)
                    break
                val = 0  # ZRL: skip 16 zero coefficients
            else:
                val = p1 if br.get(1) else m1
            while k <= se:
                idx = ZIGZAG[k]
                if blk[idx] != 0:
                    if br.get(1) and (blk[idx] & p1) == 0:
                        blk[idx] += p1 if blk[idx] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            idx = ZIGZAG[k]
            if blk[idx] != 0:
                if br.get(1) and (blk[idx] & p1) == 0:
                    blk[idx] += p1 if blk[idx] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _h2v1_fancy_upsample(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v1_fancy_upsample (triangle filter, jdsample.c
    semantics): horizontal x2 of an (H, Wd) uint8-valued plane."""
    hgt, wd = p.shape
    p = p.astype(np.int64)
    if wd == 1:
        return np.repeat(p, 2, axis=1)
    out = np.empty((hgt, wd * 2), np.int64)
    out[:, 0] = p[:, 0]
    out[:, 1] = (p[:, 0] * 3 + p[:, 1] + 2) >> 2
    if wd > 2:
        mid = p[:, 1:-1] * 3
        out[:, 2:-2:2] = (mid + p[:, :-2] + 1) >> 2
        out[:, 3:-1:2] = (mid + p[:, 2:] + 2) >> 2
    out[:, -2] = (p[:, -1] * 3 + p[:, -2] + 1) >> 2
    out[:, -1] = p[:, -1]
    return out


def _h2v2_fancy_upsample(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v2_fancy_upsample: x2 both axes — a vertical 3:1
    triangle between the nearer/further input rows, then the horizontal
    triangle with the 8/7 rounding pair, edges clamped."""
    hd, wd = p.shape
    p = p.astype(np.int64)
    cs_even = p * 3 + np.vstack([p[:1], p[:-1]])   # nearer row above
    cs_odd = p * 3 + np.vstack([p[1:], p[-1:]])    # nearer row below

    def hpass(cs: np.ndarray) -> np.ndarray:
        if wd == 1:
            o = np.empty((hd, 2), np.int64)
            o[:, 0] = (cs[:, 0] * 4 + 8) >> 4
            o[:, 1] = (cs[:, 0] * 4 + 7) >> 4
            return o
        o = np.empty((hd, wd * 2), np.int64)
        o[:, 0] = (cs[:, 0] * 4 + 8) >> 4
        o[:, 1] = (cs[:, 0] * 3 + cs[:, 1] + 7) >> 4
        if wd > 2:
            mid = cs[:, 1:-1] * 3
            o[:, 2:-2:2] = (mid + cs[:, :-2] + 8) >> 4
            o[:, 3:-1:2] = (mid + cs[:, 2:] + 7) >> 4
        o[:, -2] = (cs[:, -1] * 3 + cs[:, -2] + 8) >> 4
        o[:, -1] = (cs[:, -1] * 4 + 7) >> 4
        return o

    out = np.empty((hd * 2, wd * 2), np.int64)
    out[0::2] = hpass(cs_even)
    out[1::2] = hpass(cs_odd)
    return out


def _upsample(plane: np.ndarray, hexp: int, vexp: int, h: int,
              w: int) -> np.ndarray:
    """Expand a cropped downsampled component plane to (h, w) with
    libjpeg's default (do_fancy_upsampling) kernels; the (1, 2) case
    uses replication, matching jinit_upsampler's int_upsample choice."""
    if hexp == 2 and vexp == 2:
        up = _h2v2_fancy_upsample(plane)
    elif hexp == 2 and vexp == 1:
        up = _h2v1_fancy_upsample(plane)
    elif hexp == 1 and vexp == 2:
        up = np.repeat(plane.astype(np.int64), 2, axis=0)
    else:
        up = plane.astype(np.int64)
    return up[:h, :w].astype(np.uint8)


def _finish(frame, state, qtabs) -> np.ndarray:
    """All scans decoded: IDCT each component's block grid, crop to its
    downsampled dims, upsample, color-convert."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = state["hmax"], state["vmax"]
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        gw, gh = state["grids"][ci]
        px = idct_islow_blocks(state["coefs"][ci].reshape(-1, 8, 8),
                               qtabs[comp["tq"]])
        full = px.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(gh * 8, gw * 8)
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        planes.append(_upsample(full[:ch, :cw], hmax // comp["h"],
                                vmax // comp["v"], h, w))
    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        return _ycbcr_to_rgb_libjpeg(*planes)
    raise NotImplementedError(f"{len(planes)}-component JPEG")

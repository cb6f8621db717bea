"""Generate golden oracle tables for driver entries whose semantics are not
ANSI-SQL-expressible:

- ``flagship_xapian_search``: top-20 for the flagship query produced by the
  REAL xapian-core 1.4.17 (the reference's bundled library, driven through
  the exact mdq call sequence by tools/xapian_oracle.cc) over the same
  synthesized page corpus the driver entry indexes. This is a stronger,
  non-circular oracle: the golden comes from the reference engine itself,
  not from our code. Keyed by corpus size so one SQL string serves every sf
  (the oracle SQL discriminates on ``(SELECT count(*) FROM documents)``).
- ``multimodal_features`` / ``video_frame_features`` /
  ``audio_chunk_features``: the RAW8/RAW8V/RAWA fixtures are deterministic;
  features are INDEPENDENTLY recomputed here with inline numpy (this script
  imports nothing from markdown_query_ray for the math — it re-derives
  mean/std/rms/zcr/frame-sampling from the container spec), so the golden
  is a second implementation, not a copy of the pipeline's output.
- ``jpeg_features``: JPEG is lossy, so its golden pixels come from an
  INDEPENDENT decoder of the same fixture bytes — the JDK's ImageIO JPEG
  reader (libjpeg-6b lineage), driven by tools/JpegGolden.java. Records
  per-image pixel sha256 (bit-exactness test) + luma mean/std (driver
  oracle).

Run: python tools/gen_goldens.py   (writes golden/*.json)
Requires the xapian oracle binary (tools/build_xapian_oracle.sh) and,
for the jpeg section, a JDK ``java`` on PATH.
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.environ.get("XAPIAN_ORACLE",
                        "/tmp/xapian-install/bin/xapian_oracle")
GOLDEN_DIR = os.path.join(REPO, "golden")

sys.path.insert(0, REPO)


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")


def gen_flagship(sfs=("sf0.001", "sf0.01", "sf0.1"),
                 query: str = "the fast merge", k: int = 20) -> dict:
    """Index the flagship page corpus into real xapian, run the flagship
    query through the mdq per-token orchestration, keep top-k."""
    import pyarrow.parquet as pq

    from markdown_query_ray.fixtures import pages_from_documents
    from markdown_query_ray.stages.extract import extract_text

    out: dict[str, list] = {}
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        # corpus key = count + n_chars sum: count alone collides across sfs
        # (sf0.001 and sf0.01 both hold 500 docs)
        dt = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["n_chars"])
        corpus_key = (f"{dt.num_rows}-"
                      f"{int(np.sum(dt.column('n_chars').to_numpy()))}")
        pages = pages_from_documents(sf_dir)
        urls = pages.column("url").to_pylist()
        htmls = pages.column("html").to_pylist()
        texts = [extract_text(h) for h in htmls]
        with tempfile.TemporaryDirectory() as td:
            xdb = os.path.join(td, "xdb")
            tsv = "".join(f"{_escape(u)}\t{_escape(t)}\n"
                          for u, t in zip(urls, texts))
            r = subprocess.run([ORACLE, xdb, "index"], input=tsv,
                               capture_output=True, text=True, check=True)
            assert r.stdout.strip() == f"indexed {len(urls)}", r.stdout
            q = subprocess.run([ORACLE, xdb, "query", str(k)],
                               input=query + "\n", capture_output=True,
                               text=True, check=True)
        rows = []
        for line in q.stdout.splitlines():
            qn, rank, docid, w = line.split("\t")
            doc_id = int(docid) - 1  # xapian docids are 1-based arrival order
            rows.append({"rank": int(rank), "doc_id": doc_id,
                         "score": round(float(w), 6), "url": urls[doc_id]})
        out[corpus_key] = rows
        print(f"flagship {sf}: key {corpus_key}, {len(rows)} hits, "
              f"top score {rows[0]['score'] if rows else None}")
    return {"query": query, "k": k, "by_corpus_key": out}


# ---------------------------------------------------------------------------
# multimodal: independent recomputation from the container spec
# ---------------------------------------------------------------------------

def _media_pixels(n: int, seed: int = 5):
    """Re-derive the deterministic RAW8 fixture pixels (same RNG spec as
    pipelines/multimodal.py make_media_table)."""
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
        yield i, rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def gen_multimodal(n: int = 200) -> list:
    rows = []
    for i, px in _media_pixels(n):
        a = px.astype(np.float64)
        rows.append({"media_id": i,
                     "mean_intensity": round(float(a.mean()), 6),
                     "std_intensity": round(float(a.std()), 6)})
    return rows


def _video_frames(n: int, seed: int = 9):
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        nf = int(rng.integers(4, 24))
        w, h = int(rng.integers(8, 16)), int(rng.integers(8, 16))
        yield i, rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)


def gen_video(n: int = 100, n_samples: int = 4) -> list:
    rows = []
    for i, frames in _video_frames(n):
        nf = len(frames)
        take = np.unique((np.arange(n_samples) * nf) // n_samples)
        for j in take:
            a = frames[j].astype(np.float64)
            rows.append({"media_id": i, "frame_idx": int(j),
                         "mean_intensity": round(float(a.mean()), 6),
                         "std_intensity": round(float(a.std()), 6)})
    return rows


def _audio_samples(n: int, seed: int = 17):
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        n_s = int(rng.integers(1000, 8000))
        yield i, (rng.standard_normal(n_s) * 3000).astype(np.int16)


def gen_audio(n: int = 100, chunk: int = 2048) -> list:
    rows = []
    for i, samples in _audio_samples(n):
        for j in range(0, len(samples), chunk):
            c = samples[j:j + chunk].astype(np.float64)
            sign = np.signbit(c)
            zcr = float(np.mean(sign[1:] != sign[:-1])) if len(c) > 1 else 0.0
            rows.append({"media_id": i, "chunk_idx": j // chunk,
                         "rms": round(float(np.sqrt(np.mean(c ** 2))), 6),
                         "zero_crossing_rate": round(zcr, 6)})
    return rows


# ---------------------------------------------------------------------------
# jpeg: Java ImageIO (libjpeg-6b lineage) as the independent decoder oracle.
# JPEG is lossy, so the fixture-spec recompute used above cannot produce its
# goldens — the golden pixels must come from an INDEPENDENT decode of the
# same bytes. tools/JpegGolden.java dumps ImageIO's raster for every fixture
# image; this records (a) a sha256 of those raw pixels per image for the
# bit-exactness pytest against our from-scratch decoder, and (b) the
# luma-folded mean/std features for the driver entry's SQL-VALUES oracle.
# ---------------------------------------------------------------------------

def gen_jpeg(n: int = 150) -> list:
    """Requires golden/jpeg.json to already hold the jpeg420 /
    jpeg_progressive stream sections (main() writes them first): the
    driver fixture appends those Java-encoded streams, so their feature
    rows are produced here too."""
    import hashlib

    from markdown_query_ray.pipelines.multimodal import make_jpeg_table

    t = make_jpeg_table(n, with_golden=True)
    with tempfile.TemporaryDirectory() as d:
        for mid, data in zip(t.column("media_id").to_pylist(),
                             t.column("media").to_pylist()):
            with open(os.path.join(d, f"m{mid:05d}.jpg"), "wb") as f:
                f.write(data)
        subprocess.run(
            ["java", os.path.join(REPO, "tools", "JpegGolden.java"), d],
            check=True, capture_output=True)
        rows = []
        for mid in t.column("media_id").to_pylist():
            with open(os.path.join(d, f"m{mid:05d}.raw"), "rb") as f:
                raw = f.read()
            nc = raw[0]
            h, w = struct.unpack(">II", raw[1:9])
            px = np.frombuffer(raw[9:], np.uint8)
            if nc == 1:
                gray = px.reshape(h, w).astype(np.float64)
            else:
                rgb = px.reshape(h, w, 3)
                luma = (0.299 * rgb[:, :, 0].astype(np.float64)
                        + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
                gray = np.clip(np.round(luma), 0, 255)
            rows.append({
                "media_id": int(mid),
                "mean_intensity": round(float(gray.mean()), 6),
                "std_intensity": round(float(gray.std()), 6),
                "pixel_sha256": hashlib.sha256(raw[9:]).hexdigest(),
                "channels": int(nc),
            })
    return rows


def gen_mpeg1(n: int = 60, n_samples: int = 4) -> list:
    """Golden for mpeg1_frame_features: re-derive the fixture's mosaic
    frames from the same spec (seed 47, multimodal.make_mpeg1_video_table)
    — the MPEG-1 intra codec reproduces 8x8-constant mosaics LOSSLESSLY
    (DC-only blocks, dc_level = v exactly) — and record sampled-frame
    features from the PIXELS alone, independent of encoder and decoder
    (the container has no second MPEG implementation)."""
    seed = 47
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        nf = int(rng.integers(3, 9))
        mw, mh = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        frames = [np.repeat(np.repeat(
            rng.integers(0, 256, (mh * 2, mw * 2), dtype=np.uint8),
            8, axis=0), 8, axis=1) for _ in range(nf)]
        take = np.unique((np.arange(n_samples) * nf) // n_samples)
        for j in take:
            a = frames[j].astype(np.float64)
            rows.append({"media_id": i, "frame_idx": int(j),
                         "mean_intensity": round(float(a.mean()), 6),
                         "std_intensity": round(float(a.std()), 6)})
    return rows


def gen_png() -> list:
    """Golden for the PNG decoder's colormodel paths (PALETTE at bit
    1/2/4/8, RGB, RGBA, Adam7-interlaced RGB/palette, 16-bit RGB):
    decode the deterministic fixture set with the
    JDK's ImageIO (getRGB applies the PLTE lookup inside the JDK,
    independently of our decoder), fold to BT.601 luma, and record the
    luma sha256 per fixture. Gray / gray+alpha fixtures are EXCLUDED
    from the JDK comparison: ImageIO's getRGB routes PNG gray through a
    CS_GRAY->sRGB colorspace transform (gamma), while the decoder's
    contract — like the pixel-spec driver goldens — is the raw gray
    sample; those paths are pinned by lossless roundtrip tests
    instead."""
    import hashlib

    from markdown_query_ray.pipelines.multimodal import make_png_fixture_set

    fixtures = [(nm, data) for nm, data in make_png_fixture_set()
                if nm.startswith(("pal", "rgb"))]
    rows = []
    with tempfile.TemporaryDirectory() as d:
        for nm, data in fixtures:
            with open(os.path.join(d, nm + ".png"), "wb") as f:
                f.write(data)
        subprocess.run(
            ["java", os.path.join(REPO, "tools", "PngGolden.java"), d],
            check=True, capture_output=True)
        for nm, _ in fixtures:
            with open(os.path.join(d, nm + ".rgb"), "rb") as f:
                raw = f.read()
            h, w = struct.unpack(">II", raw[:8])
            rgb = np.frombuffer(raw[8:], np.uint8).reshape(h, w, 3)
            luma = np.clip(np.round(
                0.299 * rgb[:, :, 0].astype(np.float64)
                + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]),
                0, 255).astype(np.uint8)
            rows.append({
                "name": nm, "h": int(h), "w": int(w),
                "luma_sha256": hashlib.sha256(luma.tobytes()).hexdigest(),
            })
    return rows


def gen_mjpeg(n: int = 60, n_samples: int = 4) -> list:
    """Golden for mjpeg_frame_features: re-derive each fixture video's
    per-frame JPEG bytes from the same spec (seed 31; the bytes inside
    the AVI are these exact bytes), decode the SAMPLED frames with Java
    ImageIO, and record features + pixel hashes. Matching the pipeline
    against this proves the RIFF 'movi' extraction AND the from-scratch
    JPEG decode in one shot."""
    import hashlib

    from markdown_query_ray.functions.jpeg_codec import encode_jpeg_gray

    seed = 31
    items = []  # (media_id, frame_idx, jpeg_bytes)
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 100003 + i))
        nf = int(rng.integers(4, 12))
        w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        frames = [rng.integers(0, 256, (h, w), dtype=np.uint8)
                  if (i + j) % 2 == 0 else
                  ((np.add.outer(np.arange(h), np.arange(w)) * (j + 2))
                   % 256).astype(np.uint8)
                  for j in range(nf)]
        take = np.unique((np.arange(n_samples) * nf) // n_samples)
        for j in take:
            items.append((i, int(j), encode_jpeg_gray(frames[j],
                                                      quality=85)))
    with tempfile.TemporaryDirectory() as d:
        for mid, j, data in items:
            with open(os.path.join(d, f"v{mid:05d}_{j:03d}.jpg"),
                      "wb") as f:
                f.write(data)
        subprocess.run(
            ["java", os.path.join(REPO, "tools", "JpegGolden.java"), d],
            check=True, capture_output=True)
        rows = []
        for mid, j, _ in items:
            with open(os.path.join(d, f"v{mid:05d}_{j:03d}.raw"),
                      "rb") as f:
                raw = f.read()
            h, w = struct.unpack(">II", raw[1:9])
            px = np.frombuffer(raw[9:], np.uint8).reshape(h, w) \
                .astype(np.float64)
            rows.append({
                "media_id": mid, "frame_idx": j,
                "mean_intensity": round(float(px.mean()), 6),
                "std_intensity": round(float(px.std()), 6),
                "pixel_sha256": hashlib.sha256(raw[9:]).hexdigest(),
            })
    return rows


def gen_jpeg420(progressive: bool = False) -> list:
    """Subsampled-JPEG goldens with a DOUBLY independent chain: the JDK's
    ImageIO writer ENCODES deterministic pixels (emitting real 4:2:0
    chroma for color, plus 4:4:4 gray), its reader decodes them back, and
    both the encoded bytes (base64) and the decoded pixel sha256 are
    recorded — so the pytest needs no JVM and our decoder is tested
    against streams produced by an encoder we did not write."""
    import base64
    import hashlib

    rows = []
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(11)
        specs = []
        for i, (h, w) in enumerate(((16, 16), (23, 17), (40, 32), (8, 9),
                                    (33, 47))):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            specs.append((f"c{i}", 3, px))
            g = (np.add.outer(np.arange(h), np.arange(w)) * (i + 3)
                 % 256).astype(np.uint8)
            specs.append((f"g{i}", 1, g))
        for name, nc, px in specs:
            with open(os.path.join(d, name + ".raw"), "wb") as f:
                f.write(bytes([nc]) + struct.pack(">II", *px.shape[:2])
                        + px.tobytes())
        for q in (40, 70, 90):
            qd = os.path.join(d, f"q{q}")
            os.makedirs(qd)
            for name in os.listdir(d):
                if name.endswith(".raw"):
                    os.link(os.path.join(d, name), os.path.join(qd, name))
            cmd = ["java", os.path.join(REPO, "tools", "JpegMake.java"),
                   str(q), qd]
            if progressive:
                cmd.append("progressive")
            subprocess.run(cmd, check=True, capture_output=True)
            for name in os.listdir(qd):
                if name.endswith(".raw"):
                    os.unlink(os.path.join(qd, name))
            subprocess.run(["java", os.path.join(REPO, "tools",
                                                 "JpegGolden.java"), qd],
                           check=True, capture_output=True)
            for name in sorted(os.listdir(qd)):
                if not name.endswith(".jpg"):
                    continue
                with open(os.path.join(qd, name), "rb") as f:
                    jpg = f.read()
                with open(os.path.join(qd, name[:-4] + ".raw"), "rb") as f:
                    raw = f.read()
                rows.append({
                    "name": f"q{q}_{name[:-4]}",
                    "jpg_b64": base64.b64encode(jpg).decode(),
                    "channels": int(raw[0]),
                    "pixel_sha256": hashlib.sha256(raw[9:]).hexdigest(),
                })
    return rows


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(GOLDEN_DIR, "multimodal.json"), "w") as f:
        json.dump({"multimodal_features": gen_multimodal(),
                   "video_frame_features": gen_video(),
                   "audio_chunk_features": gen_audio(),
                   "mpeg1_frame_features": gen_mpeg1()}, f)
    print("multimodal goldens written")
    try:
        sub_rows = gen_jpeg420()
        prog_rows = gen_jpeg420(progressive=True)
        # stream sections first: make_jpeg_table(with_golden=True) reads
        # them back when gen_jpeg builds the driver fixture
        with open(os.path.join(GOLDEN_DIR, "jpeg.json"), "w") as f:
            json.dump({"jpeg420": sub_rows,
                       "jpeg_progressive": prog_rows}, f)
        jpeg_rows = gen_jpeg()
        mjpeg_rows = gen_mjpeg()
        with open(os.path.join(GOLDEN_DIR, "png.json"), "w") as f:
            json.dump({"png_luma": gen_png()}, f)
        print("png palette/rgb goldens written (Java ImageIO oracle)")
        with open(os.path.join(GOLDEN_DIR, "jpeg.json"), "w") as f:
            json.dump({"jpeg_features": jpeg_rows,
                       "mjpeg_frame_features": mjpeg_rows,
                       "jpeg420": sub_rows,
                       "jpeg_progressive": prog_rows}, f)
        print("jpeg + mjpeg + 4:2:0 + progressive goldens written "
              "(Java ImageIO oracle)")
    except FileNotFoundError:
        print("SKIP jpeg goldens: no `java` on PATH (existing golden kept)")
    if not os.path.exists(ORACLE):
        print(f"SKIP flagship golden: {ORACLE} missing "
              "(run tools/build_xapian_oracle.sh)")
        return
    with open(os.path.join(GOLDEN_DIR, "flagship.json"), "w") as f:
        json.dump(gen_flagship(), f)
    print("flagship golden written")


if __name__ == "__main__":
    main()

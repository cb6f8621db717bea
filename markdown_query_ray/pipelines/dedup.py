"""Deduplication pipelines: exact, MinHash+LSH near-dup, SimHash, n-gram
Jaccard verification.

Scale shapes (ray_guide patterns):
- exact: content-hash in a vectorized map_batches, then
  ``groupby(hash).map_groups(first)`` — the only shuffle carries the 16-byte
  hash + doc_id, not the text.
- MinHash-LSH: per-batch shingle->minhash (numpy, one matrix op per doc set),
  explode to (band_id, band_hash, doc_id), groupby the band key, pairs from
  same-bucket groups, exact-Jaccard verify. Sketches are tiny and mergeable;
  the shuffle moves ~(bands x 8 bytes) per doc.
- SimHash: 64-bit signature per doc, 4x16-bit band blocking, verify by
  Hamming distance.

All hashing is FNV-1a / multiply-shift over fixed seeds — deterministic
across processes and parallelism levels.
"""

from __future__ import annotations

import hashlib
from functools import partial

import numpy as np
import pyarrow as pa

MERSENNE61 = (1 << 61) - 1


def _text_md5(text: str) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    h = [_text_md5(t) for t in batch.column(column).to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "content_hash": pa.array(h, pa.string()),
    })


def exact_dedup(ds):
    """Keep the minimum doc_id per identical text (the reference's
    first-docid-wins upsert semantics, backends/database.cc:193-208).
    Returns a Dataset with a single ``doc_id`` column of survivors.

    Shape: vectorized ``Min`` aggregate (map-side combine + hash shuffle of
    16-byte hashes) — NOT ``map_groups``, which pays a per-group Python call
    and collapses at web scale where nearly every group has size 1."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Hashes of w-token shingles (uint64). Falls back to unigrams for very
    short docs."""
    toks = [t for t in (text or "").split(" ") if t]
    if not toks:
        return np.empty(0, np.uint64)
    if len(toks) < w:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]
    out = np.empty(len(grams), np.uint64)
    for i, g in enumerate(grams):
        d = hashlib.md5(g.encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


class MinHashStage:
    """Per-batch minhash signatures. The permutation parameters (a, b) are
    generated once per actor from a fixed seed."""

    def __init__(self, num_hashes: int = 128, w: int = 3, seed: int = 7):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, MERSENNE61, size=num_hashes,
                              dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE61, size=num_hashes,
                              dtype=np.uint64)
        self.num_hashes = num_hashes
        self.w = w

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max,
                           np.uint64)
        # multiply-shift family: (a*h + b) mod 2^64 (natural uint64
        # wraparound) — one C-level matrix op per doc, deterministic
        with np.errstate(over="ignore"):
            x = self.a[:, None] * sh[None, :] + self.b[:, None]
        return x.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(shingle_hashes(t, self.w))
                for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.array([s.tolist() for s in sigs],
                                pa.list_(pa.uint64())),
        })


def band_explode_batch(batch: pa.Table, bands: int = 16,
                       rows: int = 8) -> pa.Table:
    """signature -> (band_id, band_hash, doc_id) rows for the LSH groupby."""
    doc_ids, band_ids, band_hashes = [], [], []
    for doc, sig in zip(batch.column("doc_id").to_pylist(),
                        batch.column("minhash").to_pylist()):
        for b in range(bands):
            seg = sig[b * rows:(b + 1) * rows]
            h = hashlib.md5(
                np.asarray(seg, np.uint64).tobytes()).hexdigest()[:16]
            doc_ids.append(doc)
            band_ids.append(b)
            band_hashes.append(h)
    return pa.table({
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hashes, pa.string()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


def _bucket_pairs(group):
    import pandas as pd

    ids = sorted(group["doc_id"].tolist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def jaccard(text_a: str, text_b: str, w: int = 3) -> float:
    sa = set(shingle_hashes(text_a, w).tolist())
    sb = set(shingle_hashes(text_b, w).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(ds, threshold: float = 0.7, num_hashes: int = 128,
                        bands: int = 16, w: int = 3):
    """Near-duplicate pairs via MinHash-LSH with exact n-gram-Jaccard verify.

    Returns a pyarrow Table (doc_a, doc_b, jaccard) with doc_a < doc_b,
    sorted. The verify step re-reads candidate texts via a broadcast lookup
    (candidate sets are orders of magnitude smaller than the corpus; at
    100 TB the verify would instead join candidates back against the corpus
    by doc_id-bucket)."""
    rows = num_hashes // bands
    sigs = ds.map_batches(MinHashStage(num_hashes, w), batch_format="pyarrow",
                          concurrency=None)
    bands_ds = sigs.map_batches(
        partial(band_explode_batch, bands=bands, rows=rows),
        batch_format="pyarrow")
    cand = bands_ds.groupby(["band_hash", "band_id"]).map_groups(
        _bucket_pairs, batch_format="pandas")
    cand_pd = cand.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    cand_pd = cand_pd.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    needset = set(cand_pd["doc_a"]) | set(cand_pd["doc_b"])
    texts = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            if d in needset:
                texts[d] = t
    out_a, out_b, out_j = [], [], []
    for da, db in zip(cand_pd["doc_a"], cand_pd["doc_b"]):
        j = jaccard(texts.get(da, ""), texts.get(db, ""), w)
        if j >= threshold:
            out_a.append(int(da))
            out_b.append(int(db))
            out_j.append(j)
    return pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "jaccard": pa.array(out_j, pa.float64()),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    """64-bit SimHash over token FNV hashes, weighted by tf."""

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        from .textstats import fnv1a_bytes

        out = []
        for t in batch.column("text").to_pylist():
            toks = [x for x in (t or "").split(" ") if x]
            acc = np.zeros(64, np.int64)
            for tok, tf in Counter(toks).items():
                h = fnv1a_bytes(tok.encode("utf-8"))
                bits = (h >> self.bits) & np.uint64(1)
                acc += np.where(bits == 1, tf, -tf)
            sig = 0
            for i in range(64):
                if acc[i] > 0:
                    sig |= 1 << i
            out.append(sig)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.uint64()),
        })


def simhash_pairs(ds, max_hamming: int = 3):
    """Candidate near-dup pairs by 4x16-bit band blocking on SimHash, verified
    by Hamming distance <= max_hamming. Returns (doc_a, doc_b, hamming)."""
    sigs = ds.map_batches(SimHashStage, batch_format="pyarrow",
                          concurrency=2)
    pdf = sigs.to_pandas()
    ids = pdf["doc_id"].to_numpy()
    sh = pdf["simhash"].to_numpy().astype(np.uint64)
    # band blocking: equal 16-bit slice => candidate
    cands = set()
    for b in range(4):
        seg = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        order = np.argsort(seg, kind="stable")
        seg_s = seg[order]
        start = 0
        for i in range(1, len(seg_s) + 1):
            if i == len(seg_s) or seg_s[i] != seg_s[start]:
                if i - start > 1:
                    grp = order[start:i]
                    for x in range(len(grp)):
                        for y in range(x + 1, len(grp)):
                            a, bb = ids[grp[x]], ids[grp[y]]
                            cands.add((min(a, bb), max(a, bb)))
                start = i
    out_a, out_b, out_h = [], [], []
    sig_of = dict(zip(ids.tolist(), sh.tolist()))
    for a, b in sorted(cands):
        d = bin(sig_of[a] ^ sig_of[b]).count("1")
        if d <= max_hamming:
            out_a.append(int(a))
            out_b.append(int(b))
            out_h.append(d)
    return pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "hamming": pa.array(out_h, pa.int64()),
    })

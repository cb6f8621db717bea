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

from functools import partial

import numpy as np
import pyarrow as pa

MERSENNE61 = (1 << 61) - 1


def _cat(xs: list[np.ndarray], dtype) -> np.ndarray:
    """Concatenate-or-empty for accumulated per-segment arrays."""
    return np.concatenate(xs).astype(dtype) if xs else np.empty(0, dtype)


def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """128-bit FNV-1a content key per row as (h_lo, h_hi) INT64 columns
    (bijective uint64 view — Ray's groupby key path falls back to
    pickled-object blocks for uint64 values above 2^63, the NOTES_r3
    hazard; int64 reinterpretation keeps equality and hashes the same),
    hashed straight out of the Arrow string buffers (C kernel, no per-row
    Python). 128 bits keep 'exact' semantics collision-safe at
    trillion-doc scale; nulls hash as empty strings."""
    from ..functions.hashing import fnv1a128_strings

    col = batch.column(column)
    if col.null_count:
        import pyarrow.compute as pc
        col = pc.fill_null(col, "")
    lo, hi = fnv1a128_strings(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "h_lo": pa.array(lo.view(np.int64)),
        "h_hi": pa.array(hi.view(np.int64)),
    })


def exact_dedup(ds):
    """Keep the minimum doc_id per identical text (the reference's
    first-docid-wins upsert semantics, backends/database.cc:193-208).
    Returns a Dataset with a single ``doc_id`` column of survivors.

    Shape: vectorized ``Min`` aggregate (map-side combine + hash shuffle of
    16-byte content keys) — NOT ``map_groups``, which pays a per-group
    Python call and collapses at web scale where nearly every group has
    size 1."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    agg = hashed.groupby(["h_lo", "h_hi"]).aggregate(
        Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


_EXACT_ROW_BUCKETS = 64  # shuffle-coarsening groups for exact_dedup_rows


def exact_dedup_rows(ds, column: str = "text",
                     num_buckets: int = _EXACT_ROW_BUCKETS):
    """Like :func:`exact_dedup`, but returns the surviving ROWS (all input
    columns) instead of just survivor doc_ids — for pipelines that consume
    the surviving documents downstream (e.g. dedup -> index build), where a
    doc_id-only answer would force a second join pass over the corpus.

    Shape: content-hash in a vectorized ``map_batches``, then ONE shuffle of
    the full rows keyed by a coarse ``h_lo % num_buckets`` bucket (equal
    content hash => equal bucket), and a vectorized per-bucket lexsort that
    keeps the minimum-doc_id row per (h_lo, h_hi). The corpus text moves
    exactly once — unavoidable when the survivors' text IS the output — and
    nothing ever materializes on the driver (contrast with collecting
    exact_dedup's id set and broadcasting it for an isin filter, which is
    corpus-scale driver state at 10^12 docs)."""

    def add_key(batch: pa.Table) -> pa.Table:
        h = content_hash_batch(batch, column)
        lo = h.column("h_lo").to_numpy().view(np.uint64)
        bucket = (lo % np.uint64(num_buckets)).astype(np.int32)
        batch = batch.append_column("h_lo", h.column("h_lo"))
        batch = batch.append_column("h_hi", h.column("h_hi"))
        return batch.append_column("__bucket", pa.array(bucket))

    def pick_first(group: pa.Table) -> pa.Table:
        lo = group.column("h_lo").to_numpy()
        hi = group.column("h_hi").to_numpy()
        ids = group.column("doc_id").to_numpy()
        order = np.lexsort((ids, hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        first = np.ones(len(order), bool)
        first[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
        keep = np.sort(order[first])  # preserve input row order in the block
        return group.take(pa.array(keep)).drop_columns(
            ["h_lo", "h_hi", "__bucket"])

    return ds.map_batches(add_key, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(pick_first, batch_format="pyarrow")


SPAN_IDX_BITS = 20  # spans per doc bound for the packed dedup key


def span_explode_batch(batch: pa.Table, sep: str = ". ") -> pa.Table:
    """(doc_id, span_idx, h_lo, h_hi) — one row per separator-delimited
    span, content-hashed straight out of the Arrow buffers. The C4-style
    span/sentence granularity for sub-document dedup."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a128_strings

    col = pc.fill_null(batch.column("text"), "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col, sep)
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    # span index within its doc = position - segment start
    pos = np.arange(len(parent))
    seg_start = np.ones(len(parent), bool)
    seg_start[1:] = parent[1:] != parent[:-1]
    span_idx = pos - np.maximum.accumulate(np.where(seg_start, pos, 0))
    lo, hi = fnv1a128_strings(
        flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat)
    ids = batch.column("doc_id").to_numpy().astype(np.int64)[parent]
    # int64 views (not uint64): Ray groupby keys above 2^63 fall back to
    # pickled-object blocks (NOTES_r3); the reinterpretation is bijective
    return pa.table({
        "doc_id": pa.array(ids),
        "span_idx": pa.array(span_idx.astype(np.int64)),
        "h_lo": pa.array(lo.view(np.int64)),
        "h_hi": pa.array(hi.view(np.int64)),
    })


def span_dedup(ds, sep: str = ". "):
    """Sub-document (sentence/paragraph) exact dedup, C4-style: keep the
    first occurrence of every distinct span across the corpus, first =
    minimum (doc_id, span_idx). Returns a Dataset of surviving
    (doc_id, span_idx) rows.

    Shape: one vectorized explode+hash pass, then a ``Min`` aggregate over
    16-byte span hashes — only hashes shuffle, never span text; same
    scale story as exact_dedup. The (doc_id, span_idx) pair packs into one
    uint64 Min key (span_idx < 2^SPAN_IDX_BITS; a crawl page has far fewer
    sentences, and the explode asserts it)."""
    from ray.data.aggregate import Min

    def explode(batch: pa.Table) -> pa.Table:
        t = span_explode_batch(batch, sep)
        si = t.column("span_idx").to_numpy()
        if len(si) and si.max() >= (1 << SPAN_IDX_BITS):
            raise ValueError("span_idx exceeds packed-key bound")
        key = (t.column("doc_id").to_numpy() << SPAN_IDX_BITS) | si
        return pa.table({
            "h_lo": t.column("h_lo"),
            "h_hi": t.column("h_hi"),
            "key": pa.array(key.astype(np.int64)),
        })

    agg = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby(["h_lo", "h_hi"]).aggregate(Min("key", alias_name="key"))

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy()
        return pa.table({
            "doc_id": pa.array(k >> SPAN_IDX_BITS),
            "span_idx": pa.array(k & ((1 << SPAN_IDX_BITS) - 1)),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_FNV_OFF = np.uint64(0xcbf29ce484222325)
_FNV_PRIME = np.uint64(0x100000001b3)


def _fnv1a_u64_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a64 over each row of a (n, k) uint64 matrix's
    little-endian bytes — the shared mixing primitive for shingle and
    band hashes (identical to functions/_ctok.c:shingle_hashes64's inner
    loop and textstats.fnv1a_bytes)."""
    b = np.ascontiguousarray(mat, dtype="<u8").view(np.uint8)
    b = b.reshape(mat.shape[0], mat.shape[1] * 8)
    h = np.full(mat.shape[0], _FNV_OFF, np.uint64)
    with np.errstate(over="ignore"):
        for c in range(b.shape[1]):
            h = (h ^ b[:, c].astype(np.uint64)) * _FNV_PRIME
    return h


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Hashes of w-token shingles (uint64); one shingle of all tokens for
    very short docs. Token split is ``text.split(" ")`` with empties
    dropped; token hash FNV-1a64 over UTF-8 bytes; shingle hash FNV-1a64
    over the window's token-hash LE bytes. The C path
    (_ctok.shingle_hashes64) computes the identical function — the space
    byte never occurs inside a UTF-8 multibyte sequence, so byte-level
    splitting matches str.split for all text."""
    from ..functions.ctok import load as _load_ctok

    text = text or ""
    ct = _load_ctok()
    if ct is not None:
        return np.frombuffer(ct.shingle_hashes64(text, w), np.uint64)
    from .textstats import fnv1a_bytes

    toks = [t for t in text.split(" ") if t]
    if not toks:
        return np.empty(0, np.uint64)
    th = np.array([fnv1a_bytes(t.encode("utf-8")) for t in toks], np.uint64)
    if len(th) < w:
        windows = th[None, :]
    else:
        windows = np.lib.stride_tricks.sliding_window_view(th, w)
    return _fnv1a_u64_rows(windows)


def shingle_hashes_column(col, w: int = 3
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``shingle_hashes`` for EVERY string of an Arrow column in one C
    call (``_ctok.shingle_hashes64_multi`` walks the Arrow string buffer
    directly — no per-doc Python objects). Returns
    ``(keys uint64, counts int64[n], ntok int64[n])`` where ``keys`` is
    the concatenation of each doc's shingle hashes, ``counts[i]`` its
    shingle count and ``ntok[i]`` its token count (for min-token gates).
    Pure-Python fallback computes the identical function per doc."""
    import pyarrow.compute as pc

    from ..functions.ctok import load as _load_ctok

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    ct = _load_ctok()
    if ct is not None and hasattr(ct, "shingle_hashes64_multi") and n:
        wide = 1 if pa.types.is_large_string(col.type) else 0
        dt = np.int64 if wide else np.int32
        offs = np.frombuffer(col.buffers()[1], dt)[
            col.offset: col.offset + n + 1]
        data = col.buffers()[2] or b""
        hb, cb, nb = ct.shingle_hashes64_multi(
            np.ascontiguousarray(offs).data, data, wide, w)
        return (np.frombuffer(hb, np.uint64),
                np.frombuffer(cb, np.int64),
                np.frombuffer(nb, np.int64))
    keys = []
    counts = np.zeros(n, np.int64)
    ntoks = np.zeros(n, np.int64)
    for i, t in enumerate(col.to_pylist()):
        t = t or ""
        h = shingle_hashes(t, w)
        keys.append(h)
        counts[i] = len(h)
        ntoks[i] = sum(1 for x in t.split(" ") if x)
    return (np.concatenate(keys) if keys else np.empty(0, np.uint64),
            counts, ntoks)


class MinHashStage:
    """Per-batch minhash signatures. Two signature modes:

    - ``"classic"`` (default): k independent multiply-shift permutations,
      one (k, n_shingles) matrix op per batch — the textbook scheme, but
      O(k * shingles) per doc: ~400k uint64 mults for a web-page-sized
      document at k=128, which dominated a 512k-page near-dup run.
    - ``"oph"``: one-permutation hashing with rotation densification
      (Li, Owen & Zhang 2012; Shrivastava & Li 2014): bin = h % k, min
      per bin, empty bins borrow the nearest filled bin to the left
      (cyclic) — O(shingles) per doc, ~k-fold cheaper on long docs, same
      E[collision] = Jaccard. The exact-Jaccard verify downstream keeps
      precision exact either way; banding recall is checked empirically
      (tests/test_similarity_quality.py).

    The permutation parameters are generated once per actor from a fixed
    seed; both modes are deterministic across processes."""

    def __init__(self, num_hashes: int = 128, w: int = 3, seed: int = 7,
                 mode: str = "classic"):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, MERSENNE61, size=num_hashes,
                              dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE61, size=num_hashes,
                              dtype=np.uint64)
        self.num_hashes = num_hashes
        self.w = w
        if mode not in ("classic", "oph"):
            raise ValueError(f"unknown minhash mode {mode!r}")
        self.mode = mode

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max,
                           np.uint64)
        return self._classic_sigs(sh, np.array([len(sh)], np.int64))[0]

    # Transient budget for the classic (k, chunk) permutation matrix:
    # 2^25 uint64 = 256 MiB per task regardless of k, so a batch of
    # web-page-sized docs (multi-million total shingles) can't OOM a
    # worker. min is associative, so chunked per-segment minima combined
    # with np.minimum are bit-identical to the one-shot matrix.
    _CLASSIC_CHUNK_ELEMS = 1 << 25

    def _classic_sigs(self, all_h: np.ndarray, lens_nz: np.ndarray
                      ) -> np.ndarray:
        """(n_nz, k) classic multiply-shift signatures over the
        concatenated shingle hashes, processed in shingle chunks (docs may
        straddle chunk boundaries; partial minima are merged)."""
        k = self.num_hashes
        n = len(lens_nz)
        sigs = np.full((n, k), np.iinfo(np.uint64).max, np.uint64)
        bounds = np.zeros(n + 1, np.int64)
        np.cumsum(lens_nz, out=bounds[1:])
        total = int(bounds[-1])
        chunk = max(1, self._CLASSIC_CHUNK_ELEMS // k)
        for c0 in range(0, total, chunk):
            c1 = min(c0 + chunk, total)
            with np.errstate(over="ignore"):
                x = self.a[:, None] * all_h[c0:c1][None, :] \
                    + self.b[:, None]
            # docs overlapping [c0, c1): bounds[i0] <= c0 < bounds[i0+1]
            i0 = int(np.searchsorted(bounds, c0, "right")) - 1
            i1 = int(np.searchsorted(bounds, c1, "left"))
            starts = np.maximum(bounds[i0:i1] - c0, 0)
            part = np.minimum.reduceat(x, starts, axis=1).T
            np.minimum(sigs[i0:i1], part, out=sigs[i0:i1])
        return sigs

    def _oph_sigs(self, all_h: np.ndarray, lens_nz: np.ndarray
                  ) -> np.ndarray:
        """(n_nz, k) one-permutation signatures with rotation
        densification, C scatter-min when available."""
        k = self.num_hashes
        sent = np.iinfo(np.uint64).max
        from ..functions.ctok import load as _load_ctok

        ct = _load_ctok()
        oph = getattr(ct, "oph_bin_min64", None) if ct else None
        if oph is not None:
            sigs = np.frombuffer(
                oph(np.ascontiguousarray(all_h).data,
                    np.ascontiguousarray(lens_nz).data, k),
                np.uint64).reshape(len(lens_nz), k).copy()
        else:
            sigs = np.full((len(lens_nz), k), sent, np.uint64)
            starts = np.zeros(len(lens_nz), np.int64)
            np.cumsum(lens_nz[:-1], out=starts[1:])
            for i, (s, ln) in enumerate(zip(starts, lens_nz)):
                h = all_h[s:s + ln]
                np.minimum.at(sigs[i], (h % np.uint64(k)).astype(np.int64),
                              h)
        # rotation densification: empty bins borrow the nearest filled bin
        # to the LEFT (cyclic) — fully vectorized over the (n, k) matrix
        filled = sigs != sent
        idx = np.where(filled, np.arange(k)[None, :], -1)
        left = np.maximum.accumulate(idx, axis=1)
        wrap = left[:, -1]  # docs with shingles have >= 1 filled bin
        take = np.where(left >= 0, left, wrap[:, None])
        take = np.maximum(take, 0)  # all-empty rows can't occur (lens > 0)
        return np.take_along_axis(sigs, take, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one fused pass for the whole batch: concatenate every doc's
        # shingle hashes (C kernel per doc), then either the classic
        # (H, total) permutation matrix op + segment minima, or the
        # O(shingles) OPH scatter-min
        per_doc = [shingle_hashes(t, self.w)
                   for t in batch.column("text").to_pylist()]
        lens = np.array([len(h) for h in per_doc], np.int64)
        n = len(per_doc)
        sigs = np.full((n, self.num_hashes), np.iinfo(np.uint64).max,
                       np.uint64)
        nz = np.nonzero(lens > 0)[0]
        if len(nz):
            all_h = np.concatenate([per_doc[i] for i in nz])
            if self.mode == "oph":
                sigs[nz] = self._oph_sigs(all_h, lens[nz])
            else:
                sigs[nz] = self._classic_sigs(all_h, lens[nz])
        flat = sigs.ravel()
        offs = np.arange(0, (n + 1) * self.num_hashes, self.num_hashes,
                         dtype=np.int32)
        cols = {
            "doc_id": batch.column("doc_id"),
            "minhash": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(flat, pa.uint64())),
        }
        if "side" in batch.column_names:  # cross-corpus (incremental) mode
            cols["side"] = batch.column("side")
        return pa.table(cols)


_LSH_BUCKETS = 64  # shuffle-coarsening groups for the band groupby


def band_explode_batch(batch: pa.Table, bands: int = 16,
                       rows: int = 8) -> pa.Table:
    """signatures -> (bucket, band_id, band_hash, doc_id) rows, fully
    vectorized: band_hash = FNV-1a64 over the band's row hashes, computed
    for all docs x bands in one numpy pass. ``bucket`` coarsens the LSH
    groupby to ~_LSH_BUCKETS groups (equal band_hash => equal bucket) so the
    shuffle pays a handful of vectorized group calls, not one Python call
    per near-singleton band bucket."""
    n = batch.num_rows
    if n == 0:
        cols = {
            "bucket": pa.array([], pa.int32()),
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
        }
        if "side" in batch.column_names:
            cols["side"] = pa.array([], pa.int8())
        return pa.table(cols)
    import pyarrow.compute as pc

    sig = pc.list_flatten(batch.column("minhash")).to_numpy() \
        .astype(np.uint64).reshape(n, bands * rows)
    bh = _fnv1a_u64_rows(sig.reshape(n * bands, rows))
    cols = {
        "bucket": pa.array((bh % np.uint64(_LSH_BUCKETS)).astype(np.int32)),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(bh),
        "doc_id": pa.array(np.repeat(
            batch.column("doc_id").to_numpy().astype(np.int64), bands)),
    }
    if "side" in batch.column_names:  # cross-corpus (incremental) mode
        cols["side"] = pa.array(np.repeat(
            batch.column("side").to_numpy().astype(np.int8), bands))
    return pa.table(cols)


# Collision segments larger than this emit STAR + CHAIN pairs (every member
# paired with the segment's minimum doc_id, plus every consecutive sorted
# pair) instead of all pairs: a boilerplate-heavy crawl can put a
# near-identical cluster of millions of docs into one band bucket, and the
# quadratic expansion would OOM the group task. RECALL CAVEAT (logged, never
# silent): pre-threshold connectivity is fully preserved (components link
# through the hub), but the emitted edges still pass the downstream
# threshold filter (exact Jaccard / Hamming / cosine), so a true pair (x, y)
# is lost when EVERY emitted edge on a path x..y fails the threshold. The
# chain edges mitigate this — consecutive doc_ids in a crawl are the likely
# near-identical neighbors, and each survives or fails on its own — but only
# all-pairs (m <= cap) is exact.
MAX_SEGMENT_DOCS = 4096


def _log_segment_cap(kind: str, seg_docs: int, dropped_pairs: int) -> None:
    import logging

    logging.getLogger(__name__).warning(
        "%s: collision segment of %d docs exceeds MAX_SEGMENT_DOCS=%d; "
        "emitting %d star+chain pairs instead of %d all-pairs (%d candidate "
        "pairs not emitted). Pre-threshold connectivity is preserved via "
        "the representative, but post-threshold recall may drop: an "
        "in-threshold pair is reported only if some emitted star/chain "
        "path between its ends survives the threshold filter.",
        kind, seg_docs, MAX_SEGMENT_DOCS, 2 * seg_docs - 3,
        seg_docs * (seg_docs - 1) // 2,
        dropped_pairs)


def _segment_pairs(ids_sorted: np.ndarray, starts: np.ndarray,
                   ends: np.ndarray, kind: str):
    """Vectorized all-pairs per segment (np.triu_indices); giant segments
    are capped to star edges (min-id hub -> every member) plus chain edges
    (consecutive sorted members), 2m-3 pairs total — linear, and the chain
    keeps crawl-adjacent near-dups directly paired even when the hub edge
    fails the downstream threshold (see MAX_SEGMENT_DOCS caveat). Yields
    (a_idx, b_idx) absolute index arrays into ids_sorted, so callers can
    also slice parallel arrays (signatures)."""
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > MAX_SEGMENT_DOCS:
            _log_segment_cap(kind, int(m),
                             int(m * (m - 1) // 2 - (2 * m - 3)))
            # star: (s, x) for every other member (s is min id: asc sort);
            # chain: (x_i, x_{i+1}) for i >= s+1 ((s, s+1) is already the
            # first star edge). All 2m-3 pairs distinct.
            a = np.concatenate([np.full(m - 1, s, np.int64),
                                np.arange(s + 1, e - 1, dtype=np.int64)])
            b = np.concatenate([np.arange(s + 1, e, dtype=np.int64),
                                np.arange(s + 2, e, dtype=np.int64)])
        else:
            ii, jj = np.triu_indices(m, k=1)
            a = s + ii
            b = s + jj
        yield a, b


def _bucket_pair_scan(group: pa.Table) -> pa.Table:
    """All same-(band_id, band_hash) doc pairs within one coarse bucket:
    one lexsort + segment scan, pairs emitted via vectorized triu indices
    (star-capped for pathological giant segments)."""
    bid = group.column("band_id").to_numpy()
    bh = group.column("band_hash").to_numpy()
    ids = group.column("doc_id").to_numpy()
    order = np.lexsort((ids, bh, bid))
    bid_s, bh_s, ids_s = bid[order], bh[order], ids[order]
    n = len(ids_s)
    change = np.ones(n, bool)
    change[1:] = (bid_s[1:] != bid_s[:-1]) | (bh_s[1:] != bh_s[:-1])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for a, b in _segment_pairs(ids_s, starts, ends, "minhash_lsh"):
        out_a.append(ids_s[a])
        out_b.append(ids_s[b])
    return pa.table({
        "doc_a": pa.array(_cat(out_a, np.int64), pa.int64()),
        "doc_b": pa.array(_cat(out_b, np.int64), pa.int64()),
    })


def jaccard(text_a: str, text_b: str, w: int = 3) -> float:
    sa = set(shingle_hashes(text_a, w).tolist())
    sb = set(shingle_hashes(text_b, w).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


_VERIFY_BUCKETS = 64  # shuffle groups for the distributed Jaccard verify


def _pair_vbucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic verify-bucket per candidate pair (FNV over the id
    pair)."""
    h = _fnv1a_u64_rows(np.stack([a.astype(np.uint64),
                                  b.astype(np.uint64)], axis=1))
    return (h % np.uint64(_VERIFY_BUCKETS)).astype(np.int32)


def _verify_group(group: pa.Table, threshold: float, w: int) -> pa.Table:
    """One verify bucket: pair rows (kind=0) + the texts they need (kind=1).
    Shingle sets are computed once per distinct doc in the bucket, pairs
    checked with C-level set ops. Duplicate candidate pairs (the same pair
    surfacing from several LSH bands) land in the same bucket — vbucket is
    a pure function of the id pair — and are dropped here with one
    np.unique, so no driver-side dedup is ever needed."""
    kind = group.column("kind").to_numpy()
    texts: dict[int, str] = {}
    tmask = kind == 1
    if tmask.any():
        t = group.filter(pa.array(tmask))
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
    shingles: dict[int, np.ndarray] = {
        d: np.unique(shingle_hashes(txt or "", w))
        for d, txt in texts.items()}
    p = group.filter(pa.array(~tmask))
    ab = np.unique(np.stack([
        p.column("doc_a").to_numpy().astype(np.int64),
        p.column("doc_b").to_numpy().astype(np.int64)], axis=1), axis=0)
    out_a, out_b, out_j = [], [], []
    empty = np.empty(0, np.uint64)
    for da, db in zip(ab[:, 0].tolist(), ab[:, 1].tolist()):
        sa = shingles.get(da, empty)
        sb = shingles.get(db, empty)
        na, nb = len(sa), len(sb)
        if not na and not nb:
            j = 1.0
        elif not na or not nb:
            j = 0.0
        else:
            # sorted-unique arrays: C-level merge intersection, no Python
            # set objects per pair (VERDICT r2 "what's wrong" item 5)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (na + nb - inter)
        if j >= threshold:
            out_a.append(da)
            out_b.append(db)
            out_j.append(j)
    return pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "jaccard": pa.array(out_j, pa.float64()),
    })


_JOIN_BUCKETS = 64  # shuffle groups for the needs-vs-corpus semi-join

# Bloom prefilter for the semi-join's corpus side: sized to ~16 bits per
# candidate id (k=2 => fp ~ 1.5%), clamped to a FIXED budget so driver and
# broadcast state stay O(1) in corpus size. At the cap the filter degrades
# to higher fp — which only admits extra rows into the join shuffle, never
# changes results (the in-group searchsorted match is exact).
_BLOOM_MIN_BITS = 1 << 20   # 128 KiB
_BLOOM_MAX_BITS = 1 << 30   # 128 MiB hard cap (fixed broadcast budget)


def _doc_jkey(ids: np.ndarray, num_buckets: int = _JOIN_BUCKETS
              ) -> np.ndarray:
    """Deterministic join bucket per doc_id (FNV, matching the other
    coarse-bucket keys)."""
    h = _fnv1a_u64_rows(ids.astype(np.uint64)[:, None])
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _bloom_size_bits(n_ids: int) -> int:
    bits = _BLOOM_MIN_BITS
    while bits < 16 * max(n_ids, 1) and bits < _BLOOM_MAX_BITS:
        bits <<= 1
    return bits


def _bloom_idx(ids: np.ndarray, m_bits: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Two vectorized hash index streams per id (FNV + a splitmix step)."""
    h = _fnv1a_u64_rows(ids.astype(np.uint64)[:, None])
    g = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    g ^= g >> np.uint64(27)
    mask = np.uint64(m_bits - 1)
    return h & mask, g & mask


def _bloom_add(words: np.ndarray, ids: np.ndarray, m_bits: int) -> None:
    for idx in _bloom_idx(ids, m_bits):
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _bloom_test(words: np.ndarray, ids: np.ndarray,
                m_bits: int) -> np.ndarray:
    i1, i2 = _bloom_idx(ids, m_bits)
    t1 = (words[(i1 >> np.uint64(6)).astype(np.int64)]
          >> (i1 & np.uint64(63))) & np.uint64(1)
    t2 = (words[(i2 >> np.uint64(6)).astype(np.int64)]
          >> (i2 & np.uint64(63))) & np.uint64(1)
    return ((t1 & t2) != 0)


def _bloom_payload(ids: np.ndarray, m_bits: int) -> pa.Table:
    """One block's Bloom contribution, SPARSE when the block is small
    relative to the filter: a dense m_bits bitmap row costs m_bits/8
    bytes of driver traffic per block, so sparse blocks ship their set
    BIT INDICES instead (2 hashes x n_ids x 8 bytes) and densify on the
    driver — the per-block row is min(bitmap, indices) sized, keeping
    the driver's transient per-batch footprint small even when the
    filter itself is at its 128 MiB cap."""
    i1, i2 = _bloom_idx(ids, m_bits)
    idx = np.concatenate([i1, i2]).astype(np.uint64)
    if len(idx) * 8 < m_bits // 8:
        return pa.table({
            "dense": pa.array([False]),
            "payload": pa.array([idx.tobytes()], pa.large_binary()),
        })
    words = np.zeros(m_bits // 64, np.uint64)
    _bloom_add(words, ids, m_bits)
    return pa.table({
        "dense": pa.array([True]),
        "payload": pa.array([words.tobytes()], pa.large_binary()),
    })


def _bloom_or_rows(rows_ds, m_bits: int):
    """OR per-block contributions into one filter with O(m_bits) driver
    state (streaming — blocks never accumulate) and return its ray.put
    handle."""
    import ray

    words = np.zeros(m_bits // 64, np.uint64)
    for b in rows_ds.iter_batches(batch_size=16,
                                  batch_format="pyarrow"):
        for dense, buf in zip(b.column("dense").to_pylist(),
                              b.column("payload").to_pylist()):
            if dense:
                words |= np.frombuffer(buf, np.uint64)
            else:
                idx = np.frombuffer(buf, np.uint64)
                np.bitwise_or.at(
                    words, (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)))
    return ray.put(words)


def _bloom_block_batch(batch: pa.Table, m_bits: int) -> pa.Table:
    """One candidate-pair block -> one sparse-or-dense Bloom row."""
    ids = np.concatenate([
        batch.column("doc_a").to_numpy().astype(np.int64),
        batch.column("doc_b").to_numpy().astype(np.int64)])
    return _bloom_payload(ids, m_bits)


def _candidate_bloom(cand, m_bits: int):
    """Bloom filter over candidate-pair doc ids (see _bloom_or_rows)."""
    return _bloom_or_rows(
        cand.map_batches(partial(_bloom_block_batch, m_bits=m_bits),
                         batch_format="pyarrow"), m_bits)


def _pair_rows_batch(batch: pa.Table) -> pa.Table:
    """Candidate pairs -> verify-shuffle rows (vbucket, kind=0, doc_a,
    doc_b). Duplicates across bands are fine: equal pair => equal vbucket,
    deduped inside the verify group."""
    a = batch.column("doc_a").to_numpy().astype(np.int64)
    b = batch.column("doc_b").to_numpy().astype(np.int64)
    n = len(a)
    return pa.table({
        "vbucket": pa.array(_pair_vbucket(a, b)),
        "kind": pa.array(np.zeros(n, np.int8)),
        "doc_a": pa.array(a),
        "doc_b": pa.array(b),
        "doc_id": pa.array(np.zeros(n, np.int64)),
        "text": pa.array([""] * n, pa.string()),
    })


def _needs_batch(batch: pa.Table) -> pa.Table:
    """Candidate pairs -> per-batch-unique (jkey, doc_id, vbucket) need
    rows: 'vbucket V needs doc D's text'."""
    a = batch.column("doc_a").to_numpy().astype(np.int64)
    b = batch.column("doc_b").to_numpy().astype(np.int64)
    vb = _pair_vbucket(a, b).astype(np.int64)
    uniq = np.unique(np.stack([np.concatenate([a, b]),
                               np.concatenate([vb, vb])], axis=1), axis=0)
    return pa.table({
        "jkey": pa.array(_doc_jkey(uniq[:, 0])),
        "kind": pa.array(np.zeros(len(uniq), np.int8)),
        "doc_id": pa.array(uniq[:, 0], pa.int64()),
        "vbucket": pa.array(uniq[:, 1].astype(np.int32)),
        "text": pa.array([""] * len(uniq), pa.string()),
    })


def _corpus_keyed_batch(batch: pa.Table, bloom_ref=None,
                        m_bits: int = 0) -> pa.Table:
    """Corpus rows -> (jkey, kind=1, doc_id, text) join-side rows.
    With a candidate Bloom filter, non-candidate rows (minus ~fp%) are
    dropped HERE, map-side, so their texts never enter the join shuffle;
    false positives are eliminated exactly in ``_route_join_group``."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    if bloom_ref is not None:
        import ray

        keep = _bloom_test(ray.get(bloom_ref), ids, m_bits)
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
    return pa.table({
        "jkey": pa.array(_doc_jkey(ids)),
        "kind": pa.array(np.ones(len(ids), np.int8)),
        "doc_id": pa.array(ids, pa.int64()),
        "vbucket": pa.array(np.zeros(len(ids), np.int32)),
        "text": batch.column("text").cast(pa.string()),
    })


def _route_join_group(group: pa.Table) -> pa.Table:
    """One join bucket: need rows (kind=0) semi-join the corpus rows
    (kind=1) on doc_id; emits one (vbucket, kind=1, doc_id, text) verify
    row per unique (doc_id, vbucket) need. Non-candidate corpus rows die
    here, so only candidate texts enter the verify shuffle."""
    kind = group.column("kind").to_numpy()
    nmask = kind == 0
    empty = pa.table({
        "vbucket": pa.array([], pa.int32()),
        "kind": pa.array([], pa.int8()),
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    })
    if not nmask.any() or nmask.all():
        return empty
    needs = group.filter(pa.array(nmask))
    # re-dedup across source batches
    nuniq = np.unique(np.stack(
        [needs.column("doc_id").to_numpy().astype(np.int64),
         needs.column("vbucket").to_numpy().astype(np.int64)], axis=1),
        axis=0)
    corpus = group.filter(pa.array(~nmask))
    cids = corpus.column("doc_id").to_numpy().astype(np.int64)
    corder = np.argsort(cids, kind="stable")
    cids_s = cids[corder]
    pos = np.searchsorted(cids_s, nuniq[:, 0])
    pos_ok = pos < len(cids_s)
    hit = np.zeros(len(nuniq), bool)
    hit[pos_ok] = cids_s[pos[pos_ok]] == nuniq[pos_ok, 0]
    nuniq = nuniq[hit]
    rows = corder[pos[hit]]
    sel = corpus.select(["doc_id", "text"]).take(pa.array(rows))
    n = len(rows)
    return pa.table({
        "vbucket": pa.array(nuniq[:, 1].astype(np.int32)),
        "kind": pa.array(np.ones(n, np.int8)),
        "doc_a": pa.array(np.zeros(n, np.int64)),
        "doc_b": pa.array(np.zeros(n, np.int64)),
        "doc_id": sel.column("doc_id").cast(pa.int64()),
        "text": sel.column("text").cast(pa.string()),
    })


def minhash_dedup_pairs(ds, threshold: float = 0.7, num_hashes: int = 128,
                        bands: int = 16, w: int = 3,
                        sig_mode: str = "classic", collect: bool = True):
    """Near-duplicate pairs via MinHash-LSH with exact n-gram-Jaccard verify.

    Returns a pyarrow Table (doc_a, doc_b, jaccard) with doc_a < doc_b,
    sorted. Fully distributed — NOTHING corpus- or candidate-scale ever
    lands on the driver:

    1. signatures -> band-explode -> coarse-bucket groupby -> per-group
       pair scan = candidate id pairs (a Dataset, materialized once in the
       object store because it feeds two consumers);
    2. candidate texts are found with a SHUFFLE SEMI-JOIN: (doc_id,
       vbucket) need rows and corpus rows co-shuffle on
       ``hash(doc_id) % _JOIN_BUCKETS`` and match inside ``map_groups``
       (replaces the round-2 broadcast id->vbucket map, which was a
       candidate-count-sized driver collection). A FIXED-size candidate
       Bloom filter (<= 128 MiB regardless of scale, built by OR-ing
       per-block bitmaps in a streaming driver pass) is broadcast to the
       corpus pass so non-candidate texts are dropped map-side instead of
       riding the join shuffle; Bloom false positives only add join
       traffic — the in-group match stays exact;
    3. pair rows and routed texts co-shuffle on the pair-hash ``vbucket``
       and the exact Jaccard runs inside ``map_groups``; duplicate pairs
       from different bands dedup in-group (equal pair => equal vbucket).

    Only verified pairs reach the driver."""
    rows = num_hashes // bands
    sigs = ds.map_batches(MinHashStage(num_hashes, w, mode=sig_mode),
                          batch_format="pyarrow", concurrency=None)
    bands_ds = sigs.map_batches(
        partial(band_explode_batch, bands=bands, rows=rows),
        batch_format="pyarrow")
    cand = bands_ds.groupby("bucket").map_groups(
        _bucket_pair_scan, batch_format="pyarrow")
    return _verify_candidate_pairs(ds, cand, threshold, w, collect=collect)


def _bucket_cross_pair_scan(group: pa.Table) -> pa.Table:
    """Cross-side candidate pairs within one coarse LSH bucket: for every
    (band_id, band_hash) collision segment, emit (base_id, new_id) for
    base rows (side=0) x new rows (side=1). Same lexsort+segment structure
    as ``_bucket_pair_scan``; same-side collisions emit nothing (the
    incremental contract only asks 'is this NEW doc a dup of the BASE
    corpus'). Segments holding more than ``MAX_SEGMENT_DOCS`` docs (the
    same cap rule as the self-join's ``_segment_pairs``) are capped:
    each new doc pairs with the segment's minimum base id plus its
    nearest base id in sorted order (<= 2 edges per new doc, drops
    logged). RECALL CAVEAT as in ``_segment_pairs``: a capped true
    pair is lost when both emitted edges fail the exact-Jaccard threshold
    — only the uncapped path is exhaustive."""
    bid = group.column("band_id").to_numpy()
    bh = group.column("band_hash").to_numpy()
    ids = group.column("doc_id").to_numpy().astype(np.int64)
    side = group.column("side").to_numpy().astype(np.int8)
    order = np.lexsort((ids, side, bh, bid))
    bid_s, bh_s = bid[order], bh[order]
    ids_s, side_s = ids[order], side[order]
    n = len(ids_s)
    change = np.ones(n, bool)
    change[1:] = (bid_s[1:] != bid_s[:-1]) | (bh_s[1:] != bh_s[:-1])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        sd = side_s[s:e]
        nb = int(np.searchsorted(sd, 1))  # side-sorted: base rows first
        nn = (e - s) - nb
        if nb == 0 or nn == 0:
            continue
        base = ids_s[s:s + nb]
        new = ids_s[s + nb:e]
        if (e - s) > MAX_SEGMENT_DOCS:
            near = np.clip(np.searchsorted(base, new) - 1, 0, nb - 1)
            a = np.concatenate([np.full(nn, base[0], np.int64),
                                base[near]])
            b = np.concatenate([new, new])
            uniq = np.unique(np.stack([a, b], axis=1), axis=0)
            # dropped = candidate cross pairs (nb*nn) minus what we emit
            _log_segment_cap("minhash_incremental", e - s,
                             nb * nn - len(uniq))
            out_a.append(uniq[:, 0])
            out_b.append(uniq[:, 1])
        else:
            ii = np.repeat(np.arange(nb), nn)
            jj = np.tile(np.arange(nn), nb)
            out_a.append(base[ii])
            out_b.append(new[jj])
    return pa.table({
        "doc_a": pa.array(_cat(out_a, np.int64), pa.int64()),
        "doc_b": pa.array(_cat(out_b, np.int64), pa.int64()),
    })


def _sidecar_load(path: str):
    """Parse a signature-checkpoint sidecar. A missing, truncated
    (crash mid-write predating the atomic writer), or legacy file with
    no corpus fingerprint reads as absent — the checkpoint regenerates
    instead of being trusted or crashing in ``json.load``."""
    import json
    import os

    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            meta = json.load(f)
    except (ValueError, OSError):
        return None
    if not isinstance(meta, dict) or "n_docs" not in meta \
            or "idh_sum" not in meta \
            or not isinstance(meta.get("gens"), list):
        return None
    return meta


def _sidecar_write(path: str, meta: dict) -> None:
    """tmp + fsync + os.replace — the sidecar either exists complete
    or not at all (it is the checkpoint's commit point)."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _base_fingerprint(ds, split: int | None = None) -> dict:
    """Corpus identity over the ``doc_id`` column only — ONE pruned
    single-column pass, texts never read: (n_docs, max_doc_id,
    sum of FNV-1a64(doc_id) mod 2^64), plus the same (count, hash-sum)
    restricted to ``doc_id <= split`` so an append-only grown corpus is
    distinguishable from an edited one. HASHED ids, not raw ids: a raw
    id sum is trivially preserved by compensating edits (delete {1, 4},
    add {2, 3}), while a hash sum makes any id-set change collide only
    with ~2^-64 probability. Catches grown / shrunk / re-id'd corpora;
    same-id content edits stay outside the checkpoint contract
    (signatures are keyed by doc_id)."""
    sp = np.int64(split if split is not None else np.iinfo(np.int64).max)

    def part(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy().astype(np.int64)
        le = ids <= sp
        h = _fnv1a_u64_rows(ids.astype(np.uint64)[:, None])
        return pa.table({
            "n": pa.array([len(ids)], pa.int64()),
            "mx": pa.array(
                [int(ids.max()) if len(ids) else None], pa.int64()),
            "s": pa.array([int(h.sum())], pa.uint64()),
            "n_le": pa.array([int(le.sum())], pa.int64()),
            "s_le": pa.array([int(h[le].sum())], pa.uint64()),
        })

    # one tiny row per block — bounded driver state
    rows = ds.select_columns(["doc_id"]).map_batches(
        part, batch_format="pyarrow").take_all()
    mask = (1 << 64) - 1
    return {
        "n_docs": int(sum(r["n"] for r in rows)),
        "max_doc_id": int(max(
            (r["mx"] for r in rows if r["mx"] is not None), default=-1)),
        "idh_sum": int(sum(r["s"] for r in rows) & mask),
        "n_le": int(sum(r["n_le"] for r in rows)),
        "s_le": int(sum(r["s_le"] for r in rows) & mask),
    }


def incremental_minhash_pairs(base_ds, new_ds, threshold: float = 0.7,
                              num_hashes: int = 128, bands: int = 16,
                              w: int = 3, sig_mode: str = "classic",
                              collect: bool = True,
                              base_sigs_dir: str | None = None):
    """Incremental near-dup: which NEW docs duplicate the EXISTING corpus.

    The standard crawl-snapshot operation (dedup each new Common-Crawl
    dump against everything already ingested): returns (doc_a, doc_b,
    jaccard) with doc_a from ``base_ds``, doc_b from ``new_ds``, exact
    w-shingle Jaccard >= threshold. Contract: doc_ids are globally
    disjoint across the two inputs (crawl snapshots carry global ids).

    Shape: both sides are tagged map-side (side=0 base, side=1 new) and
    UNION into ONE signature -> band-explode -> bucket-groupby pass — the
    base corpus is a Dataset throughout, never broadcast or collected, so
    the base side scales to the full accumulated corpus. The per-bucket
    scan emits only cross-side pairs (no base x base work — the base
    corpus was already deduped when it was ingested), and the shared
    Bloom-gated semi-join + vbucket verify scores candidates exactly.
    New-vs-new duplicates are ``minhash_dedup_pairs`` on ``new_ds`` alone;
    composing both gives full-corpus dedup without re-pairing the base.

    ``base_sigs_dir``: optional parquet checkpoint for the BASE side's
    signatures. On the first refresh the base signatures are computed
    once and written there (params + a doc_id-derived corpus
    fingerprint in an atomically-replaced sidecar, which is the commit
    point); every later refresh validates the fingerprint with one
    pruned doc_id-only pass and READS the signatures instead of
    re-signaturing the whole accumulated corpus — at 10^12 accumulated
    docs the signature pass over the base is the dominant per-refresh
    cost and this turns it into a pruned parquet scan. An APPEND-ONLY
    grown base (new docs with ids above the checkpointed max, old docs
    untouched — the normal accumulated-corpus shape) signatures only
    the delta into a new generation directory; a mismatched
    num_hashes/w/sig_mode or an incompatibly changed corpus raises
    loudly. The base TEXTS are still consumed only for Bloom-gated
    verify candidates, exactly as before."""
    import os

    def _tag(side_val):
        def tag(b: pa.Table) -> pa.Table:
            return b.select(["doc_id", "text"]).append_column(
                "side", pa.array(np.full(b.num_rows, side_val, np.int8)))
        return tag

    def _add_side(side_val):
        def f(b: pa.Table) -> pa.Table:
            return b.select(["doc_id", "minhash"]).append_column(
                "side", pa.array(np.full(b.num_rows, side_val, np.int8)))
        return f

    stage = MinHashStage(num_hashes, w, mode=sig_mode)
    new_sigs = new_ds.map_batches(_tag(1), batch_format="pyarrow") \
        .map_batches(stage, batch_format="pyarrow", concurrency=None)
    if base_sigs_dir is not None:
        import shutil

        import pyarrow.compute as pc
        import ray.data

        params = {"num_hashes": num_hashes, "w": w, "sig_mode": sig_mode}
        meta_p = os.path.join(base_sigs_dir, "_SIG_PARAMS.json")
        meta = _sidecar_load(meta_p)
        if meta is not None:
            have = {k: meta.get(k) for k in params}
            if have != params:
                raise ValueError(
                    f"base signature checkpoint {base_sigs_dir} was built "
                    f"with {have}, requested {params} — delete the "
                    "checkpoint or match the parameters")

        def _sign_to(sub_ds, gen_dir):
            shutil.rmtree(gen_dir, ignore_errors=True)  # crashed attempt
            (sub_ds.map_batches(_tag(0), batch_format="pyarrow")
             .map_batches(stage, batch_format="pyarrow", concurrency=None)
             .map_batches(lambda b: b.select(["doc_id", "minhash"]),
                          batch_format="pyarrow")
             .write_parquet(gen_dir))

        if meta is None:
            # fresh (or unparseable/legacy — regenerate): generation 0
            # signatures the whole current base
            fp = _base_fingerprint(base_ds)
            gens = ["gen-000000"]
            shutil.rmtree(os.path.join(base_sigs_dir, "sigs"),
                          ignore_errors=True)  # pre-fingerprint layout
            _sign_to(base_ds, os.path.join(base_sigs_dir, gens[0]))
            os.makedirs(base_sigs_dir, exist_ok=True)
            meta = {**params, "n_docs": fp["n_docs"],
                    "max_doc_id": fp["max_doc_id"],
                    "idh_sum": fp["idh_sum"], "gens": gens}
            _sidecar_write(meta_p, meta)  # commit point, written last
        else:
            fp = _base_fingerprint(base_ds, split=meta["max_doc_id"])
            same = (fp["n_docs"] == meta["n_docs"]
                    and fp["max_doc_id"] == meta["max_doc_id"]
                    and fp["idh_sum"] == meta["idh_sum"])
            if not same:
                # append-only growth: every doc at or below the
                # checkpointed max id is untouched, new docs have
                # strictly larger ids — signature ONLY the delta
                grown = (fp["n_le"] == meta["n_docs"]
                         and fp["s_le"] == meta["idh_sum"]
                         and fp["n_docs"] > meta["n_docs"])
                if not grown:
                    raise ValueError(
                        f"base corpus no longer matches signature "
                        f"checkpoint {base_sigs_dir} (checkpoint: "
                        f"{meta['n_docs']} docs, max id "
                        f"{meta['max_doc_id']}; corpus now: "
                        f"{fp['n_docs']} docs, max id "
                        f"{fp['max_doc_id']}) and is not an append-only "
                        "growth of it — delete the checkpoint to "
                        "rebuild")
                thr = meta["max_doc_id"]

                def _only_new(b: pa.Table) -> pa.Table:
                    return b.filter(pc.greater(b.column("doc_id"),
                                               pa.scalar(thr)))

                gen = f"gen-{len(meta['gens']):06d}"
                _sign_to(base_ds.map_batches(
                    _only_new, batch_format="pyarrow"),
                    os.path.join(base_sigs_dir, gen))
                meta = {**meta, "n_docs": fp["n_docs"],
                        "max_doc_id": fp["max_doc_id"],
                        "idh_sum": fp["idh_sum"],
                        "gens": meta["gens"] + [gen]}
                _sidecar_write(meta_p, meta)  # commit point
        import glob

        gen_files = sorted(
            f for g in meta["gens"]
            for f in glob.glob(os.path.join(base_sigs_dir, g,
                                            "*.parquet")))
        base_sigs = ray.data.read_parquet(gen_files) \
            .map_batches(_add_side(0), batch_format="pyarrow")
        sigs = base_sigs.union(new_sigs)
    else:
        base_live = base_ds.map_batches(_tag(0), batch_format="pyarrow") \
            .map_batches(stage, batch_format="pyarrow", concurrency=None)
        sigs = base_live.union(new_sigs)
    rows = num_hashes // bands
    bands_ds = sigs.map_batches(
        partial(band_explode_batch, bands=bands, rows=rows),
        batch_format="pyarrow")
    cand = bands_ds.groupby("bucket").map_groups(
        _bucket_cross_pair_scan, batch_format="pyarrow")
    texts = base_ds.select_columns(["doc_id", "text"]).union(
        new_ds.select_columns(["doc_id", "text"]))
    return _verify_candidate_pairs(texts, cand, threshold, w,
                                   collect=collect)


# ---------------------------------------------------------------------------
# Duplicated-substring span extraction (cross-doc, token-window based)
# ---------------------------------------------------------------------------

def _ids_bloom(ds, col: str, m_bits: int):
    """Fixed-size Bloom filter over one int64 id column of a Dataset
    (same streaming sparse-or-dense OR as ``_candidate_bloom``;
    O(m_bits) driver state)."""
    def block(batch: pa.Table) -> pa.Table:
        return _bloom_payload(
            batch.column(col).to_numpy().astype(np.int64), m_bits)

    return _bloom_or_rows(
        ds.map_batches(block, batch_format="pyarrow"), m_bits)


def _dup_span_group(group: pa.Table, w: int) -> pa.Table:
    """One doc-hash bucket: (doc_id, skey) dup-window rows (kind=0) meet
    the docs' texts (kind=1). Per doc: recompute the position-ordered
    window hashes, mark positions whose w-gram is cross-doc duplicated
    (sorted-array membership), and merge overlapping-or-adjacent windows
    (gap <= w) into maximal [span_start, span_end) token spans."""
    kind = group.column("kind").to_numpy()
    pmask = kind == 0
    out_d, out_s, out_e = [], [], []
    if pmask.any() and (~pmask).any():
        p = group.filter(pa.array(pmask))
        pid = p.column("doc_id").to_numpy().astype(np.int64)
        pkey = p.column("skey").to_numpy().astype(np.int64)
        order = np.lexsort((pkey, pid))
        pid, pkey = pid[order], pkey[order]
        t = group.filter(pa.array(~pmask))
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            lo = int(np.searchsorted(pid, did, "left"))
            hi = int(np.searchsorted(pid, did, "right"))
            if lo == hi:
                continue  # Bloom false positive: no dup windows here
            keys = pkey[lo:hi]  # sorted (lexsort above)
            h = shingle_hashes(txt or "", w)
            h_i64 = h.view(np.int64)
            pos = np.searchsorted(keys, h_i64)
            pos_ok = pos < len(keys)
            dup = np.zeros(len(h_i64), bool)
            dup[pos_ok] = keys[pos[pos_ok]] == h_i64[pos_ok]
            dpos = np.nonzero(dup)[0]
            if not len(dpos):
                continue
            brk = np.nonzero(np.diff(dpos) > w)[0]
            starts = dpos[np.r_[0, brk + 1]]
            ends = dpos[np.r_[brk, len(dpos) - 1]] + w
            out_d.append(np.full(len(starts), did, np.int64))
            out_s.append(starts.astype(np.int64))
            out_e.append(ends.astype(np.int64))
    return pa.table({
        "doc_id": pa.array(_cat(out_d, np.int64), pa.int64()),
        "span_start": pa.array(_cat(out_s, np.int64), pa.int64()),
        "span_end": pa.array(_cat(out_e, np.int64), pa.int64()),
    })


def _dup_window_pairs(ds, w: int, num_buckets: int):
    """Shared head of the substring-dedup family: the materialized
    (skey, doc_id) Dataset of every distinct (doc, w-gram) pair whose
    gram appears in >= 2 distinct docs. ONE exchange: the df aggregate
    is FUSED into the join's own shuffle (``left_combine`` — map-side
    df partials and the distinct (doc, skey) pairs co-shuffle on the
    skey hash; the bucket co-locates equal keys, so the in-group sum is
    globally exact), then the df >= 2 filter runs map-side on the join
    output. Replaces the groupby(skey) + separate join (two all-to-alls
    over the same key)."""
    import pyarrow.compute as pc

    from .equijoin import shuffle_hash_join
    from .ngramstats import dup_window_partials, window_occ_batch

    partials = ds.map_batches(partial(dup_window_partials, w=w),
                              batch_format="pyarrow")
    occ = ds.map_batches(partial(window_occ_batch, w=w),
                         batch_format="pyarrow")
    joined = shuffle_hash_join(
        partials, occ, "skey", "skey",
        {"df_part": pa.int64()}, {"doc_id": pa.int64()},
        key_out="skey", num_buckets=num_buckets,
        left_combine=[("df_part", "sum", "df")])

    def dup_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("df"), 2)) \
            .select(["skey", "doc_id"])

    return joined.map_batches(dup_only,
                              batch_format="pyarrow").materialize()


def _dup_pair_rows(b: pa.Table, num_buckets: int) -> pa.Table:
    """(doc_id, skey) dup pairs -> doc-hash-keyed routing rows (kind=0)."""
    ids = b.column("doc_id").to_numpy().astype(np.int64)
    return pa.table({
        "jkey": pa.array(_doc_jkey(ids, num_buckets)),
        "kind": pa.array(np.zeros(len(ids), np.int8)),
        "doc_id": pa.array(ids),
        "skey": b.column("skey").cast(pa.int64()),
        "text": pa.array([""] * len(ids), pa.string()),
    })


def dup_token_spans(ds, w: int = 4, num_buckets: int = _JOIN_BUCKETS,
                    collect: bool = True):
    """Maximal per-doc token spans covered by CROSS-DOCUMENT duplicated
    w-gram windows — the substring-dedup shape of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (ACL
    2022, public paper): any duplicated substring of >= w tokens
    contains a duplicated w-gram window, so merging overlapping dup
    windows recovers the removable spans without a suffix array.

    Returns (doc_id, span_start, span_end) token-index spans, merged
    when consecutive dup windows start <= w tokens apart
    (overlapping-or-adjacent). A window is duplicated iff its w-gram
    appears in >= 2 DISTINCT docs (within-doc repeats alone don't
    count, matching ``ngramstats.cross_dup_scores``).

    Fully distributed, four bounded exchanges, window POSITIONS never
    shuffle: (1) map-side df partials -> ``groupby(skey).sum`` -> dup
    keys (df >= 2); (2) distinct (doc, skey) pairs join the dup keys
    via ``shuffle_hash_join``; (3) the (doc_id, dup skey) rows and the
    corpus co-shuffle on ``hash(doc_id)`` — a doc-id Bloom built from
    the pair rows drops clean docs map-side, so their texts never ride
    the join — and each doc recomputes its window positions locally
    inside ``map_groups``."""
    pairs = _dup_window_pairs(ds, w, num_buckets)
    n_pairs = pairs.count()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "span_start": pa.array([], pa.int64()),
                      "span_end": pa.array([], pa.int64())})
    if n_pairs == 0:
        if not collect:
            import ray.data

            return ray.data.from_arrow(empty)
        return empty
    m_bits = _bloom_size_bits(n_pairs)
    bloom_ref = _ids_bloom(pairs, "doc_id", m_bits)

    def text_rows(b: pa.Table) -> pa.Table:
        import ray

        ids = b.column("doc_id").to_numpy().astype(np.int64)
        keep = _bloom_test(ray.get(bloom_ref), ids, m_bits)
        if not keep.all():
            b = b.filter(pa.array(keep))
            ids = ids[keep]
        return pa.table({
            "jkey": pa.array(_doc_jkey(ids, num_buckets)),
            "kind": pa.array(np.ones(len(ids), np.int8)),
            "doc_id": pa.array(ids, pa.int64()),
            "skey": pa.array(np.zeros(len(ids), np.int64)),
            "text": b.column("text").cast(pa.string()),
        })

    routed = pairs.map_batches(
        partial(_dup_pair_rows, num_buckets=num_buckets),
        batch_format="pyarrow").union(
        ds.map_batches(text_rows, batch_format="pyarrow"))
    spans = routed.groupby("jkey").map_groups(
        partial(_dup_span_group, w=w), batch_format="pyarrow")
    if not collect:
        return spans
    from .equijoin import collect_arrow

    # collect_arrow drops map_groups' zero-column empty blocks that a raw
    # iter_batches+concat would trip over (shuffle_hash_join caveat)
    t = collect_arrow(spans, empty.schema)
    if t.num_rows == 0:
        return empty
    return t.sort_by([("doc_id", "ascending"),
                      ("span_start", "ascending")])


def _scrub_group(group: pa.Table, w: int) -> pa.Table:
    """One doc-hash bucket of the scrub: per doc, tokens covered by any
    cross-doc duplicated w-gram window are removed and the survivors
    rejoin with single spaces (whitespace-NORMALIZING rewrite — runs of
    spaces collapse, matching the SQL oracle's token-list rebuild)."""
    kind = group.column("kind").to_numpy()
    pmask = kind == 0
    out_d: list[int] = []
    out_t: list[str] = []
    out_r: list[int] = []
    if (~pmask).any():
        p = group.filter(pa.array(pmask))
        pid = p.column("doc_id").to_numpy().astype(np.int64)
        pkey = p.column("skey").to_numpy().astype(np.int64)
        order = np.lexsort((pkey, pid))
        pid, pkey = pid[order], pkey[order]
        t = group.filter(pa.array(~pmask))
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            toks = [x for x in (txt or "").split(" ") if x]
            lo = int(np.searchsorted(pid, did, "left"))
            hi = int(np.searchsorted(pid, did, "right"))
            if lo == hi or len(toks) < w:  # Bloom fp / short doc: clean
                out_d.append(did)
                out_t.append(" ".join(toks))
                out_r.append(0)
                continue
            keys = pkey[lo:hi]
            h_i64 = shingle_hashes(txt or "", w).view(np.int64)
            pos = np.searchsorted(keys, h_i64)
            pos_ok = pos < len(keys)
            dup = np.zeros(len(h_i64), bool)
            dup[pos_ok] = keys[pos[pos_ok]] == h_i64[pos_ok]
            dpos = np.nonzero(dup)[0]
            n = len(toks)
            # covered[i] = i inside any dup window [p, p+w): diff trick
            delta = np.zeros(n + 1, np.int32)
            np.add.at(delta, dpos, 1)
            np.add.at(delta, np.minimum(dpos + w, n), -1)
            covered = np.cumsum(delta[:-1]) > 0
            kept = [tok for tok, c in zip(toks, covered) if not c]
            out_d.append(did)
            out_t.append(" ".join(kept))
            out_r.append(int(covered.sum()))
    return pa.table({
        "doc_id": pa.array(out_d, pa.int64()),
        "clean_text": pa.array(out_t, pa.string()),
        "n_removed": pa.array(out_r, pa.int64()),
    })


def dup_span_scrub(ds, w: int = 4, num_buckets: int = _JOIN_BUCKETS,
                   collect: bool = True):
    """Apply the ``dup_token_spans`` result: REMOVE every token covered
    by a cross-doc duplicated w-gram window and return (doc_id,
    clean_text, n_removed) for EVERY doc — the end-to-end
    substring-dedup rewrite of Lee et al. (ACL 2022). The rewrite is
    whitespace-normalizing (tokens rejoin with single spaces).

    Same exchanges as ``dup_token_spans``; the Bloom split makes the
    clean-doc majority ZERO-shuffle: docs testing negative emit
    (doc_id, text, 0) map-side and never ride the doc-hash groupby —
    only dup-suspect texts shuffle. Bloom false positives route, find
    no pair rows in their group, and emit unchanged."""
    pairs = _dup_window_pairs(ds, w, num_buckets)
    n_pairs = pairs.count()

    def norm_all(b: pa.Table) -> pa.Table:
        texts = [" ".join(x for x in (t or "").split(" ") if x)
                 for t in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "clean_text": pa.array(texts, pa.string()),
            "n_removed": pa.array(
                np.zeros(b.num_rows, np.int64)),
        })

    if n_pairs == 0:
        result = ds.map_batches(norm_all, batch_format="pyarrow")
    else:
        m_bits = _bloom_size_bits(n_pairs)
        bloom_ref = _ids_bloom(pairs, "doc_id", m_bits)

        def suspect_rows(b: pa.Table) -> pa.Table:
            import ray

            ids = b.column("doc_id").to_numpy().astype(np.int64)
            keep = _bloom_test(ray.get(bloom_ref), ids, m_bits)
            b = b.filter(pa.array(keep))
            ids = ids[keep]
            return pa.table({
                "jkey": pa.array(_doc_jkey(ids, num_buckets)),
                "kind": pa.array(np.ones(len(ids), np.int8)),
                "doc_id": pa.array(ids, pa.int64()),
                "skey": pa.array(np.zeros(len(ids), np.int64)),
                "text": b.column("text").cast(pa.string()),
            })

        def clean_rows(b: pa.Table) -> pa.Table:
            import ray

            ids = b.column("doc_id").to_numpy().astype(np.int64)
            keep = ~_bloom_test(ray.get(bloom_ref), ids, m_bits)
            return norm_all(b.filter(pa.array(keep)))

        routed = pairs.map_batches(
            partial(_dup_pair_rows, num_buckets=num_buckets),
            batch_format="pyarrow") \
            .union(ds.map_batches(suspect_rows, batch_format="pyarrow"))
        scrubbed = routed.groupby("jkey").map_groups(
            partial(_scrub_group, w=w), batch_format="pyarrow")
        result = scrubbed.union(
            ds.map_batches(clean_rows, batch_format="pyarrow"))
    if not collect:
        return result
    from .equijoin import collect_arrow

    t = collect_arrow(result, pa.schema([
        ("doc_id", pa.int64()), ("clean_text", pa.string()),
        ("n_removed", pa.int64())]))
    return t.sort_by("doc_id")


def _verify_candidate_pairs(ds, cand, threshold: float, w: int,
                            collect: bool = True):
    """Shared tail of the text near-dup pipelines: candidate (doc_a,
    doc_b) id pairs -> exact-w-shingle-Jaccard-verified pairs, fully
    distributed (steps 2-3 of the ``minhash_dedup_pairs`` docstring:
    Bloom-gated shuffle semi-join for the texts, pair-hash vbucket
    shuffle for the verify). Used by both ``minhash_dedup_pairs`` and
    ``ngram_jaccard_pairs``."""
    # three consumers (pair rows + need rows + bloom): materialize the id
    # pairs — 16 bytes/pair in the distributed object store, never the
    # driver
    cand = cand.materialize()
    empty = pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    })
    n_cand = cand.count()
    if n_cand == 0:
        if not collect:
            import ray.data

            return ray.data.from_arrow(empty)
        return empty
    # The bucket groupby leaves one near-empty block per collision bucket;
    # every downstream stage (bloom pass, two groupby shuffles) pays
    # per-block task overhead on them. Coalesce to a block count
    # PROPORTIONAL TO ROWS (~200k pairs/block — 1e9 candidates still get
    # 5k blocks), which cut the sf0.1 join+verify wall 3x.
    tgt_blocks = max(1, -(-n_cand // 200_000))
    if cand.num_blocks() > 4 * tgt_blocks:
        cand = cand.repartition(tgt_blocks).materialize()
    m_bits = _bloom_size_bits(2 * n_cand)
    bloom_ref = _candidate_bloom(cand, m_bits)

    pair_rows = cand.map_batches(_pair_rows_batch, batch_format="pyarrow")
    needs = cand.map_batches(_needs_batch, batch_format="pyarrow")
    corpus_keyed = ds.map_batches(
        partial(_corpus_keyed_batch, bloom_ref=bloom_ref, m_bits=m_bits),
        batch_format="pyarrow")
    routed = needs.union(corpus_keyed).groupby("jkey").map_groups(
        _route_join_group, batch_format="pyarrow")

    union = pair_rows.union(routed)
    verified = union.groupby("vbucket").map_groups(
        partial(_verify_group, threshold=threshold, w=w),
        batch_format="pyarrow")
    if not collect:
        return verified          # (doc_a, doc_b, jaccard) Dataset, unsorted
    chunks = list(verified.iter_batches(batch_size=65536,
                                        batch_format="pyarrow"))
    t = pa.concat_tables(chunks) if chunks else empty
    if t.num_rows == 0:
        return empty
    return t.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity self-join (prefix filter)
# ---------------------------------------------------------------------------
#
# AllPairs / PPJoin prefix filtering (Bayardo, Ma & Srikant, WWW 2007;
# Xiao, Wang, Lin & Yu, WWW 2008 — public literature): fix ANY global
# total order over shingles; for a doc with s distinct shingles the
# PREFIX is its first  p = s - ceil(t*s) + 1  shingles in that order.
# If J(A,B) >= t then |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), and a prefix
# that avoided every element of A∩B would leave all intersection
# elements in A's last ceil(t*s)-1 positions — fewer than t*s of them —
# a contradiction; symmetrically for B, and because the order is GLOBAL
# the smallest element of A∩B lies in both prefixes. So every
# qualifying pair collides on at least one prefix shingle: grouping on
# prefix shingles is a candidate generator with NO false negatives, and
# the exact-Jaccard verify keeps precision exact. Correctness needs
# only a total order; ordering by ASCENDING document frequency is the
# standard heuristic that keeps prefix-shingle groups small (a shingle
# common to f docs would otherwise create an O(f^2) group).

_HOT_HEAD_K = 1 << 16   # hot-shingle head table rows (fixed broadcast, ~1 MB)


_HEAD_SAMPLE_DOCS = 4096    # df-head sample size (bounds driver state)


def _shingle_df_partial(batch: pa.Table, w: int,
                        sample_mod: int = 1) -> pa.Table:
    """Per-batch partial document frequency over a DETERMINISTIC doc
    sample (hash(doc_id) % sample_mod == 0): (shingle, cnt) with distinct
    shingles per doc, counted across the batch's sampled docs."""
    texts = batch.column("text").to_pylist()
    if sample_mod > 1:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        keep = (_fnv1a_u64_rows(ids.astype(np.uint64)[:, None])
                % np.uint64(sample_mod)) == 0
        texts = [t for t, k in zip(texts, keep.tolist()) if k]
    per_doc = [np.unique(shingle_hashes(t or "", w)) for t in texts]
    allh = _cat(per_doc, np.uint64)
    if not len(allh):
        return pa.table({"shingle": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    u, c = np.unique(allh, return_counts=True)
    # int64 REINTERPRET of the uint64 hash: Ray's row rebuild can't
    # represent uint64 > 2^63-1; the view is bijective, so counting and
    # ordering are unchanged
    return pa.table({"shingle": pa.array(u.view(np.int64), pa.int64()),
                     "cnt": pa.array(c.astype(np.int64), pa.int64())})


def _hot_shingle_head(ds, w: int, head_k: int, total_docs: int | None = None):
    """The ~head_k most-document-frequent shingles as (sorted-hash array,
    df array), broadcast once via ray.put.

    Estimated from a BOUNDED deterministic sample (~_HEAD_SAMPLE_DOCS docs
    by doc_id hash — the same shape as the IVF quantizer's deliberate
    sample): per-batch partial (shingle, cnt) tables merge on the driver
    with one np.unique, so the driver holds sample-vocab-sized state, never
    corpus-vocab, and no all-to-all runs at all. The head only ORDERS
    shingles — ANY head yields the identical verified pair set (the prefix
    filter is exact under any total order); a worse estimate just admits
    more candidates into the verify."""
    import ray

    if total_docs is None:
        total_docs = ds.count()
    sample_mod = max(1, total_docs // _HEAD_SAMPLE_DOCS)
    parts = ds.map_batches(
        partial(_shingle_df_partial, w=w, sample_mod=sample_mod),
        batch_format="pyarrow")
    hs: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        hs.append(b.column("shingle").to_numpy().astype(np.int64))
        cs.append(b.column("cnt").to_numpy().astype(np.int64))
    h = _cat(hs, np.int64)
    if len(h):
        c = _cat(cs, np.int64)
        u, inv = np.unique(h, return_inverse=True)
        cnt = np.zeros(len(u), np.int64)
        np.add.at(cnt, inv, c)
        if len(u) > head_k:
            top = np.argpartition(cnt, -head_k)[-head_k:]
            u, cnt = u[top], cnt[top]
            order = np.argsort(u)
            u, cnt = u[order], cnt[order]
        h, c = u, cnt
    else:
        h = np.empty(0, np.int64)
        c = np.empty(0, np.int64)
    return ray.put((h, c))


class PrefixEmitStage:
    """Prefix-shingle emit: one (bucket, shingle, doc_id, size) row per
    PREFIX shingle of each doc under the (df-of-head-else-1, hash) total
    order. Head arrays are fetched from the object store once per actor."""

    def __init__(self, threshold: float, w: int, head_ref):
        self._t = threshold
        self._w = w
        self._head_ref = head_ref
        self._hot = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._hot is None:
            import ray

            # fetched from the object store once per worker (zero-copy
            # numpy view), not shipped per batch
            self._hot = ray.get(self._head_ref)
        self._hot_hash, self._hot_cnt = self._hot
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        per_doc = [np.unique(shingle_hashes(t or "", self._w))
                   for t in batch.column("text").to_pylist()]
        lens = np.array([len(h) for h in per_doc], np.int64)
        empty = pa.table({
            "bucket": pa.array([], pa.int32()),
            "shingle": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "size": pa.array([], pa.int32()),
            "pos": pa.array([], pa.int32()),
        })
        if not lens.sum():
            return empty
        allh = _cat(per_doc, np.uint64)
        docidx = np.repeat(np.arange(len(ids)), lens)
        # df key: head shingles carry their global df, tail shingles 1 —
        # still a TOTAL order with the hash tiebreak, so exactness holds
        # (head hashes are stored as the int64 reinterpret; see
        # _shingle_df_partial)
        allh_i64 = allh.view(np.int64)
        pos = np.searchsorted(self._hot_hash, allh_i64)
        pos_ok = pos < len(self._hot_hash)
        key = np.ones(len(allh), np.int64)
        hit = np.zeros(len(allh), bool)
        hit[pos_ok] = self._hot_hash[pos[pos_ok]] == allh_i64[pos_ok]
        key[hit] = self._hot_cnt[pos[hit]]
        # one lexsort: per-doc runs, rare-then-hash order inside each run
        order = np.lexsort((allh, key, docidx))
        # prefix length p = s - ceil(t*s) + 1 per doc (>= 1 for s >= 1)
        p = lens - np.ceil(self._t * lens).astype(np.int64) + 1
        starts = np.zeros(len(ids), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        rank_in_doc = np.arange(len(allh)) - starts[docidx[order]]
        keep = rank_in_doc < p[docidx[order]]
        sel = order[keep]
        sh = allh[sel]
        bucket = (_fnv1a_u64_rows(sh[:, None])
                  % np.uint64(_LSH_BUCKETS)).astype(np.int32)
        return pa.table({
            "bucket": pa.array(bucket),
            "shingle": pa.array(sh, pa.uint64()),
            "doc_id": pa.array(ids[docidx[sel]], pa.int64()),
            "size": pa.array(lens[docidx[sel]].astype(np.int32), pa.int32()),
            "pos": pa.array(rank_in_doc[keep].astype(np.int32), pa.int32()),
        })


def _prefix_pair_scan(group: pa.Table, threshold: float) -> pa.Table:
    """One coarse bucket of prefix-shingle rows -> candidate id pairs:
    lexsort, segment per exact shingle, vectorized all-pairs per segment
    (star-capped for pathological giant segments — see MAX_SEGMENT_DOCS),
    then two exact prune rules a qualifying pair must satisfy:

    - length filter: min_size >= t * max_size (|A∩B| <= min, |A∪B| >= max);
    - PPJoin positional filter: at the pair's FIRST common prefix shingle
      (position i in A's df-order, j in B's) every other intersection
      element sorts after it, so |A∩B| <= 1 + min(sA-i-1, sB-j-1); keep the
      pair if ANY collision's bound reaches the required overlap
      alpha = t*(sA+sB)/(1+t) — the first-collision bound always does for a
      true pair, so recall is untouched."""
    sh = group.column("shingle").to_numpy().astype(np.uint64)
    ids = group.column("doc_id").to_numpy().astype(np.int64)
    sz = group.column("size").to_numpy().astype(np.int64)
    pos = group.column("pos").to_numpy().astype(np.int64)
    order = np.lexsort((ids, sh))
    sh_s, ids_s, sz_s, pos_s = sh[order], ids[order], sz[order], pos[order]
    n = len(ids_s)
    change = np.ones(n, bool)
    change[1:] = sh_s[1:] != sh_s[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for a, b in _segment_pairs(ids_s, starts, ends, "ngram_jaccard_prefix"):
        sa = sz_s[a].astype(np.float64)
        sb = sz_s[b].astype(np.float64)
        keep = (np.minimum(sa, sb)
                >= threshold * np.maximum(sa, sb) - 1e-9)
        ubound = 1.0 + np.minimum(sa - pos_s[a] - 1, sb - pos_s[b] - 1)
        alpha = threshold * (sa + sb) / (1.0 + threshold)
        keep &= ubound >= alpha - 1e-9
        out_a.append(ids_s[a][keep])
        out_b.append(ids_s[b][keep])
    pair = np.stack([_cat(out_a, np.int64), _cat(out_b, np.int64)], axis=1)
    if len(pair):
        # same pair via several shingles in this bucket: emit once
        pair = np.unique(pair, axis=0)
    return pa.table({
        "doc_a": pa.array(pair[:, 0], pa.int64()),
        "doc_b": pa.array(pair[:, 1], pa.int64()),
    })


def ngram_jaccard_pairs(ds, threshold: float = 0.5, w: int = 3,
                        head_k: int = _HOT_HEAD_K, collect: bool = True):
    """EXACT n-gram Jaccard similarity self-join: every pair with
    w-token-shingle Jaccard >= threshold, no probabilistic recall gap
    (unlike MinHash banding, which is recall-complete only at tuned
    parameters). Returns (doc_a, doc_b, jaccard), doc_a < doc_b, sorted.

    Shape (fully distributed, nothing corpus-scale on the driver):
    1. shingle-DF groupby (16-byte rows) -> fixed-size hot-head broadcast;
    2. prefix emit: ~(1-t)*s + 1 rows per doc shuffle to shingle groups
       (prefix filter => no false negatives; df order keeps groups small);
    3. per-group pair scan + PPJoin length filter = candidates;
    4. the shared Bloom-gated semi-join + vbucket exact-Jaccard verify
       (``_verify_candidate_pairs``).

    The star cap on pathological giant prefix groups (MAX_SEGMENT_DOCS,
    logged, never silent) is the one bounded exception to exactness —
    identical to the MinHash path's caveat."""
    head_ref = _hot_shingle_head(ds, w, head_k)
    prefix = ds.map_batches(PrefixEmitStage(threshold, w, head_ref),
                            batch_format="pyarrow", concurrency=None)
    cand = prefix.groupby("bucket").map_groups(
        partial(_prefix_pair_scan, threshold=threshold),
        batch_format="pyarrow")
    return _verify_candidate_pairs(ds, cand, threshold, w, collect=collect)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    """64-bit SimHash over token FNV hashes, weighted by tf.

    Vectorized: token hashes come from ``shingle_hashes(text, w=1)`` (the
    C-accelerated per-token FNV-1a64), and summing +-1 bit contributions
    over ALL token occurrences is identical to the tf-weighted unique-token
    sum. Bit i of the signature is set when more (tf-weighted) tokens have
    bit i set than clear. The bit counting runs once per BATCH: all docs'
    token hashes concatenate into one (T, 64) unpackbits matrix and
    ``np.add.reduceat`` sums per-doc segments."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(batch.num_rows, np.uint64)
        per_doc = [shingle_hashes(t or "", 1)
                   for t in batch.column("text").to_pylist()]
        lens = np.array([len(h) for h in per_doc], np.int64)
        nonempty = np.nonzero(lens > 0)[0]
        if len(nonempty):
            all_h = np.concatenate([per_doc[i] for i in nonempty])
            bits = np.unpackbits(all_h.view(np.uint8).reshape(len(all_h), 8),
                                 axis=1, bitorder="little")
            starts = np.zeros(len(nonempty), np.int64)
            np.cumsum(lens[nonempty[:-1]], out=starts[1:])
            sums = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
            majority = (sums * 2 - lens[nonempty, None]) > 0
            out[nonempty] = np.packbits(
                majority, axis=1, bitorder="little").view(np.uint64).ravel()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.uint64()),
        })


def _simhash_band_explode(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> one row per 16-bit band slice:
    (bucket, band, seg, doc_id, simhash). ``bucket`` coarsens (band, seg)
    by FNV to ~_LSH_BUCKETS shuffle groups — same trick as the MinHash
    band groupby — so the wide step moves 4 x ~26 bytes per doc, never the
    text, and lands in a handful of vectorized group calls."""
    n = batch.num_rows
    sh = batch.column("simhash").to_numpy().astype(np.uint64)
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    band = np.tile(np.arange(4, dtype=np.uint64), n)
    seg = (np.repeat(sh, 4) >> (band * np.uint64(16))) & np.uint64(0xFFFF)
    bh = _fnv1a_u64_rows(np.stack([band, seg], axis=1))
    return pa.table({
        "bucket": pa.array((bh % np.uint64(_LSH_BUCKETS)).astype(np.int32)),
        "band": pa.array(band.astype(np.int32)),
        "seg": pa.array(seg),
        "doc_id": pa.array(np.repeat(ids, 4)),
        "simhash": pa.array(np.repeat(sh, 4)),
    })


def _simhash_bucket_pairs(group: pa.Table, max_hamming: int) -> pa.Table:
    """Same-(band, seg) pairs within one coarse bucket, Hamming-verified
    in place (signatures ride the shuffle, so no second corpus pass):
    one lexsort + segment scan; only colliding segments expand."""
    band = group.column("band").to_numpy()
    seg = group.column("seg").to_numpy()
    ids = group.column("doc_id").to_numpy()
    sh = group.column("simhash").to_numpy().astype(np.uint64)
    order = np.lexsort((ids, seg, band))
    band_s, seg_s, ids_s, sh_s = band[order], seg[order], ids[order], sh[order]
    n = len(ids_s)
    change = np.ones(n, bool)
    change[1:] = (band_s[1:] != band_s[:-1]) | (seg_s[1:] != seg_s[:-1])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    pa_, pb_, ha_ = [], [], []
    for a, b in _segment_pairs(ids_s, starts, ends, "simhash"):
        xor = sh_s[a] ^ sh_s[b]
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        pa_.append(ids_s[a[keep]])
        pb_.append(ids_s[b[keep]])
        ha_.append(ham[keep])
    return pa.table({
        "doc_a": pa.array(_cat(pa_, np.int64), pa.int64()),
        "doc_b": pa.array(_cat(pb_, np.int64), pa.int64()),
        "hamming": pa.array(_cat(ha_, np.int64), pa.int64()),
    })


def simhash_pairs(ds, max_hamming: int = 3):
    """Candidate near-dup pairs by 4x16-bit band blocking on SimHash, verified
    by Hamming distance <= max_hamming. Returns (doc_a, doc_b, hamming).

    Scale shape: signature -> band-explode -> coarse-bucket ``groupby``
    (the only shuffle; ~104 bytes/doc) -> per-group pair scan with the
    Hamming verify INSIDE the group (signatures travel with the rows).
    Only verified pairs — orders of magnitude smaller than the corpus —
    reach the driver, where duplicates across bands are dropped."""
    sigs = ds.map_batches(SimHashStage, batch_format="pyarrow",
                          concurrency=(1, 16))
    bands = sigs.map_batches(_simhash_band_explode, batch_format="pyarrow")
    pairs = bands.groupby("bucket").map_groups(
        partial(_simhash_bucket_pairs, max_hamming=max_hamming),
        batch_format="pyarrow")
    chunks = list(pairs.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"))
    empty = pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "hamming": pa.array([], pa.int64()),
    })
    t = pa.concat_tables(chunks) if chunks else empty
    a = t.column("doc_a").to_numpy()
    b = t.column("doc_b").to_numpy()
    h = t.column("hamming").to_numpy()
    if not len(a):
        return empty
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    uniq, first = np.unique(np.stack([lo, hi], axis=1), axis=0,
                            return_index=True)
    return pa.table({
        "doc_a": pa.array(uniq[:, 0], pa.int64()),
        "doc_b": pa.array(uniq[:, 1], pa.int64()),
        "hamming": pa.array(h[first], pa.int64()),
    })

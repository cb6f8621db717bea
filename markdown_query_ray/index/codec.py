"""Delta-encoded varint block posting-list codec, numpy-vectorized.

The reference's glass backend stores posting lists as B-tree chunks keyed
(term, first_did_of_chunk) with docids delta-encoded as LEB128-style varints
(gap-1; xapian-core-1.4.17/common/pack.h:380-391, chunk headers at
backends/glass/glass_postlist.cc:131-147). This codec reproduces that shape
columnar: fixed-size blocks (default 128 docs) of

    (term, block_id, first_doc_id, last_doc_id, n,
     ids_enc, tfs_enc, dls_enc,            # varint payloads
     max_wdf, min_doclen, sum_wdf)

- ``ids_enc``: varint(gap-1) for docs 1..n-1 (the first docid lives in the
  column, so salted sub-lists concatenate without re-encoding).
- ``tfs_enc`` / ``dls_enc``: varint wdf and doclen per doc. Storing doclen in
  the posting block makes scoring self-contained (no doc-table join in the
  scorer) — the per-block (max_wdf, min_doclen) pair is the max-score
  metadata: score_ub(block) = w_t * sumpart(max_wdf, min_doclen), a per-block
  refinement of BM25Weight::get_maxpart (weight/bm25weight.cc:176-201).

Everything encodes/decodes in whole-partition numpy passes: per-value byte
lengths -> exclusive prefix sum -> one byte buffer, then per-block binary
slices come from offset arithmetic (an Arrow BinaryArray over the same
buffer). No per-row Python in either direction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BLOCK_SIZE_DEFAULT = 128


def _ctok():
    from ..functions.ctok import load

    return load()


def encode_varints(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array. Returns (bytes:uint8[], end_offsets) where
    end_offsets[i] is the exclusive end of value i's bytes.

    Dispatches to the C kernel (functions/_ctok.c varint_encode64) when
    available; the numpy implementation below is the fallback and the parity
    baseline (tests/test_codec.py fuzzes the two against each other)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    m = _ctok()
    if m is not None and hasattr(m, "varint_encode64"):
        payload, ends = m.varint_encode64(vals)
        return (np.frombuffer(payload, np.uint8),
                np.frombuffer(ends, np.int64))
    return _encode_varints_np(vals)


def _encode_varints_np(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(vals)
    nbytes = np.ones(n, np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nbytes += v > 0
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    out = np.zeros(ends[-1], np.uint8)
    starts = ends - nbytes
    v = vals.copy()
    remaining = nbytes.copy()
    layer = 0
    while True:
        mask = remaining > 0
        if not mask.any():
            break
        b = (v[mask] & np.uint64(0x7F)).astype(np.uint8)
        b |= (remaining[mask] > 1).astype(np.uint8) << 7
        out[starts[mask] + layer] = b
        v >>= np.uint64(7)
        remaining -= 1
        layer += 1
    return out, ends


def decode_varints(buf: np.ndarray | bytes) -> np.ndarray:
    """Decode a packed LEB128 stream into a uint64 array.

    C kernel when available (varint_decode64); numpy fallback below is the
    parity baseline."""
    data = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) \
        else buf
    if len(data) == 0:
        return np.empty(0, np.uint64)
    m = _ctok()
    if m is not None and hasattr(m, "varint_decode64"):
        return np.frombuffer(m.varint_decode64(data), np.uint64)
    return _decode_varints_np(data)


def _decode_varints_np(data: np.ndarray) -> np.ndarray:
    ends = np.nonzero((data & 0x80) == 0)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(len(ends), np.uint64)
    span = ends - starts + 1
    for k in range(int(span.max())):
        mask = span > k
        vals[mask] |= (data[starts[mask] + k].astype(np.uint64)
                       & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals


def pack_for_blocks(vals: np.ndarray,
                    seg_counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Frame-of-reference bit-pack consecutive segments of ``vals``
    (segment i holds seg_counts[i] values). Per segment: one width byte
    w = bitlen(max), then ceil(k*w/8) bytes of LSB-first packed values;
    empty segments emit nothing. Returns (payload:uint8[], seg_byte_ends).

    C kernel when available; numpy fallback is the parity baseline."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    seg_counts = np.ascontiguousarray(seg_counts, dtype=np.int64)
    m = _ctok()
    if m is not None and hasattr(m, "for_pack64"):
        payload, ends = m.for_pack64(vals, seg_counts)
        return (np.frombuffer(payload, np.uint8),
                np.frombuffer(ends, np.int64))
    return _pack_for_np(vals, seg_counts)


def _pack_for_np(vals: np.ndarray,
                 seg_counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    chunks: list[bytes] = []
    ends = np.zeros(len(seg_counts), np.int64)
    pos = 0
    vi = 0
    for b, k in enumerate(seg_counts):
        k = int(k)
        if k:
            seg = vals[vi:vi + k]
            vi += k
            w = int(seg.max()).bit_length()
            if w:
                bits = ((seg[:, None] >> np.arange(w, dtype=np.uint64))
                        & np.uint64(1)).astype(np.uint8)
                packed = np.packbits(bits.ravel(), bitorder="little")
                chunks.append(bytes([w]) + packed.tobytes())
                pos += 1 + len(packed)
            else:
                chunks.append(bytes([0]))
                pos += 1
        ends[b] = pos
    return np.frombuffer(b"".join(chunks), np.uint8), ends


def unpack_for_blocks(buf: np.ndarray | bytes,
                      seg_counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_for_blocks` over a concatenated payload."""
    data = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) \
        else buf
    seg_counts = np.ascontiguousarray(seg_counts, dtype=np.int64)
    m = _ctok()
    if m is not None and hasattr(m, "for_unpack64"):
        return np.frombuffer(m.for_unpack64(data, seg_counts), np.uint64)
    return _unpack_for_np(data, seg_counts)


def _unpack_for_np(data: np.ndarray, seg_counts: np.ndarray) -> np.ndarray:
    out: list[np.ndarray] = []
    pos = 0
    for k in seg_counts:
        k = int(k)
        if k <= 0:
            continue
        w = int(data[pos])
        pos += 1
        if w == 0:
            out.append(np.zeros(k, np.uint64))
            continue
        nb = (k * w + 7) >> 3
        bits = np.unpackbits(data[pos:pos + nb],
                             bitorder="little")[:k * w].reshape(k, w)
        vals = (bits.astype(np.uint64)
                << np.arange(w, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64)
        out.append(vals)
        pos += nb
    if not out:
        return np.empty(0, np.uint64)
    return np.concatenate(out)


_INT32_MAX = (1 << 31) - 1


def _check_binary_size(total_bytes: int) -> None:
    """Arrow ``binary`` carries int32 offsets; a partition payload past
    2 GiB would silently wrap into negative offsets. Web-scale partitions
    are sized by num_term_parts x num_doc_buckets — fail loudly and point
    at the knob instead of corrupting the index."""
    if total_bytes > _INT32_MAX:
        raise ValueError(
            f"posting partition payload {total_bytes} bytes exceeds the "
            f"2 GiB Arrow binary-offset limit; raise "
            f"IndexConfig.num_term_parts / num_doc_buckets so each "
            f"shuffle partition stays under 2 GiB")


def _segment_binary(payload: np.ndarray, value_ends: np.ndarray,
                    seg_value_counts: np.ndarray) -> pa.BinaryArray:
    """Split a packed varint stream into per-segment binary values, where
    segment i holds seg_value_counts[i] consecutive varints. Zero-copy over
    the payload buffer."""
    if len(value_ends):
        _check_binary_size(int(value_ends[-1]))
    cum_vals = np.cumsum(seg_value_counts)
    byte_ends = np.zeros(len(seg_value_counts) + 1, np.int32)
    nz = cum_vals > 0
    byte_ends[1:][nz] = value_ends[cum_vals[nz] - 1]
    # segments with zero values share the previous offset
    np.maximum.accumulate(byte_ends, out=byte_ends)
    return pa.BinaryArray.from_buffers(
        pa.binary(), len(seg_value_counts),
        [None, pa.py_buffer(byte_ends.tobytes()),
         pa.py_buffer(payload.tobytes())])


def encode_partition(terms: np.ndarray, doc_ids: np.ndarray,
                     tfs: np.ndarray, doclens: np.ndarray,
                     block_size: int = BLOCK_SIZE_DEFAULT,
                     npos: np.ndarray | None = None,
                     pos_payloads: np.ndarray | None = None,
                     stripe_size: int | None = None,
                     codec: str = "varint") -> pa.Table:
    """Encode one shuffle partition — rows sorted by (term, doc_id) — into
    posting-block rows. ``terms`` is an object/str numpy array aligned with
    the numeric columns.

    Positional mode (``npos``/``pos_payloads`` given): each posting row
    carries its in-document position list, already varint-encoded as
    [first_pos, gap, gap, ...] bytes (``pos_payloads``, object array of
    bytes) with ``npos`` the per-posting position count. Two extra block
    columns are emitted: ``npos_enc`` (varint count per posting) and
    ``pos_enc`` (the block's payload bytes concatenated) — the positional
    analog of glass's ``position.`` B-tree (backends/glass/glass_positionlist.cc),
    kept alongside the posting block so phrase evaluation reads no extra file.

    ``stripe_size`` (the index's docs_per_bucket) forces an extra block
    split wherever consecutive postings cross a doc-bucket stripe boundary
    (doc_id // stripe_size changes). With S>1 buckets each bucket owns the
    id stripes {b*dpb + k*S*dpb}; once updates push ids past dpb*S a
    bucket's id set is two-plus disjoint intervals, and a block spanning
    the wrap would have a [first,last] range overlapping ANOTHER bucket's
    blocks — the whole-index reader sorts blocks by first_doc_id and would
    silently emit non-monotone doc_ids into the searchsorted-based AND /
    WAND paths. Stripe-aligned blocks keep every block inside one disjoint
    interval, so block order == global doc order by construction."""
    n = len(doc_ids)
    if n == 0:
        return _empty_blocks_table(with_positions=npos is not None)
    doc_ids = np.ascontiguousarray(doc_ids, np.uint64)
    tfs = np.ascontiguousarray(tfs, np.uint64)
    doclens = np.ascontiguousarray(doclens, np.uint64)

    term_change = np.ones(n, bool)
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if isinstance(terms, pa.Array):
        # Arrow-native path: no per-row Python string conversion (the term
        # column of a big shuffle group is hundreds of thousands of rows)
        term_change[1:] = pc.not_equal(
            terms.slice(1), terms.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
    else:
        term_change[1:] = terms[1:] != terms[:-1]
    term_start_idx = np.nonzero(term_change)[0]
    # index of each row within its term's posting list
    within = np.arange(n) - np.repeat(
        term_start_idx, np.diff(np.append(term_start_idx, n)))
    block_start = within % block_size == 0
    if stripe_size and stripe_size > 0:
        stripe = doc_ids // np.uint64(stripe_size)
        block_start[1:] |= stripe[1:] != stripe[:-1]
    # per-term running block number (with stripe splits the natural
    # ``within // block_size`` numbering no longer holds)
    starts_cum = np.cumsum(block_start)
    term_counts = np.diff(np.append(term_start_idx, n))
    block_id = starts_cum - np.repeat(starts_cum[term_start_idx],
                                      term_counts)
    bstart_idx = np.nonzero(block_start)[0]
    bcounts = np.diff(np.append(bstart_idx, n))
    nblocks = len(bstart_idx)

    # doc-id gaps (gap-1) for non-first entries of each block
    gaps = np.empty(n, np.uint64)
    gaps[0] = 0
    gaps[1:] = doc_ids[1:] - doc_ids[:-1] - 1
    if codec == "bitpack":
        ids_payload, ids_bends = pack_for_blocks(gaps[~block_start],
                                                 bcounts - 1)
        ids_enc = _binary_from_seg_ends(ids_payload, ids_bends)
        tf_payload, tf_bends = pack_for_blocks(tfs, bcounts)
        tfs_enc = _binary_from_seg_ends(tf_payload, tf_bends)
        dl_payload, dl_bends = pack_for_blocks(doclens, bcounts)
        dls_enc = _binary_from_seg_ends(dl_payload, dl_bends)
    elif codec == "varint":
        ids_payload, ids_ends = encode_varints(gaps[~block_start])
        ids_enc = _segment_binary(ids_payload, ids_ends, bcounts - 1)
        tf_payload, tf_ends = encode_varints(tfs)
        tfs_enc = _segment_binary(tf_payload, tf_ends, bcounts)
        dl_payload, dl_ends = encode_varints(doclens)
        dls_enc = _segment_binary(dl_payload, dl_ends, bcounts)
    else:
        raise ValueError(f"unknown posting codec {codec!r}")

    bend_idx = np.append(bstart_idx[1:], n) - 1
    max_wdf = np.maximum.reduceat(tfs, bstart_idx)
    min_dl = np.minimum.reduceat(doclens, bstart_idx)
    sum_wdf = np.add.reduceat(tfs, bstart_idx)

    pos_cols = {}
    if npos is not None:
        np_payload, np_ends = encode_varints(
            np.ascontiguousarray(npos, np.uint64))
        pos_cols["npos_enc"] = _segment_binary(np_payload, np_ends, bcounts)
        if isinstance(pos_payloads, (pa.Array, pa.ChunkedArray)):
            offs, pbuf = _binary_parts(pos_payloads)
            pends = offs[1:]
        else:  # numpy object array of bytes
            plens = np.fromiter((len(b) for b in pos_payloads), np.int64, n)
            pends = np.cumsum(plens)
            pbuf = b"".join(pos_payloads)
        if len(pends):
            _check_binary_size(int(pends[-1]))
        bends = np.zeros(nblocks + 1, np.int32)
        cum_rows = np.cumsum(bcounts)
        bends[1:] = pends[cum_rows - 1]
        pos_cols["pos_enc"] = pa.BinaryArray.from_buffers(
            pa.binary(), nblocks,
            [None, pa.py_buffer(bends.tobytes()), pa.py_buffer(pbuf)])

    out_terms = terms.take(pa.array(bstart_idx)) \
        if isinstance(terms, pa.Array) \
        else pa.array(terms[bstart_idx].tolist(), pa.string())
    return pa.table({
        "term": out_terms,
        "block_id": pa.array(block_id[bstart_idx].astype(np.uint32)),
        "first_doc_id": pa.array(doc_ids[bstart_idx]),
        "last_doc_id": pa.array(doc_ids[bend_idx]),
        "n": pa.array(bcounts.astype(np.uint32)),
        "ids_enc": ids_enc,
        "tfs_enc": tfs_enc,
        "dls_enc": dls_enc,
        "max_wdf": pa.array(max_wdf.astype(np.uint32)),
        "min_doclen": pa.array(min_dl.astype(np.uint32)),
        "sum_wdf": pa.array(sum_wdf.astype(np.uint64)),
        **pos_cols,
    })


def _empty_blocks_table(with_positions: bool = False) -> pa.Table:
    cols = {
        "term": pa.array([], pa.string()),
        "block_id": pa.array([], pa.uint32()),
        "first_doc_id": pa.array([], pa.uint64()),
        "last_doc_id": pa.array([], pa.uint64()),
        "n": pa.array([], pa.uint32()),
        "ids_enc": pa.array([], pa.binary()),
        "tfs_enc": pa.array([], pa.binary()),
        "dls_enc": pa.array([], pa.binary()),
        "max_wdf": pa.array([], pa.uint32()),
        "min_doclen": pa.array([], pa.uint32()),
        "sum_wdf": pa.array([], pa.uint64()),
    }
    if with_positions:
        cols["npos_enc"] = pa.array([], pa.binary())
        cols["pos_enc"] = pa.array([], pa.binary())
    return pa.table(cols)


def _binary_from_seg_ends(payload: np.ndarray,
                          seg_byte_ends: np.ndarray) -> pa.BinaryArray:
    """BinaryArray whose value i is payload[seg_byte_ends[i-1]:
    seg_byte_ends[i]] (zero-copy over the payload buffer)."""
    if len(seg_byte_ends):
        _check_binary_size(int(seg_byte_ends[-1]))
    offs = np.zeros(len(seg_byte_ends) + 1, np.int32)
    offs[1:] = seg_byte_ends
    return pa.BinaryArray.from_buffers(
        pa.binary(), len(seg_byte_ends),
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(payload.tobytes())])


def decode_blocks(blocks: pa.Table, codec: str = "varint"
                  ) -> tuple[np.ndarray, np.ndarray,
                             np.ndarray, np.ndarray]:
    """Decode posting-block rows (any subset, in (term, block_id) order) into
    flat (doc_ids, tfs, doclens, block_row_index) arrays. ``codec`` must
    match the index's global_stats["codec"]."""
    nb = len(blocks)
    if nb == 0:
        e = np.empty(0, np.uint64)
        return e, e.copy(), e.copy(), np.empty(0, np.int64)
    ns = blocks.column("n").to_numpy().astype(np.int64)
    firsts = blocks.column("first_doc_id").to_numpy().astype(np.uint64)

    if codec == "bitpack":
        def seg_cat(col, counts) -> np.ndarray:
            return unpack_for_blocks(
                np.frombuffer(_cat_binary(col), np.uint8), counts)

        gaps = seg_cat(blocks.column("ids_enc"), ns - 1)
        tfs = seg_cat(blocks.column("tfs_enc"), ns)
        dls = seg_cat(blocks.column("dls_enc"), ns)
    else:
        def cat(col) -> np.ndarray:
            return decode_varints(np.frombuffer(_cat_binary(col), np.uint8))

        gaps = cat(blocks.column("ids_enc"))
        tfs = cat(blocks.column("tfs_enc"))
        dls = cat(blocks.column("dls_enc"))

    m = _ctok()
    doc_ids = _ids_from_gaps(gaps, firsts, ns)

    if m is not None and hasattr(m, "repeat_arange64"):
        block_of = np.frombuffer(
            m.repeat_arange64(np.ascontiguousarray(ns, np.int64)), np.int64)
    else:
        block_of = np.repeat(np.arange(nb, dtype=np.int64), ns)
    return doc_ids, tfs, dls, block_of


def _binary_parts(col) -> tuple[np.ndarray, memoryview]:
    """(value_byte_offsets, data) of a Binary column without copying: a
    BinaryArray's values are stored contiguously in index order, so the
    concatenation of all values IS the data buffer between the first and
    last offset."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if len(arr) == 0:
        return np.zeros(1, np.int64), memoryview(b"")
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = memoryview(arr.buffers()[2])[offs[0]:offs[-1]]
    return offs - offs[0], data


def _cat_binary(col):
    """Concatenated bytes of a Binary column (zero-copy buffer slice)."""
    return _binary_parts(col)[1]


def _ids_from_gaps(gaps: np.ndarray, firsts: np.ndarray,
                   ns: np.ndarray) -> np.ndarray:
    """Absolute doc_ids from per-segment (first id, n-1 gap-1 deltas):
    segment i contributes firsts[i] then firsts[i] + cumsum(gap+1). C
    kernel when available; shared by block decode and partial-row decode."""
    m = _ctok()
    if m is not None and hasattr(m, "seg_ids64"):
        return np.frombuffer(
            m.seg_ids64(np.ascontiguousarray(gaps, np.uint64),
                        np.ascontiguousarray(firsts, np.uint64),
                        np.ascontiguousarray(ns, np.int64)), np.uint64)
    nb = len(ns)
    total = int(ns.sum())
    starts = np.zeros(nb, np.int64)
    starts[1:] = np.cumsum(ns)[:-1]
    mask = np.ones(total, bool)
    mask[starts] = False
    # segmented cumsum: within-block running sum of gap+1, zero at starts
    x = np.zeros(total, np.uint64)
    x[mask] = gaps + np.uint64(1)
    cs = np.cumsum(x, dtype=np.uint64)
    within = cs - np.repeat(cs[starts], ns)
    return np.repeat(np.ascontiguousarray(firsts, np.uint64), ns) + within


def decode_partial_group(group: pa.Table, codec: str = "varint") -> tuple:
    """Decode one shuffle group of PACKED partial posting rows
    (skey, term, n, first_id, ids_enc, tfs_enc, dls_enc
    [, npos_enc, pos_enc]) into flat arrays sorted by (term, doc_id),
    ready for :func:`encode_partition`:

        (terms:pa.Array, doc_ids, tfs, dls[, npos, pos_payloads])

    ``codec`` is the PARTIAL payload codec (IndexConfig.partial_codec).
    The merge is pure numpy: rows sort by term (Arrow), payloads decode in
    one pass, the (term, doc_id) order comes from an integer lexsort over
    (dense term rank, doc_id) — no Python string comparisons."""
    order_rows = pc.sort_indices(group, sort_keys=[("term", "ascending")])
    g = group.take(order_rows)
    seg_n = g.column("n").to_numpy().astype(np.int64)
    nrows = len(seg_n)
    total = int(seg_n.sum())
    firsts = g.column("first_id").to_numpy().astype(np.uint64)
    if codec == "bitpack":
        def _dec(col, counts):
            return unpack_for_blocks(
                np.frombuffer(_cat_binary(col), np.uint8), counts)

        gaps = _dec(g.column("ids_enc"), seg_n - 1)
        tfs = _dec(g.column("tfs_enc"), seg_n)
        dls = _dec(g.column("dls_enc"), seg_n)
    elif codec == "varint":
        def _dec(col, _counts):
            return decode_varints(
                np.frombuffer(_cat_binary(col), np.uint8))

        gaps = _dec(g.column("ids_enc"), None)
        tfs = _dec(g.column("tfs_enc"), None)
        dls = _dec(g.column("dls_enc"), None)
    else:
        raise ValueError(f"unknown partial codec {codec!r}")
    ids = _ids_from_gaps(gaps, firsts, seg_n)

    terms_col = g.column("term").combine_chunks()
    tchange = np.ones(nrows, bool)
    if nrows > 1:
        tchange[1:] = pc.not_equal(
            terms_col.slice(1), terms_col.slice(0, nrows - 1)).to_numpy(
            zero_copy_only=False)
    term_rank = np.cumsum(tchange) - 1
    term_ord = np.repeat(term_rank, seg_n)
    order = np.lexsort((ids, term_ord))

    flat_terms = terms_col.take(
        pa.array(np.repeat(np.arange(nrows), seg_n))).take(pa.array(order))
    out = [flat_terms, ids[order], tfs[order], dls[order]]

    if "npos_enc" in g.column_names:
        npos = decode_varints(np.frombuffer(
            _cat_binary(g.column("npos_enc")), np.uint8)).astype(np.int64)
        pos_bytes = np.frombuffer(_cat_binary(g.column("pos_enc")), np.uint8)
        # per-posting byte boundaries: varint terminators, then group by npos
        val_ends = np.nonzero((pos_bytes & 0x80) == 0)[0] + 1
        cum = np.cumsum(npos)
        post_ends = np.zeros(total + 1, np.int64)
        nz = cum > 0
        post_ends[1:][nz] = val_ends[cum[nz] - 1]
        np.maximum.accumulate(post_ends, out=post_ends)
        _check_binary_size(int(post_ends[-1]))
        payloads = pa.BinaryArray.from_buffers(
            pa.binary(), total,
            [None, pa.py_buffer(post_ends.astype(np.int32).tobytes()),
             pa.py_buffer(pos_bytes.tobytes())]).take(pa.array(order))
        out.append(npos[order].astype(np.uint64))
        out.append(payloads)
    return tuple(out)


def decode_positions(blocks: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Decode the positional payload of posting-block rows (same row subset /
    order as :func:`decode_blocks`). Returns ``(offsets, positions)`` where
    posting i's absolute in-document positions are
    ``positions[offsets[i]:offsets[i+1]]`` (ascending). Raises KeyError if
    the index was built without positions."""
    nb = len(blocks)
    if nb == 0:
        return np.zeros(1, np.int64), np.empty(0, np.uint64)

    def cat(col) -> np.ndarray:
        return decode_varints(np.frombuffer(_cat_binary(col), np.uint8))

    counts = cat(blocks.column("npos_enc")).astype(np.int64)
    vals = cat(blocks.column("pos_enc"))
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    if len(vals) == 0:
        return offsets, np.empty(0, np.uint64)
    return offsets, _seg_positions(vals, counts)


def _seg_positions(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Absolute positions from decoded per-posting payloads: segment i holds
    counts[i] values [first_pos, gap, gap, ...] — a segmented running sum
    (C kernel when available)."""
    if len(vals) == 0:
        return np.empty(0, np.uint64)
    from ..functions.ctok import load as _load_ctok

    ct = _load_ctok()
    seg = getattr(ct, "seg_prefix_sum64", None) if ct else None
    if seg is not None:
        return np.frombuffer(
            seg(np.ascontiguousarray(vals).data,
                np.ascontiguousarray(counts, np.int64).data), np.uint64)
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    cs = np.cumsum(vals, dtype=np.uint64)
    starts = offsets[:-1][counts > 0]
    base = cs[starts] - vals[starts]
    return cs - np.repeat(base, counts[counts > 0])

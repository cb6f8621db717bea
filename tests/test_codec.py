"""Property-based round-trip tests for the varint/delta block codec."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from markdown_query_ray.index.codec import (
    decode_blocks,
    decode_varints,
    encode_partition,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    payload, ends = encode_varints(arr)
    out = decode_varints(payload)
    assert out.tolist() == vals
    if vals:
        assert ends[-1] == len(payload)


def test_varint_known_bytes():
    payload, _ = encode_varints(np.array([0, 1, 127, 128, 300], np.uint64))
    assert payload.tobytes() == bytes([0x00, 0x01, 0x7F, 0x80, 0x01,
                                       0xAC, 0x02])


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=150, deadline=None)
def test_varint_c_numpy_parity(vals):
    """The C kernel (functions/_ctok.c varint_{en,de}code64) and the numpy
    implementation must agree byte-for-byte; skips silently to a self-check
    when the C module is unavailable (both paths then run the numpy code)."""
    from markdown_query_ray.index.codec import (
        _decode_varints_np,
        _encode_varints_np,
    )

    arr = np.array(vals, dtype=np.uint64)
    payload, ends = encode_varints(arr)  # C path when available
    if len(arr):
        p_np, e_np = _encode_varints_np(arr)
        assert np.array_equal(payload, p_np)
        assert np.array_equal(ends, e_np)
        assert np.array_equal(
            decode_varints(payload),
            _decode_varints_np(np.frombuffer(payload.tobytes(), np.uint8)))
    assert decode_varints(payload).tolist() == vals


@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=6),          # seg length
    st.integers(min_value=0, max_value=2**64 - 1)), # magnitude seed
    max_size=12))
@settings(max_examples=150, deadline=None)
def test_bitpack_c_numpy_parity(segs):
    """pack_for_blocks / unpack_for_blocks: C kernel vs numpy fallback must
    agree byte-for-byte, and round-trip exactly."""
    from markdown_query_ray.index.codec import (
        _pack_for_np,
        _unpack_for_np,
        pack_for_blocks,
        unpack_for_blocks,
    )

    counts = np.array([k for k, _ in segs], np.int64)
    vals = np.concatenate(
        [np.array([(m * (j + 1)) % (2**64) for j in range(k)], np.uint64)
         for k, m in segs] or [np.empty(0, np.uint64)])
    payload, ends = pack_for_blocks(vals, counts)
    p_np, e_np = _pack_for_np(vals, counts)
    assert np.array_equal(payload, p_np)
    assert np.array_equal(ends, e_np)
    assert np.array_equal(unpack_for_blocks(payload, counts), vals)
    assert np.array_equal(_unpack_for_np(
        np.frombuffer(payload.tobytes(), np.uint8), counts), vals)


def test_bitpack_partition_roundtrip():
    """encode_partition(codec="bitpack") must decode to the same flat
    postings as the varint encoding of the same input."""
    rng = np.random.RandomState(7)
    n = 1000
    terms = np.array(sorted(f"t{rng.randint(5)}" for _ in range(n)),
                     dtype=object)
    ids = np.sort(rng.choice(10 * n, n, replace=False).astype(np.uint64))
    # re-sort ids within each term run so (term, doc_id) holds
    start = 0
    for t in np.unique(terms):
        k = int((terms == t).sum())
        ids[start:start + k] = np.sort(ids[start:start + k])
        start += k
    tfs = rng.randint(1, 50, n).astype(np.uint64)
    dls = rng.randint(100, 5000, n).astype(np.uint64)
    bv = encode_partition(terms, ids, tfs, dls, block_size=16,
                          codec="varint")
    bb = encode_partition(terms, ids, tfs, dls, block_size=16,
                          codec="bitpack")
    # identical block metadata, different payloads
    for col in ["term", "block_id", "first_doc_id", "last_doc_id", "n",
                "max_wdf", "min_doclen", "sum_wdf"]:
        assert bv.column(col).equals(bb.column(col)), col
    dv = decode_blocks(bv, codec="varint")
    db = decode_blocks(bb, codec="bitpack")
    for a, b in zip(dv, db):
        assert np.array_equal(a, b)


def _roundtrip(terms, ids, tfs, dls, block_size):
    t = np.array(terms, dtype=object)
    blocks = encode_partition(t, np.array(ids, np.uint64),
                              np.array(tfs, np.uint64),
                              np.array(dls, np.uint64),
                              block_size=block_size)
    d_ids, d_tfs, d_dls, block_of = decode_blocks(blocks)
    assert d_ids.tolist() == list(ids)
    assert d_tfs.tolist() == list(tfs)
    assert d_dls.tolist() == list(dls)
    # block-level metadata
    bt = blocks.to_pydict()
    for b in range(len(blocks)):
        sel = block_of == b
        assert bt["first_doc_id"][b] == d_ids[sel][0]
        assert bt["last_doc_id"][b] == d_ids[sel][-1]
        assert bt["n"][b] == sel.sum()
        assert bt["max_wdf"][b] == d_tfs[sel].max()
        assert bt["min_doclen"][b] == d_dls[sel].min()
        assert bt["sum_wdf"][b] == d_tfs[sel].sum()
    return blocks


def test_single_term_multi_block():
    n = 300
    ids = np.cumsum(np.arange(n) % 7 + 1)
    blocks = _roundtrip(["t"] * n, ids, (np.arange(n) % 5 + 1),
                        (np.arange(n) % 90 + 10), block_size=128)
    assert blocks.column("term").to_pylist() == ["t", "t", "t"]
    assert blocks.column("block_id").to_pylist() == [0, 1, 2]
    assert blocks.column("n").to_pylist() == [128, 128, 44]


def test_multi_term_partition():
    terms = ["alpha"] * 5 + ["beta"] * 1 + ["gamma"] * 130
    ids = list(range(10, 15)) + [3] + list(range(1000, 1130))
    tfs = [1, 2, 3, 4, 5] + [9] + [1] * 130
    dls = [50] * 5 + [20] + [70] * 130
    blocks = _roundtrip(terms, ids, tfs, dls, block_size=128)
    assert blocks.column("term").to_pylist() == ["alpha", "beta", "gamma",
                                                "gamma"]


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_random_partitions(data):
    n_terms = data.draw(st.integers(1, 5))
    terms, ids, tfs, dls = [], [], [], []
    for ti in range(n_terms):
        n_docs = data.draw(st.integers(1, 40))
        docs = sorted(data.draw(st.sets(
            st.integers(0, 10**12), min_size=n_docs, max_size=n_docs)))
        for d in docs:
            terms.append(f"term{ti:03d}")
            ids.append(d)
            tfs.append(data.draw(st.integers(1, 1000)))
            dls.append(data.draw(st.integers(1, 10**6)))
    _roundtrip(terms, ids, tfs, dls,
               block_size=data.draw(st.sampled_from([4, 16, 128])))


def test_empty_partition():
    blocks = encode_partition(np.array([], dtype=object),
                              np.array([], np.uint64),
                              np.array([], np.uint64),
                              np.array([], np.uint64))
    assert len(blocks) == 0
    d_ids, d_tfs, d_dls, block_of = decode_blocks(blocks)
    assert len(d_ids) == 0


def test_blocks_table_schema_stable():
    blocks = _roundtrip(["x"], [7], [3], [11], 128)
    assert blocks.schema.names == [
        "term", "block_id", "first_doc_id", "last_doc_id", "n",
        "ids_enc", "tfs_enc", "dls_enc", "max_wdf", "min_doclen", "sum_wdf"]


def test_seg_prefix_sum_kernel_matches_numpy():
    """The fused C positional reconstruction must equal the numpy segmented
    cumsum for random segment layouts (incl. empty segments)."""
    import numpy as np

    from markdown_query_ray.functions.ctok import load as load_ctok

    ct = load_ctok()
    if ct is None or not hasattr(ct, "seg_prefix_sum64"):
        import pytest

        pytest.skip("C kernels unavailable")
    rng = np.random.Generator(np.random.PCG64(21))
    for _ in range(50):
        nseg = int(rng.integers(0, 40))
        counts = rng.integers(0, 7, size=nseg).astype(np.int64)
        vals = rng.integers(0, 1 << 40, size=int(counts.sum())).astype(
            np.uint64)
        got = np.frombuffer(
            ct.seg_prefix_sum64(np.ascontiguousarray(vals).data,
                                np.ascontiguousarray(counts).data),
            np.uint64)
        # numpy reference
        offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        if len(vals) == 0:
            assert len(got) == 0
            continue
        cs = np.cumsum(vals, dtype=np.uint64)
        starts = offsets[:-1][counts > 0]
        base = cs[starts] - vals[starts]
        want = cs - np.repeat(base, counts[counts > 0])
        assert np.array_equal(got, want)

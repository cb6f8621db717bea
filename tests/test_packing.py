"""Sequence-packing scan vs a single-process brute force."""

import numpy as np
import pyarrow as pa
import pytest

from markdown_query_ray.pipelines.packing import pack_sequences


def _brute(texts, seq_len):
    rows, off = [], 0
    for i, t in enumerate(texts):
        n = len([x for x in t.split(" ") if x])
        if n == 0:
            rows.append((i, 0, off, -1, -1, 0))
        else:
            first = off // seq_len
            last = (off + n - 1) // seq_len
            rows.append((i, n, off, first, last, last - first + 1))
        off += n
    return rows


def _run(texts, seq_len, range_size, nparts=4):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(nparts)
    out = pack_sequences(ds, seq_len=seq_len, range_size=range_size) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return [tuple(int(x) for x in r) for r in
            out[["doc_id", "n_tokens", "start_tok", "first_seq",
                 "last_seq", "n_seqs"]].itertuples(index=False)]


TEXTS = ["a b c d e", "", "f g", "h " * 20, "i", "j k l m n o p q",
         "", "r s t"]


def test_matches_brute_force(ray_session):
    assert _run(TEXTS, seq_len=4, range_size=3) == _brute(TEXTS, 4)


def test_bucket_size_invariance(ray_session):
    exp = _brute(TEXTS, 5)
    for rs in (1, 2, 7, 1 << 20):
        assert _run(TEXTS, 5, rs) == exp


def test_parallelism_invariance(ray_session):
    exp = _brute(TEXTS, 3)
    assert _run(TEXTS, 3, 2, nparts=1) == exp
    assert _run(TEXTS, 3, 2, nparts=8) == exp


def test_long_doc_spans_many_seqs(ray_session):
    texts = ["w " * 100, "x y"]
    got = _run(texts, seq_len=8, range_size=4)
    assert got == _brute(texts, 8)
    # 100 tokens / 8 per seq -> 13 sequences
    assert got[0][5] == 13


def test_total_tokens_consistent(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join("t%d" % rng.integers(50)
                      for _ in range(int(rng.integers(0, 40))))
             for _ in range(200)]
    got = _run(texts, seq_len=16, range_size=32)
    assert got == _brute(texts, 16)
    # offsets are the exclusive prefix sum of counts
    starts = [r[2] for r in got]
    counts = [r[1] for r in got]
    assert starts == list(np.concatenate(
        ([0], np.cumsum(counts)[:-1])).astype(int))

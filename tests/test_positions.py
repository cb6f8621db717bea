"""Positional index: codec roundtrip, tokenize-stage packing, and true
OP_PHRASE / OP_NEAR evaluation vs a per-doc token-stream oracle
(matcher/phrasepostlist.cc, nearpostlist.cc semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from markdown_query_ray.config import BM25Params, IndexConfig, QueryConfig
from markdown_query_ray.functions.xapian_tokenizer import tokenize
from markdown_query_ray.index.codec import (
    decode_blocks,
    decode_positions,
    encode_partition,
    encode_varints,
)
from markdown_query_ray.query.ast import And, Phrase, Term


def _pack(plist: list[int]) -> bytes:
    deltas = [plist[0]] + [b - a for a, b in zip(plist, plist[1:])]
    payload, _ = encode_varints(np.asarray(deltas, np.uint64))
    return payload.tobytes()


def test_codec_positions_roundtrip():
    terms = np.asarray(["a", "a", "a", "b", "b"], dtype=object)
    doc_ids = np.asarray([1, 5, 9, 2, 5], np.uint64)
    tfs = np.asarray([2, 1, 3, 1, 2], np.uint64)
    dls = np.asarray([10, 11, 12, 13, 11], np.uint64)
    plists = [[1, 4], [7], [2, 5, 9], [], [3, 4]]  # [] = stem-like, no pos
    npos = np.asarray([len(p) for p in plists], np.uint64)
    payloads = np.asarray([_pack(p) if p else b"" for p in plists],
                          dtype=object)
    blocks = encode_partition(terms, doc_ids, tfs, dls, block_size=2,
                              npos=npos, pos_payloads=payloads)
    assert "npos_enc" in blocks.column_names
    ids, dtfs, ddls, _ = decode_blocks(blocks)
    off, pos = decode_positions(blocks)
    assert ids.tolist() == doc_ids.tolist()
    assert dtfs.tolist() == tfs.tolist()
    got = [pos[off[i]:off[i + 1]].tolist() for i in range(len(doc_ids))]
    assert got == plists


def test_codec_positions_multi_block_boundary():
    n = 300
    rng = np.random.default_rng(3)
    terms = np.asarray(["t"] * n, dtype=object)
    doc_ids = np.arange(n, dtype=np.uint64) * 3
    tfs = np.ones(n, np.uint64)
    dls = np.full(n, 50, np.uint64)
    plists = [sorted(rng.choice(200, size=rng.integers(1, 5),
                                replace=False) + 1) for _ in range(n)]
    npos = np.asarray([len(p) for p in plists], np.uint64)
    payloads = np.asarray([_pack([int(x) for x in p]) for p in plists],
                          dtype=object)
    blocks = encode_partition(terms, doc_ids, tfs, dls, block_size=128,
                              npos=npos, pos_payloads=payloads)
    assert len(blocks) == 3
    off, pos = decode_positions(blocks)
    for i in range(n):
        assert pos[off[i]:off[i + 1]].tolist() == [int(x) for x in plists[i]]


@pytest.fixture(scope="session")
def pos_index(ray_session, pages_corpus, tmp_path_factory):
    """Positional index over the shared corpus."""
    from markdown_query_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("posidx") / "idx")
    cfg = IndexConfig(num_term_parts=4, num_doc_buckets=2, block_size=32,
                      positions=True)
    gstats = build_index(out, paths=pages_corpus, cfg=cfg)
    assert gstats["positions"] is True
    return out, cfg


@pytest.fixture(scope="session")
def token_streams(pages_corpus):
    """doc_id -> token list, via the same extraction+tokenizer the build
    uses (the phrase-match oracle input)."""
    from markdown_query_ray.stages.extract import extract_text

    streams = {}
    doc_id = 0
    for path in sorted(pages_corpus):
        for row in pq.read_table(path).to_pylist():
            streams[doc_id] = tokenize(extract_text(row["html"]))
            doc_id += 1
    return streams


def _oracle_phrase_docs(streams, terms: list[str]) -> set[int]:
    m = len(terms)
    out = set()
    for doc, toks in streams.items():
        for i in range(len(toks) - m + 1):
            if toks[i:i + m] == terms:
                out.add(doc)
                break
    return out


def _oracle_near_docs(streams, terms: list[str], window: int) -> set[int]:
    import itertools

    out = set()
    for doc, toks in streams.items():
        slots = [[i + 1 for i, x in enumerate(toks) if x == t]
                 for t in terms]
        if any(not v for v in slots):
            continue
        for combo in itertools.product(*slots):
            if len(set(combo)) == len(combo) \
                    and max(combo) - min(combo) <= window - 1:
                out.add(doc)
                break
    return out


def _bigrams(streams, min_df: int = 2, limit: int = 5):
    """A few adjacent token pairs that actually occur in >=min_df docs."""
    from collections import Counter

    c: Counter = Counter()
    for toks in streams.values():
        for pair in set(zip(toks, toks[1:])):
            c[pair] += 1
    pairs = [p for p, n in c.most_common() if n >= min_df]
    return pairs[:limit]


def test_phrase_matches_token_stream_oracle(pos_index, token_streams):
    from markdown_query_ray.query import executor as qx

    idx, _ = pos_index
    pairs = _bigrams(token_streams)
    assert pairs, "fixture corpus has no repeated bigrams?"
    qcfg = QueryConfig(k=1000, params=BM25Params.xapian())
    for a, b in pairs:
        want = _oracle_phrase_docs(token_streams, [a, b])
        node = Phrase((a, b), window=2)
        got = qx.search(idx, node, qcfg, distributed=False)
        assert set(got.column("doc_id").to_pylist()) == want, (a, b)


def test_phrase_is_subset_of_and(pos_index, token_streams):
    from markdown_query_ray.query import executor as qx

    idx, _ = pos_index
    (a, b) = _bigrams(token_streams)[0]
    qcfg = QueryConfig(k=1000, params=BM25Params.xapian())
    phrase = qx.search(idx, Phrase((a, b), window=2), qcfg,
                       distributed=False)
    conj = qx.search(idx, And((Term(a), Term(b))), qcfg, distributed=False)
    pd_ = dict(zip(phrase.column("doc_id").to_pylist(),
                   phrase.column("score").to_pylist()))
    ad = dict(zip(conj.column("doc_id").to_pylist(),
                  conj.column("score").to_pylist()))
    assert set(pd_) <= set(ad)
    for doc, s in pd_.items():  # phrase scores = AND scores on survivors
        assert s == pytest.approx(ad[doc], abs=1e-12)


def test_near_unordered_window(pos_index, token_streams):
    from markdown_query_ray.query import executor as qx

    idx, _ = pos_index
    (a, b) = _bigrams(token_streams)[0]
    qcfg = QueryConfig(k=1000, params=BM25Params.xapian())
    for window in (2, 5):
        want = _oracle_near_docs(token_streams, [a, b], window)
        got = qx.search(idx, Phrase((a, b), window=window, ordered=False),
                        qcfg, distributed=False)
        assert set(got.column("doc_id").to_pylist()) == want, window
    # NEAR is a superset of PHRASE at the same window
    ph = _oracle_phrase_docs(token_streams, [a, b])
    assert ph <= _oracle_near_docs(token_streams, [a, b], 2)


def test_reversed_phrase_vs_near(pos_index, token_streams):
    """Ordered matters: 'b a' phrase != 'a b' phrase, while NEAR(a,b) =
    NEAR(b,a)."""
    from markdown_query_ray.query import executor as qx

    idx, _ = pos_index
    (a, b) = _bigrams(token_streams)[0]
    qcfg = QueryConfig(k=1000, params=BM25Params.xapian())
    rev = qx.search(idx, Phrase((b, a), window=2), qcfg, distributed=False)
    want = _oracle_phrase_docs(token_streams, [b, a])
    assert set(rev.column("doc_id").to_pylist()) == want
    n1 = qx.search(idx, Phrase((a, b), window=3, ordered=False), qcfg,
                   distributed=False)
    n2 = qx.search(idx, Phrase((b, a), window=3, ordered=False), qcfg,
                   distributed=False)
    assert (set(n1.column("doc_id").to_pylist())
            == set(n2.column("doc_id").to_pylist()))


def test_compiler_builds_phrase_nodes():
    from markdown_query_ray.query.compiler import parse_user_query

    node = parse_user_query("merge PHRASE sort")
    assert isinstance(node, Phrase) and node.ordered
    assert node.terms == ("merge", "sort") and node.window == 2
    node = parse_user_query("merge NEAR sort")
    assert isinstance(node, Phrase) and not node.ordered
    node = parse_user_query('"fast merge" PHRASE sort')
    assert isinstance(node, Phrase)
    assert node.terms == ("fast", "merge", "sort") and node.window == 3
    # non-term side degrades to AND
    node = parse_user_query("merge AND sort PHRASE window")
    assert isinstance(node, (And,))


def test_positionless_index_falls_back_to_and(built_index):
    from markdown_query_ray.query import executor as qx

    idx, _, _ = built_index
    qcfg = QueryConfig(k=1000, params=BM25Params.xapian())
    ph = qx.search(idx, Phrase(("merge", "sort"), window=2), qcfg,
                   distributed=False)
    conj = qx.search(idx, And((Term("merge"), Term("sort"))), qcfg,
                     distributed=False)
    assert ph.column("doc_id").to_pylist() == conj.column("doc_id").to_pylist()


def test_tokenize_stage_position_payloads():
    from markdown_query_ray.index.codec import decode_varints
    from markdown_query_ray.stages.tokenize import TokenizeStage

    cfg = IndexConfig(positions=True)
    stage = TokenizeStage(cfg)
    batch = pa.table({
        "doc_id": pa.array([0], pa.uint64()),
        "url": pa.array(["u"]),
        "text": pa.array(["the cat sat on the mat"]),
    })
    out = stage(batch)
    terms = out.column("terms")[0].as_py()
    npos = out.column("npos")[0].as_py()
    poss = out.column("poss")[0].as_py()
    toks = tokenize("the cat sat on the mat")
    for t, n, payload in zip(terms, npos, poss):
        if t.startswith("Z"):
            assert n == 0 and payload == b""
            continue
        want = [i + 1 for i, x in enumerate(toks) if x == t]
        assert n == len(want)
        deltas = decode_varints(np.frombuffer(payload, np.uint8))
        got = np.cumsum(deltas).tolist()
        assert got == want

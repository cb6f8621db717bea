"""Property-based check of PHRASE/NEAR semantics: for random tiny corpora
and random window queries, the positional evaluator must agree with a
brute-force scan over the raw token streams. Runs fully in-process against
the codec + evaluator (no Ray session needed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from markdown_query_ray.index.codec import encode_partition, encode_varints
from markdown_query_ray.query.executor import (
    Postings,
    _ordered_within,
    _ordered_within_many,
    _unordered_within,
    _unordered_within_many,
)

VOCAB = ["a", "b", "c", "d"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1, max_size=8)


def _brute_ordered(toks: list[str], terms: list[str], window: int) -> bool:
    def rec(ti: int, prev_pos: int, start: int) -> bool:
        if ti == len(terms):
            return True
        for p, t in enumerate(toks, start=1):
            if t == terms[ti] and p > prev_pos:
                if ti == 0:
                    if rec(1, p, p):
                        return True
                elif p - start <= window - 1 and rec(ti + 1, p, start):
                    return True
                elif p - start > window - 1:
                    continue
        return False

    return rec(0, 0, 0)


def _brute_unordered(toks: list[str], terms: list[str], window: int) -> bool:
    # one candidate list PER SLOT (duplicate terms need distinct positions,
    # matching the real engine: "wet NEAR wet" wants two occurrences)
    slots = [[i + 1 for i, x in enumerate(toks) if x == t] for t in terms]
    if any(not v for v in slots):
        return False
    import itertools

    for combo in itertools.product(*slots):
        if len(set(combo)) == len(combo) \
                and max(combo) - min(combo) <= window - 1:
            return True
    return False


def _plists(toks: list[str], terms: list[str]):
    out = []
    for t in terms:
        pl = np.asarray([i + 1 for i, x in enumerate(toks) if x == t],
                        np.uint64)
        if len(pl) == 0:
            return None
        out.append(pl)
    return out


@settings(max_examples=300, deadline=None)
@given(docs=docs_strategy,
       terms=st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3),
       window=st.integers(min_value=2, max_value=6))
def test_window_checks_match_bruteforce(docs, terms, window):
    window = max(window, len(terms))
    for toks in docs:
        pl = _plists(toks, terms)
        if pl is None:
            continue
        assert _ordered_within(pl, window) == \
            _brute_ordered(toks, terms, window), (toks, terms, window)
        assert _unordered_within(pl, window) == \
            _brute_unordered(toks, terms, window), (toks, terms, window)


def _fake_postings(per_doc_positions: list[np.ndarray]) -> Postings:
    """Postings over docs 0..n-1 with the given per-doc position arrays."""
    n = len(per_doc_positions)
    off = np.zeros(n + 1, np.int64)
    off[1:] = np.cumsum([len(p) for p in per_doc_positions])
    vals = (np.concatenate(per_doc_positions).astype(np.uint64)
            if n else np.empty(0, np.uint64))
    ids = np.arange(n, dtype=np.uint64)
    return Postings(ids, np.ones(n, np.uint64), np.ones(n, np.uint64),
                    pos_off=off, pos_vals=vals)


@settings(max_examples=300, deadline=None)
@given(docs=docs_strategy,
       terms=st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3),
       window=st.integers(min_value=2, max_value=6))
def test_vectorized_window_checks_match_scalar(docs, terms, window):
    """The many-doc vectorized verification must agree doc-for-doc with the
    scalar spec (which itself matches brute force above), including
    duplicate slots sharing one Postings object — the evaluator's cache
    hands "wet NEAR wet" the same object twice."""
    window = max(window, len(terms))
    # keep only docs where every term occurs (the evaluator checks the
    # window only on the AND intersection)
    cand = [toks for toks in docs
            if all(any(x == t for x in toks) for t in terms)]
    if not cand:
        return
    per_term: dict[str, Postings] = {
        t: _fake_postings([
            np.asarray([i + 1 for i, x in enumerate(toks) if x == t],
                       np.uint64) for toks in cand])
        for t in set(terms)}
    plists = [per_term[t] for t in terms]
    idxs = [np.arange(len(cand), dtype=np.int64) for _ in terms]
    got_o = _ordered_within_many(plists, idxs, window)
    got_u = _unordered_within_many(plists, idxs, window)
    for j, toks in enumerate(cand):
        pl = _plists(toks, terms)
        assert got_o[j] == _ordered_within(pl, window), (toks, terms, window)
        assert got_u[j] == _unordered_within(pl, window), (toks, terms,
                                                           window)


@settings(max_examples=100, deadline=None)
@given(docs=docs_strategy)
def test_positional_codec_roundtrip_random(docs):
    """Random corpora survive the full encode/decode with positions."""
    from markdown_query_ray.index.codec import decode_blocks, decode_positions

    rows = []  # (term, doc_id, tf, dl, positions)
    for doc_id, toks in enumerate(docs):
        dl = len(toks)
        pos_map: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            pos_map.setdefault(t, []).append(i + 1)
        for t in sorted(pos_map):
            rows.append((t, doc_id, len(pos_map[t]), dl, pos_map[t]))
    rows.sort(key=lambda r: (r[0], r[1]))
    if not rows:
        return
    terms = np.asarray([r[0] for r in rows], dtype=object)
    ids = np.asarray([r[1] for r in rows], np.uint64)
    tfs = np.asarray([r[2] for r in rows], np.uint64)
    dls = np.asarray([max(r[3], 1) for r in rows], np.uint64)

    def pack(plist):
        deltas = [plist[0]] + [b - a for a, b in zip(plist, plist[1:])]
        payload, _ = encode_varints(np.asarray(deltas, np.uint64))
        return payload.tobytes()

    npos = np.asarray([len(r[4]) for r in rows], np.uint64)
    payloads = np.asarray([pack(r[4]) for r in rows], dtype=object)
    blocks = encode_partition(terms, ids, tfs, dls, block_size=3,
                              npos=npos, pos_payloads=payloads)
    dids, dtfs, ddls, _ = decode_blocks(blocks)
    off, pos = decode_positions(blocks)
    assert dids.tolist() == ids.tolist()
    for i, r in enumerate(rows):
        assert pos[off[i]:off[i + 1]].tolist() == r[4]

"""Exact n-gram Jaccard self-join (AllPairs/PPJoin prefix filter).

The operator claims EXACTNESS (below the star cap): its output must equal
brute-force all-pairs shingle Jaccard on any input, at any threshold —
including thresholds where MinHash banding would not be recall-complete.
"""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def _corpus(n_docs: int, seed: int, vocab_n: int = 40) -> list[str]:
    """Random short docs with deliberate near-dup structure: every 5th doc
    is a 1-token mutation of a recent doc."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"w{i}" for i in range(vocab_n)]
    texts: list[str] = []
    for i in range(n_docs):
        if i % 5 == 0 and i > 0:
            base = texts[i - int(rng.integers(1, 5))].split(" ")
            base[int(rng.integers(0, len(base)))] = \
                vocab[int(rng.integers(0, vocab_n))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(
                vocab, size=int(rng.integers(3, 25))).tolist()))
    return texts


def _brute_pairs(texts: list[str], thr: float, w: int = 3) -> set:
    from markdown_query_ray.pipelines.dedup import jaccard

    return {(a, b) for a, b in itertools.combinations(range(len(texts)), 2)
            if jaccard(texts[a], texts[b], w) >= thr}


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


@pytest.mark.parametrize("thr", [0.2, 0.35, 0.5, 0.8])
def test_exact_vs_bruteforce(ray_session, thr):
    from markdown_query_ray.pipelines.dedup import ngram_jaccard_pairs

    texts = _corpus(250, seed=thr.__hash__() % 1000)
    got = ngram_jaccard_pairs(_ds(texts), threshold=thr, w=3, head_k=16)
    gp = set(zip(got.column("doc_a").to_pylist(),
                 got.column("doc_b").to_pylist()))
    assert gp == _brute_pairs(texts, thr)


def test_jaccard_values_and_order(ray_session):
    from markdown_query_ray.pipelines.dedup import jaccard, \
        ngram_jaccard_pairs

    texts = _corpus(200, seed=7)
    got = ngram_jaccard_pairs(_ds(texts), threshold=0.4, w=3)
    a = got.column("doc_a").to_pylist()
    b = got.column("doc_b").to_pylist()
    j = got.column("jaccard").to_pylist()
    assert list(zip(a, b)) == sorted(zip(a, b))
    for da, db, dj in zip(a, b, j):
        assert da < db
        assert dj == pytest.approx(jaccard(texts[da], texts[db], 3))
        assert dj >= 0.4


def test_head_size_does_not_change_output(ray_session):
    """The df head only ORDERS shingles; any head (even empty: pure hash
    order) must yield the identical verified pair set."""
    from markdown_query_ray.pipelines.dedup import ngram_jaccard_pairs

    texts = _corpus(150, seed=11)
    outs = []
    for head_k in (1, 64, 1 << 16):
        t = ngram_jaccard_pairs(_ds(texts), threshold=0.3, w=3,
                                head_k=head_k)
        outs.append(set(zip(t.column("doc_a").to_pylist(),
                            t.column("doc_b").to_pylist())))
    assert outs[0] == outs[1] == outs[2]


def test_identical_and_empty_docs(ray_session):
    """Duplicate texts pair at J=1.0; empty docs have no shingles and never
    pair (matching the SQL oracle, where an empty shingle set drops out)."""
    from markdown_query_ray.pipelines.dedup import ngram_jaccard_pairs

    texts = ["a b c d e", "a b c d e", "", "", "x y z"]
    got = ngram_jaccard_pairs(_ds(texts), threshold=0.5, w=3)
    assert got.column("doc_a").to_pylist() == [0]
    assert got.column("doc_b").to_pylist() == [1]
    assert got.column("jaccard").to_pylist() == [1.0]


def test_short_doc_whole_shingle(ray_session):
    """Docs under w tokens carry one whole-doc shingle (shingle_hashes
    semantics) — two identical 2-token docs must pair."""
    from markdown_query_ray.pipelines.dedup import ngram_jaccard_pairs

    texts = ["hi there", "hi there", "hi where"]
    got = ngram_jaccard_pairs(_ds(texts), threshold=0.9, w=3)
    assert (got.column("doc_a").to_pylist(),
            got.column("doc_b").to_pylist()) == ([0], [1])


def test_repetition_signals_handcrafted(ray_session):
    from markdown_query_ray.pipelines.textstats import repetition_batch

    texts = [
        "a b a b a b",          # "a b" x3 overlapping windows
        "x",                    # too short for any n-gram
        "",                     # empty
        "one two three four five one two three four five",
    ]
    t = repetition_batch(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
    }))
    d = t.to_pydict()
    # doc 0: 2-gram windows: "a b","b a","a b","b a","a b" -> top "a b" x3,
    # chars 3 -> cov 9; 3-gram top x2 ("a b a"), chars 5 -> 10;
    # 5-gram "a b a b a"/"b a b a b" both once -> dup cov 0
    assert d["top2gram_cov"][0] == 9
    assert d["top3gram_cov"][0] == 10
    assert d["dup5gram_cov"][0] == 0
    assert d["top2gram_cov"][1] == 0 and d["n_chars"][1] == 1
    assert d["n_chars"][2] == 0
    # doc 3: "one two three four five" x2 as 5-gram (23 chars) -> 46
    assert d["dup5gram_cov"][3] == 46


def test_prefix_emit_empty_batch_schema_matches():
    """A batch of only empty/whitespace texts must emit the SAME 5-column
    schema as a productive batch (incl. 'pos'), or downstream groupby
    blocks fail to unify."""
    from markdown_query_ray.pipelines.dedup import PrefixEmitStage

    stage = PrefixEmitStage(0.5, 3, head_ref=None)
    stage._hot = (np.array([], np.int64), np.array([], np.int64))
    empty = stage(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", "  "]),
    }))
    full = stage(pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon"]),
    }))
    assert empty.schema.equals(full.schema)
    assert len(empty) == 0 and len(full) > 0

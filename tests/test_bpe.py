"""Trained byte-level BPE (pipelines/bpe.py).

No SQL oracle (data-dependently iterative merge loop — see the module
docstring); correctness is pinned here instead:
  1. incremental trainer == naive full-recount reference trainer
     (random corpora, several seeds and min_freqs);
  2. a known-by-hand fixture;
  3. round-trip byte identity decode(encode(text)) == text;
  4. training is parallelism-invariant;
  5. the distributed actor-pool encode == the sequential driver encode
     for every document;
  6. training-set words re-encode to their training end-state
     (the greedy-rewrite consistency property).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
import ray.data

from markdown_query_ray.pipelines.bpe import (
    BpeModel,
    bpe_encode,
    bpe_train,
    bpe_word_counts,
    pretoken_lists,
    train_merges,
    train_merges_reference,
)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest",
    "new newer newest",
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "it's the cat's mat, isn't it?",
    "2026-08-20 12:34  numbers 42 and 9000",
    "",
    "répétition déjà-vu — naïve façade",
    "中文分词测试 日本語のテスト",
]


def _docs(texts, parts=3):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(t).repartition(parts)


def _rand_words(seed, n=40):
    rng = random.Random(seed)
    alpha = "abcdefgh"
    words = []
    for _ in range(n):
        w = "".join(rng.choice(alpha)
                    for _ in range(rng.randint(1, 8))).encode()
        words.append(w)
    freqs = [rng.randint(1, 50) for _ in words]
    return words, freqs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("min_freq", [1, 2, 5])
def test_trainer_matches_reference(seed, min_freq):
    words, freqs = _rand_words(seed)
    got = train_merges(words, freqs, 64, min_freq=min_freq)
    want = train_merges_reference(words, freqs, 64, min_freq=min_freq)
    assert got == want


def test_known_fixture():
    # "aaab" x5: pair (a,a) count 10 beats (a,b) count 5; greedy
    # left-to-right rewrite gives [X, a, b], so (X,a) and (a,b) tie at
    # 5 and the ASC pair order picks (a,b)=(97,98); the word becomes
    # [X, Y] and the third merge is (X,Y)=(256,257).
    a, b = ord("a"), ord("b")
    merges = train_merges([b"aaab"], [5], 3, min_freq=1)
    assert merges[0] == (a, a)
    assert merges[1] == (a, b)
    assert merges[2] == (256, 257)


def test_pretoken_lists_tile_exactly():
    texts = ["Hello  world, it's 42!", "", "a\tb\nc", "ünï 中文"]
    col = pa.chunked_array([pa.array(texts)])
    lists = pretoken_lists(col).combine_chunks().to_pylist()
    for text, toks in zip(texts, lists):
        assert "".join(toks) == text  # matches tile the string


def test_roundtrip_and_consistency(ray_session):
    ds = _docs(CORPUS * 10)
    model = bpe_train(ds, n_merges=80, top_words=4096, min_freq=2)
    assert len(model.merges) > 10
    for text in CORPUS:
        assert model.decode(model.encode(text)) == text
    # training-set words re-encode to their training end-state: encoding
    # any training word yields ids whose expansions concatenate to it
    # and which cannot be merged further by any learned rule
    ranks = model.ranks
    for w in ["the", " lowest", " cat's"]:
        ids = model.encode_word(w.encode())
        assert b"".join(model.vocab[i] for i in ids) == w.encode()
        assert not any((x, y) in ranks for x, y in zip(ids, ids[1:]))


def test_parallelism_invariant(ray_session):
    m1 = bpe_train(_docs(CORPUS * 6, parts=2), n_merges=48, min_freq=2)
    m2 = bpe_train(_docs(CORPUS * 6, parts=11), n_merges=48, min_freq=2)
    assert m1.merges == m2.merges


def test_distributed_encode_matches_driver(ray_session):
    texts = CORPUS * 8
    ds = _docs(texts, parts=4)
    model = bpe_train(ds, n_merges=64, min_freq=2)
    out = bpe_encode(ds, model, concurrency=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(texts)
    for _, row in out.iterrows():
        want = model.encode(texts[int(row["doc_id"])])
        assert list(row["token_ids"]) == want
        assert int(row["n_tokens"]) == len(want)


def test_top_words_cap_logs_and_still_encodes(ray_session, caplog):
    import logging

    ds = _docs(CORPUS * 4)
    with caplog.at_level(logging.WARNING,
                         logger="markdown_query_ray.pipelines.bpe"):
        model = bpe_train(ds, n_merges=32, top_words=10, min_freq=1)
    assert any("capped" in r.message for r in caplog.records)
    # tail words still byte-fallback encode and round-trip
    assert model.decode(model.encode("liquor jugs façade")) == \
        "liquor jugs façade"


def test_word_counts_exact(ray_session):
    texts = ["a b a", "a b", ""]
    wc = bpe_word_counts(_docs(texts, parts=2)).to_pandas()
    got = dict(zip(wc["word"], wc["freq"]))
    assert got == {"a": 2, " b": 2, " a": 1}


def test_model_persistence_roundtrip():
    words, freqs = _rand_words(7)
    m = BpeModel(train_merges(words, freqs, 32, min_freq=1))
    m2 = BpeModel.from_table(m.to_table())
    assert m2.merges == m.merges and m2.vocab == m.vocab


def test_nul_guard():
    col = pa.chunked_array([pa.array(["a\x00b c"])])
    toks = pretoken_lists(col).combine_chunks().to_pylist()[0]
    assert "".join(toks) == "ab c"  # NUL stripped, rest tiled


# ---------------------------------------------------------------------------
# bpe_pack_shards: corpus -> packed fixed-length training shards
# ---------------------------------------------------------------------------

def _expected_stream(model, texts):
    import numpy as np

    out = []
    for t in texts:  # doc_id order == list order in _docs
        out.extend(model.encode(t))
    return np.asarray(out, np.int32)


def _read_shards(manifest):
    import numpy as np
    import pyarrow.parquet as pq_

    seqs = []
    for path in manifest.column("path").to_pylist():
        t = pq_.read_table(path)
        for row in t.column("token_ids").to_pylist():
            seqs.append(np.asarray(row, np.int32))
    return seqs


def test_pack_shards_reconstructs_stream(ray_session, tmp_path):
    import numpy as np

    from markdown_query_ray.pipelines.bpe import bpe_pack_shards

    texts = CORPUS * 12
    ds = _docs(texts, parts=5)
    model = bpe_train(ds, n_merges=64, min_freq=2)
    L = 37
    man = bpe_pack_shards(ds, model, str(tmp_path / "shards"),
                          seq_len=L, seqs_per_shard=7,
                          range_size=16, concurrency=2)
    want = _expected_stream(model, texts)
    n_seqs = len(want) // L
    assert int(sum(man.column("n_seqs").to_pylist())) == n_seqs
    seqs = _read_shards(man)
    assert all(len(s) == L for s in seqs)
    got = np.concatenate(seqs) if seqs else np.empty(0, np.int32)
    assert np.array_equal(got, want[:n_seqs * L])  # tail dropped


def test_pack_shards_parallelism_invariant(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from markdown_query_ray.pipelines.bpe import bpe_pack_shards

    texts = CORPUS * 6
    model = bpe_train(_docs(texts, parts=3), n_merges=48, min_freq=2)
    m1 = bpe_pack_shards(_docs(texts, parts=2), model,
                         str(tmp_path / "s1"), seq_len=29,
                         seqs_per_shard=5, range_size=8, concurrency=2)
    m2 = bpe_pack_shards(_docs(texts, parts=9), model,
                         str(tmp_path / "s2"), seq_len=29,
                         seqs_per_shard=5, range_size=32, concurrency=2)
    assert m1.column("n_seqs").to_pylist() == m2.column("n_seqs").to_pylist()
    for p1, p2 in zip(m1.column("path").to_pylist(),
                      m2.column("path").to_pylist()):
        assert pq_.read_table(p1).equals(pq_.read_table(p2))


def test_pack_shards_empty_and_tiny(ray_session, tmp_path):
    from markdown_query_ray.pipelines.bpe import bpe_pack_shards

    model = bpe_train(_docs(CORPUS, parts=2), n_merges=16, min_freq=2)
    # total tokens < seq_len -> zero sequences, empty manifest
    man = bpe_pack_shards(_docs(["one two", ""], parts=1), model,
                          str(tmp_path / "tiny"), seq_len=10_000,
                          concurrency=1)
    assert man.num_rows == 0 or \
        sum(man.column("n_seqs").to_pylist()) == 0


def test_pack_shards_custom_id_col_and_sparse_ids(ray_session, tmp_path):
    """id_col != 'doc_id' works end-to-end (the prefix-scan stage is
    parameterized, not hardcoded), and sparse 48-bit ids don't blow up
    driver memory (bases are a dict keyed by occupied buckets, not a
    max(id)-sized dense array)."""
    import numpy as np
    import pyarrow.parquet as pq_

    from markdown_query_ray.pipelines.bpe import bpe_pack_shards

    texts = CORPUS * 6
    model = bpe_train(_docs(texts, parts=3), n_merges=48, min_freq=2)

    # sparse ids spread over ~2^48 — a dense bases array would be
    # petabytes; order matches list order so output must equal the
    # dense-id run bit-for-bit
    sparse = (np.arange(len(texts), dtype=np.int64) * (1 << 37)
              + (1 << 47))
    t = pa.table({"page_id": pa.array(sparse),
                  "text": pa.array(texts, pa.string())})
    ds_sparse = ray.data.from_arrow(t).repartition(4)

    m_dense = bpe_pack_shards(_docs(texts, parts=2), model,
                              str(tmp_path / "dense"), seq_len=29,
                              seqs_per_shard=5, range_size=8,
                              concurrency=2)
    m_sparse = bpe_pack_shards(ds_sparse, model, str(tmp_path / "sparse"),
                               seq_len=29, seqs_per_shard=5,
                               range_size=8, id_col="page_id",
                               concurrency=2)
    assert m_dense.column("n_seqs").to_pylist() == \
        m_sparse.column("n_seqs").to_pylist()
    for p1, p2 in zip(m_dense.column("path").to_pylist(),
                      m_sparse.column("path").to_pylist()):
        assert pq_.read_table(p1).equals(pq_.read_table(p2))

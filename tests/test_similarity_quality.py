"""ANN quality: LSH and IVF retrieval measured against brute-force cosine
ground truth on the driver's embeddings table — approximate indexes must
actually approximate."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def queries():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    return np.array(t.column("embedding").to_pylist()[:8], np.float64)


def _topk_sets(table, k):
    out = {}
    for r in table.to_pylist():
        out.setdefault(r["query_idx"], []).append((r["rank"], r["vec_id"]))
    return {q: {v for _, v in sorted(hits)[:k]} for q, hits in out.items()}


def test_lsh_recall_vs_bruteforce(emb_ds, queries):
    from markdown_query_ray.pipelines.similarity import knn_bruteforce, lsh_ann

    k = 10
    truth = _topk_sets(knn_bruteforce(emb_ds, queries, k=k), k)
    approx = _topk_sets(lsh_ann(emb_ds, queries, k=k), k)
    recalls = [len(truth[q] & approx.get(q, set())) / k for q in truth]
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.5, f"LSH mean recall@10 too low: {mean_recall}"


def test_ivf_recall_vs_bruteforce(emb_ds, queries):
    from markdown_query_ray.pipelines.similarity import ivf_ann, knn_bruteforce

    k = 10
    truth = _topk_sets(knn_bruteforce(emb_ds, queries, k=k), k)
    approx = _topk_sets(ivf_ann(emb_ds, queries, k=k, n_lists=8, nprobe=4),
                        k)
    recalls = [len(truth[q] & approx.get(q, set())) / k for q in truth]
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.6, f"IVF mean recall@10 too low: {mean_recall}"


def test_bruteforce_self_retrieval(emb_ds, queries):
    """Each query vector is drawn from the table, so its own vec_id must be
    rank 1 with sim ~1."""
    from markdown_query_ray.pipelines.similarity import knn_bruteforce

    t = knn_bruteforce(emb_ds, queries, k=1)
    for r in t.to_pylist():
        assert r["vec_id"] == r["query_idx"]
        assert r["sim"] == pytest.approx(1.0, abs=1e-9)


def test_lsh_neardup_recall_and_precision(emb_ds):
    """The LSH-blocked near-dup scale path: every emitted pair must pass the
    exact-cosine threshold (precision 1 by construction) and recall vs the
    exhaustive baseline must clear the LSH collision bound's ballpark."""
    from markdown_query_ray.pipelines.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_lsh,
    )

    thr = 0.4
    exact = {(r["vec_a"], r["vec_b"]): r["sim"]
             for r in cosine_neardup_pairs(emb_ds, threshold=thr).to_pylist()}
    approx = {(r["vec_a"], r["vec_b"]): r["sim"]
              for r in cosine_neardup_pairs_lsh(
                  emb_ds, threshold=thr, n_planes=4,
                  n_tables=16).to_pylist()}
    for pair, sim in approx.items():
        assert pair in exact, f"false positive {pair}"
        assert sim == pytest.approx(exact[pair], abs=1e-9)
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.5, f"LSH near-dup recall too low: {recall}"


def test_partial_topk_matches_naive():
    """The tree-reduce combiner keeps exactly the per-query top-k by
    (sim desc, vec_id asc) for arbitrary interleavings, including ties."""
    import pyarrow as pa

    from markdown_query_ray.pipelines.similarity import _partial_topk_batch

    rng = np.random.Generator(np.random.PCG64(3))
    n, k = 500, 7
    q = rng.integers(0, 5, n)
    v = rng.integers(0, 60, n)
    s = rng.integers(0, 9, n).astype(np.float64) / 4.0  # force ties
    batch = pa.table({"query_idx": pa.array(q, pa.int64()),
                      "vec_id": pa.array(v, pa.int64()),
                      "sim": pa.array(s, pa.float64())})
    out = _partial_topk_batch(batch, k)
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["query_idx"], []).append((-r["sim"], r["vec_id"]))
    for qi in np.unique(q):
        rows = sorted((-s[i], v[i]) for i in np.nonzero(q == qi)[0])
        assert sorted(got[qi]) == rows[:k], qi


def test_merge_topk_partials_matches_naive(ray_session):
    import pyarrow as pa
    import ray.data

    from markdown_query_ray.pipelines.similarity import _merge_topk_partials

    rng = np.random.Generator(np.random.PCG64(5))
    n, k = 2000, 5
    q = rng.integers(0, 4, n)
    v = np.arange(n)  # unique ids
    s = rng.random(n)
    ds = ray.data.from_arrow(pa.table({
        "query_idx": pa.array(q, pa.int64()),
        "vec_id": pa.array(v, pa.int64()),
        "sim": pa.array(s, pa.float64()),
    })).repartition(8)
    out = _merge_topk_partials(ds, k)
    per_q = {}
    for r in out.to_pylist():
        per_q.setdefault(r["query_idx"], []).append(
            (r["rank"], r["vec_id"], r["sim"]))
    for qi in np.unique(q):
        idx = np.nonzero(q == qi)[0]
        naive = sorted(zip(-s[idx], v[idx]))[:k]
        expect = [(r + 1, int(vid), -negs)
                  for r, (negs, vid) in enumerate(naive)]
        assert [(a, b, pytest.approx(c)) for a, b, c in per_q[qi]] == expect


def test_minhash_candidates_are_true_near_dups(ray_session):
    """Every pair minhash emits passes the true n-gram Jaccard threshold
    (the verify step is built in), and the known planted duplicates at
    threshold 1.0 (identical texts) are found."""
    import ray.data

    from markdown_query_ray.pipelines.dedup import jaccard, minhash_dedup_pairs

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(ds, threshold=0.5)
    texts = {r["doc_id"]: r["text"] for r in pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()}
    for r in pairs.to_pylist():
        j = jaccard(texts[r["doc_a"]], texts[r["doc_b"]])
        assert j >= 0.5, (r, j)
    # exact duplicates exist in the synthetic table: they must surface
    from collections import Counter

    dup_groups = Counter(texts.values())
    n_exact_pairs = sum(c * (c - 1) // 2 for c in dup_groups.values() if c > 1)
    if n_exact_pairs:
        perfect = [r for r in pairs.to_pylist()
                   if texts[r["doc_a"]] == texts[r["doc_b"]]]
        assert len(perfect) >= n_exact_pairs // 2  # LSH may miss some bands


def test_oph_minhash_equals_classic_pairs(ray_session):
    """One-permutation-hashing signatures (the O(shingles) scale mode) must
    recover the same verified near-dup pair set as the classic permutation
    matrix at the recall-complete banding parameters."""
    import ray.data

    from markdown_query_ray.pipelines.dedup import minhash_dedup_pairs

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    a = minhash_dedup_pairs(ds, threshold=0.5, num_hashes=128, bands=64,
                            sig_mode="classic")
    b = minhash_dedup_pairs(ds, threshold=0.5, num_hashes=128, bands=64,
                            sig_mode="oph")
    pa_ = list(zip(a.column("doc_a").to_pylist(),
                   a.column("doc_b").to_pylist(),
                   a.column("jaccard").to_pylist()))
    pb_ = list(zip(b.column("doc_a").to_pylist(),
                   b.column("doc_b").to_pylist(),
                   b.column("jaccard").to_pylist()))
    assert pa_ == pb_ and len(pa_) > 0

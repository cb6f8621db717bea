"""Pathological-duplicate stress: a boilerplate-grade cluster (thousands of
identical docs landing in ONE band bucket) must not trigger a quadratic pair
blowup. Above MAX_SEGMENT_DOCS the scans emit star pairs (every member paired
with the cluster representative) plus chain pairs (consecutive sorted
members), keeping output linear while preserving pre-threshold dedup-cluster
connectivity and giving crawl-adjacent docs a direct post-threshold edge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


N_CLUSTER = 6000  # > dedup.MAX_SEGMENT_DOCS (4096) => star+chain mode
N_NORMAL = 200


def _star_chain(n: int) -> set[tuple[int, int]]:
    return ({(0, i) for i in range(1, n)}
            | {(i, i + 1) for i in range(1, n - 1)})


@pytest.fixture(scope="module")
def stress_ds(ray_session):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(42))
    texts = ["the same boilerplate page body repeated verbatim many times"]
    texts = texts * N_CLUSTER
    vocab = [f"w{i}" for i in range(500)]
    for i in range(N_NORMAL):
        texts.append(" ".join(rng.choice(vocab, size=40)))
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    return ray.data.from_arrow(t).repartition(8)


def test_minhash_star_cap_bounds_giant_cluster(stress_ds):
    from markdown_query_ray.pipelines import dedup

    pairs = dedup.minhash_dedup_pairs(stress_ds, threshold=0.9,
                                      num_hashes=128, bands=16)
    a = pairs.column("doc_a").to_numpy()
    b = pairs.column("doc_b").to_numpy()
    # linear, not quadratic: the identical cluster contributes exactly the
    # star (0, i) plus the chain (i, i+1) from every band (deduped)
    assert pairs.num_rows < 2 * N_CLUSTER + N_NORMAL, pairs.num_rows
    cluster_pairs = {(x, y) for x, y in zip(a, b) if y < N_CLUSTER}
    assert cluster_pairs == _star_chain(N_CLUSTER)
    # connectivity: union-find over emitted pairs puts the whole cluster in
    # one component
    parent = list(range(N_CLUSTER))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in cluster_pairs:
        parent[find(x)] = find(y)
    assert len({find(i) for i in range(N_CLUSTER)}) == 1
    # every emitted pair is exact-verified at jaccard 1.0
    assert np.all(pairs.column("jaccard").to_numpy() == 1.0)


def test_simhash_star_cap_bounds_giant_cluster(stress_ds):
    from markdown_query_ray.pipelines import dedup

    pairs = dedup.simhash_pairs(stress_ds, max_hamming=3)
    assert pairs.num_rows < 2 * (N_CLUSTER + N_NORMAL) + N_NORMAL, \
        pairs.num_rows
    a = pairs.column("doc_a").to_numpy()
    b = pairs.column("doc_b").to_numpy()
    cluster_pairs = {(x, y) for x, y in zip(a, b)
                     if x < N_CLUSTER and y < N_CLUSTER}
    assert cluster_pairs == _star_chain(N_CLUSTER)


def test_span_dedup_semantics(ray_session):
    """C4-style span dedup: first (doc_id, span_idx) per distinct span
    survives; later repeats — within a doc or across docs — are dropped."""
    import pyarrow as pa
    import ray.data

    from markdown_query_ray.pipelines.dedup import span_dedup

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta. common sentence. gamma",
            "common sentence. delta. common sentence",
            "alpha beta. epsilon",
        ], pa.string()),
    })
    out = span_dedup(ray.data.from_arrow(t).repartition(3)).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "span_idx"]].to_numpy()))
    # doc0: all three spans first occurrences; doc1: "common sentence"@0
    # loses to doc0@1, "delta"@1 survives, repeat @2 drops; doc2:
    # "alpha beta"@0 loses to doc0@0, "epsilon"@1 survives
    assert got == [(0, 0), (0, 1), (0, 2), (1, 1), (2, 1)]

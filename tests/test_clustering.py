"""Quantized exact k-means vs a sequential per-vector reference."""

import numpy as np
import pyarrow as pa

from markdown_query_ray.pipelines.clustering import QUANT, kmeans_assign


def _ref_kmeans(vecs, k, iters):
    """Independent sequential implementation of the same spec (python
    loops, no shared code paths with the pipeline's vectorized math)."""
    q = [[int(np.floor(float(x) * QUANT + 0.5)) for x in v] for v in vecs]
    cents = [list(q[i]) for i in range(k)]  # vec_ids are 0..n-1 ordered

    def dist2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    assign = None
    for _ in range(iters + 1):
        assign = []
        for v in q:
            ds = [dist2(v, c) for c in cents]
            assign.append(ds.index(min(ds)))
        sums = [[0] * len(q[0]) for _ in range(k)]
        counts = [0] * k
        for a, v in zip(assign, q):
            counts[a] += 1
            for j, x in enumerate(v):
                sums[a][j] += x
        for c in range(k):
            if counts[c]:
                cents[c] = [(2 * s + counts[c]) // (2 * counts[c])
                            for s in sums[c]]
    return assign


def _mk(vecs):
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def test_kmeans_matches_sequential_reference(ray_session):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(3))
    # three separated blobs + noise, 40 vectors, dim 8
    blobs = np.concatenate([
        rng.normal(0.0, 0.05, (15, 8)),
        rng.normal(0.8, 0.05, (15, 8)),
        rng.normal(-0.7, 0.05, (10, 8)),
    ]).astype(np.float32)
    exp = _ref_kmeans(blobs, k=3, iters=4)
    out = kmeans_assign(ray.data.from_arrow(_mk(blobs)).repartition(4),
                        k=3, iters=4).to_pandas() \
        .set_index("vec_id").sort_index()
    assert out["cluster"].tolist() == exp
    # the blobs must actually separate (sanity that the test has teeth)
    assert len(set(exp[:15])) == 1 and len(set(exp[15:30])) == 1
    assert set(exp[:15]) != set(exp[15:30])


def test_kmeans_parallelism_invariant(ray_session):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(4))
    vecs = rng.normal(0, 1, (50, 6)).astype(np.float32)
    t = _mk(vecs)
    a = kmeans_assign(ray.data.from_arrow(t).repartition(1),
                      k=5, iters=3).to_pandas().sort_values("vec_id")
    b = kmeans_assign(ray.data.from_arrow(t).repartition(13),
                      k=5, iters=3).to_pandas().sort_values("vec_id")
    assert a["cluster"].tolist() == b["cluster"].tolist()


# ---------------------------------------------------------------------------
# SemDeDup pairs
# ---------------------------------------------------------------------------

def test_semdedup_matches_brute(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.clustering import (
        QUANT8,
        kmeans_assign,
        semdedup_pairs,
    )

    rng = np.random.Generator(np.random.PCG64(9))
    base = rng.normal(0, 0.3, (30, 8)).astype(np.float32)
    # plant near-dups: rows 30..34 are tiny perturbations of rows 0..4
    dups = (base[:5] + rng.normal(0, 0.005, (5, 8))).astype(np.float32)
    vecs = np.concatenate([base, dups])
    t = _mk(vecs)
    ds = ray.data.from_arrow(t).repartition(3)

    out = semdedup_pairs(ds, k=4, iters=4)
    got = sorted(zip(out.column("vec_a").to_pylist(),
                     out.column("vec_b").to_pylist(),
                     out.column("dot").to_pylist()))

    # brute force: same cluster AND exact integer cosine >= 0.9
    asg = kmeans_assign(ds, k=4, iters=4).to_pandas() \
        .set_index("vec_id")["cluster"].to_dict()
    q8 = np.floor(vecs.astype(np.float64) * QUANT8 + 0.5).astype(np.int64)
    exp = []
    n = len(vecs)
    for a in range(n):
        for b in range(a + 1, n):
            if asg[a] != asg[b]:
                continue
            dot = int(q8[a] @ q8[b])
            na, nb = int(q8[a] @ q8[a]), int(q8[b] @ q8[b])
            if dot > 0 and 100 * dot * dot >= 81 * na * nb:
                exp.append((a, b, dot))
    assert got == sorted(exp)
    # the planted dups must be found (they're near-identical)
    found = {(a, b) for a, b, _ in got}
    planted_found = sum((i, i + 30) in found for i in range(5))
    assert planted_found >= 4  # blocking can split at most rarely


def test_quantize8_dimension_aware_overflow_guard():
    """The exact-cosine int64 bound depends on magnitude x dimension:
    a 64-dim matrix at the grid bound is fine, a 768-dim one at the
    same per-component magnitude must be rejected (it would silently
    wrap in the pair test)."""
    import pytest

    from markdown_query_ray.pipelines.clustering import _quantize8

    ok = _quantize8(np.full((2, 64), 4.0), coef=100)
    assert int(np.abs(ok).max()) == 1024
    with pytest.raises(ValueError):
        _quantize8(np.full((2, 768), 4.0), coef=100)


def test_quantize_16bit_exactness_guard():
    """_quantize (the 2^16 k-means grid) rejects magnitude x dimension
    combinations where d * max|q|^2 >= 2^53 — beyond that the 'float64
    BLAS is exact integer math' invariant in _assign silently breaks."""
    import pytest

    from markdown_query_ray.pipelines.clustering import _quantize

    ok = _quantize(np.full((2, 64), 4.0))
    assert int(np.abs(ok).max()) == 262144
    # 64 dims at |x| ~ 6000 -> d*M^2 ~ 2^66: must be rejected loudly
    with pytest.raises(ValueError):
        _quantize(np.full((2, 64), 6000.0))

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

"""Connected components (alternating large-star/small-star) vs union-find."""

import numpy as np
import pyarrow as pa
import pytest


def _uf(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-rep per node that appears in any pair
    nodes = {x for p in pairs for x in p}
    reps = {}
    for x in nodes:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        # min id of the component = find until stable, then min over chain
        reps[x] = r
    # one more pass: path compression makes find(x) the true min already
    return {x: reps[x] for x in nodes}


def _cc(pairs):
    import ray.data

    from markdown_query_ray.pipelines.graph import connected_components

    ds = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
        "doc_b": pa.array([b for _, b in pairs], pa.int64()),
    }))
    t = connected_components(ds)
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("cluster_rep").to_pylist()))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs(ray_session, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    n = 1500
    m = int(rng.integers(200, 2500))
    pairs = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _cc(pairs) == _uf(pairs)


def test_long_chain(ray_session):
    """A path graph maximizes star-contraction rounds (O(log n))."""
    pairs = [(i, i + 1) for i in range(500)]
    got = _cc(pairs)
    assert got == {i: 0 for i in range(501)}


def test_two_stars_and_bridge(ray_session):
    pairs = [(10, x) for x in range(11, 20)] + \
            [(30, x) for x in range(31, 40)] + [(19, 31)]
    got = _cc(pairs)
    assert set(got.values()) == {10}


def test_duplicate_and_reversed_edges(ray_session):
    pairs = [(5, 2), (2, 5), (2, 5), (7, 7), (5, 2), (9, 5)]
    got = _cc(pairs)
    # self loop (7,7) is dropped; 7 appears in no real pair
    assert got == {2: 2, 5: 2, 9: 2}


def test_empty_and_single_edge(ray_session):
    assert _cc([(3, 4)]) == {3: 3, 4: 3}


def test_complete_graph(ray_session):
    import itertools

    pairs = list(itertools.combinations(range(40), 2))
    got = _cc(pairs)
    assert got == {i: 0 for i in range(40)}

"""Deterministic hash split: stability, fractions, shuffle-free plan."""

import numpy as np
import pyarrow as pa
import pytest


def _table(n):
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})


def test_split_pure_function_of_id(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.split import hash_split

    t = _table(5000)
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = pa.concat_tables(list(hash_split(ds).iter_batches(
            batch_size=None, batch_format="pyarrow"))).sort_by("doc_id")
        outs.append(got.column("split").to_pylist())
    assert outs[0] == outs[1]


def test_split_fractions_and_determinism():
    from markdown_query_ray.pipelines.split import assign_split_batch

    t = assign_split_batch(_table(200_000))
    lab = np.array(t.column("split").to_pylist())
    n = len(lab)
    assert abs((lab == "train").mean() - 0.90) < 0.01
    assert abs((lab == "val").mean() - 0.05) < 0.005
    assert abs((lab == "test").mean() - 0.05) < 0.005
    # re-run identical
    t2 = assign_split_batch(_table(200_000))
    assert t.column("split").to_pylist() == t2.column("split").to_pylist()


def test_split_fraction_validation():
    from markdown_query_ray.pipelines.split import assign_split_batch

    with pytest.raises(ValueError):
        assign_split_batch(_table(10),
                           fractions=(("a", 0.5), ("b", 0.2)))

"""Broadcast and shuffle hash equi-joins vs DuckDB on random inputs."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from markdown_query_ray.pipelines.equijoin import (
    broadcast_inner_join,
    collect_arrow,
    shuffle_hash_join,
)


def _rand_tables(seed, n_big=500, n_small=40, dup_right=False):
    rng = np.random.default_rng(seed)
    big = pa.table({
        "k": pa.array(rng.integers(0, 60, n_big), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n_big), pa.int64()),
    })
    keys = rng.permutation(100)[:n_small]
    if dup_right:
        keys = np.concatenate([keys, keys[: n_small // 3]])
    small = pa.table({
        "k": pa.array(keys, pa.int64()),
        "name": pa.array([f"n{int(x)}" for x in keys], pa.string()),
    })
    return big, small


def _duck_inner(big, small):
    con = duckdb.connect()
    con.register("b", big)
    con.register("s", small)
    return con.sql("SELECT b.k, v, name FROM b JOIN s ON b.k = s.k "
                   "ORDER BY b.k, v, name").df()


def test_broadcast_join_matches_duckdb(ray_session):
    import ray.data

    big, small = _rand_tables(3)
    out = broadcast_inner_join(
        ray.data.from_arrow(big).repartition(4), small, "k", "k") \
        .to_pandas().sort_values(["k", "v", "name"]).reset_index(drop=True)
    exp = _duck_inner(big, small)
    assert out.reset_index(drop=True).equals(exp)


def test_broadcast_join_rejects_duplicate_small_keys(ray_session):
    import ray.data

    big, small = _rand_tables(4, dup_right=True)
    with pytest.raises(ValueError):
        broadcast_inner_join(ray.data.from_arrow(big), small, "k", "k")


def test_broadcast_join_no_hits(ray_session):
    import ray.data

    big = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    small = pa.table({"k": pa.array([99], pa.int64()),
                      "name": pa.array(["x"], pa.string())})
    out = broadcast_inner_join(ray.data.from_arrow(big), small, "k", "k")
    assert out.count() == 0


def test_broadcast_join_empty_small_side(ray_session):
    """An empty dimension side must yield an empty join with the full
    joined schema, not an IndexError inside the probe."""
    import ray.data

    big = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "v": pa.array([10, 20, 30], pa.int64())})
    small = pa.table({"k": pa.array([], pa.int64()),
                      "name": pa.array([], pa.string())})
    out = broadcast_inner_join(ray.data.from_arrow(big), small, "k", "k")
    t = collect_arrow(out, pa.schema([("k", pa.int64()),
                                      ("v", pa.int64()),
                                      ("name", pa.string())]))
    assert len(t) == 0
    assert set(t.column_names) == {"k", "v", "name"}


def _shuffle_case(seed, nparts, n_left=400, n_right=300, key_range=25):
    import ray.data

    rng = np.random.default_rng(seed)
    left = pa.table({
        "lk": pa.array(rng.integers(0, key_range, n_left), pa.int64()),
        "a": pa.array(rng.integers(0, 100, n_left), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(rng.integers(0, key_range, n_right), pa.int64()),
        "b": pa.array([f"s{int(x)}" for x in
                       rng.integers(0, 100, n_right)], pa.string()),
    })
    out = shuffle_hash_join(
        ray.data.from_arrow(left).repartition(nparts),
        ray.data.from_arrow(right).repartition(nparts),
        "lk", "rk", {"a": pa.int64()}, {"b": pa.string()},
        key_out="k", num_buckets=8)
    out = collect_arrow(out).to_pandas() \
        .sort_values(["k", "a", "b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql("SELECT lk AS k, a, b FROM l JOIN r ON lk = rk "
                  "ORDER BY k, a, b").df()
    return out, exp


def test_shuffle_join_mxn_duplicates(ray_session):
    out, exp = _shuffle_case(11, nparts=4)
    assert out.equals(exp)


def test_shuffle_join_parallelism_invariant(ray_session):
    a, exp = _shuffle_case(12, nparts=1)
    b, _ = _shuffle_case(12, nparts=9)
    assert a.equals(exp) and b.equals(exp)


def test_shuffle_join_left_combine_fuses_groupby(ray_session):
    """left_combine == groupby(key).sum THEN join, in one exchange."""
    import ray.data

    rng = np.random.default_rng(21)
    left = pa.table({
        "lk": pa.array(rng.integers(0, 20, 300), pa.int64()),
        "x": pa.array(rng.integers(0, 50, 300), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(rng.permutation(30)[:15], pa.int64()),
        "b": pa.array([f"r{i}" for i in range(15)], pa.string()),
    })
    out = shuffle_hash_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(2),
        "lk", "rk", {"x": pa.int64()}, {"b": pa.string()},
        key_out="k", num_buckets=8,
        left_combine=[("x", "sum", "x_sum")])
    out = collect_arrow(out).to_pandas() \
        .sort_values(["k"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql(
        "SELECT lk AS k, x_sum, b FROM (SELECT lk, "
        "CAST(sum(x) AS BIGINT) AS x_sum "
        "FROM l GROUP BY lk) JOIN r ON lk = rk ORDER BY k").df()
    assert out[["k", "x_sum", "b"]].equals(exp)


def test_shuffle_join_disjoint_keys(ray_session):
    import ray.data

    left = pa.table({"lk": pa.array([1, 2], pa.int64()),
                     "a": pa.array([7, 8], pa.int64())})
    right = pa.table({"rk": pa.array([3, 4], pa.int64()),
                      "b": pa.array(["x", "y"], pa.string())})
    out = shuffle_hash_join(ray.data.from_arrow(left),
                            ray.data.from_arrow(right),
                            "lk", "rk", {"a": pa.int64()},
                            {"b": pa.string()})
    assert out.count() == 0


def test_hash_anti_join_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from markdown_query_ray.pipelines.equijoin import hash_anti_join

    rng = np.random.default_rng(9)
    rows = pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "text": pa.array([f"t{i}" for i in range(300)]),
    })
    ids = pa.table({
        "doc_id": pa.array(np.unique(rng.integers(0, 400, 120)), pa.int64()),
    })
    out = hash_anti_join(
        ray.data.from_arrow(rows).repartition(4),
        ray.data.from_arrow(ids).repartition(3),
        "doc_id",
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    got = collect_arrow(out, rows.schema).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("r", rows)
    con.register("f", ids)
    exp = con.sql("SELECT * FROM r WHERE doc_id NOT IN "
                  "(SELECT doc_id FROM f) ORDER BY doc_id").df()
    assert got.equals(exp.reset_index(drop=True))


def test_hash_anti_join_empty_ids(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.equijoin import hash_anti_join

    rows = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["a", "b"])})
    ids = pa.table({"doc_id": pa.array([], pa.int64())})
    out = hash_anti_join(
        ray.data.from_arrow(rows), ray.data.from_arrow(ids), "doc_id",
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    assert collect_arrow(out, rows.schema).num_rows == 2

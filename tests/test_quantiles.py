"""Histogram quantiles vs DuckDB quantile_disc (the semantics oracle)."""

from fractions import Fraction

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from markdown_query_ray.pipelines.quantiles import group_quantiles


def _run(groups, values, qs):
    import ray.data

    t = pa.table({"g": pa.array(groups, pa.string()),
                  "v": pa.array(values, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = group_quantiles(ds, "g", "v", qs=qs)
    return {(r["g"], round(r["q"], 6)): r["quantile"]
            for r in out.to_pylist()}


def _duck(groups, values, qs):
    con = duckdb.connect()
    con.register("t", pa.table({"g": groups, "v": values}))
    exp = {}
    for q in qs:
        for g, val in con.execute(
                "SELECT g, quantile_disc(v, ?) FROM t GROUP BY g",
                [float(q)]).fetchall():
            exp[(g, round(float(q), 6))] = val
    return exp


QS = (Fraction(0), Fraction(1, 4), Fraction(1, 2), Fraction(3, 4),
      Fraction(9, 10), Fraction(99, 100), Fraction(1))


def test_matches_duckdb_quantile_disc(ray_session):
    rng = np.random.default_rng(11)
    groups = [f"g{i % 3}" for i in range(1000)]
    values = rng.integers(0, 500, 1000).astype(np.int64).tolist()
    assert _run(groups, values, QS) == _duck(groups, values, QS)


def test_skewed_and_tiny_groups(ray_session):
    groups = ["a"] * 997 + ["b", "b", "c"]
    values = list(range(997)) + [5, 9, 42]
    got = _run(groups, values, QS)
    assert got == _duck(groups, values, QS)
    assert got[("c", 0.5)] == 42
    assert got[("b", 0.5)] == 5  # ceil(0.5*2)=1 -> first element


def test_duplicate_heavy_values(ray_session):
    groups = ["x"] * 100
    values = [7] * 90 + list(range(10))
    assert _run(groups, values, QS) == _duck(groups, values, QS)


def test_value_domain_guard():
    from markdown_query_ray.pipelines.quantiles import _hist_partials

    t = pa.table({"g": pa.array(["a"], pa.string()),
                  "v": pa.array([-1], pa.int64())})
    with pytest.raises(ValueError):
        _hist_partials(t, "g", "v")


def test_wide_domain_multiple_coarse_buckets(ray_session, monkeypatch):
    """Values spanning many 2^25-wide coarse buckets: the distributed
    rank selection must cross bucket boundaries correctly (including a
    quantile that lands exactly on a bucket's first/last value).
    SMALL_HIST_ROWS is forced to 0 so the distributed path runs even at
    test size."""
    import markdown_query_ray.pipelines.quantiles as qmod

    monkeypatch.setattr(qmod, "SMALL_HIST_ROWS", 0)
    rng = np.random.default_rng(7)
    n = 4000
    groups = [f"g{i % 2}" for i in range(n)]
    # spread over ~2^39: thousands of occupied coarse buckets
    values = (rng.integers(0, 1 << 39, n).astype(np.int64)).tolist()
    # pin some exact-boundary values
    values[:4] = [0, (1 << 25) - 1, 1 << 25, (1 << 39) - 1]
    assert _run(groups, values, QS) == _duck(groups, values, QS)


def test_driver_state_bounded_by_coarse_buckets(ray_session,
                                                monkeypatch):
    """The driver-side collect is the coarse-bucket table, not the
    distinct-value histogram: with VBUCKET_BITS shrunk to 2, 10k
    distinct values over domain [0,64) fold to <=16 buckets/group on
    the driver while answers stay exact."""
    import markdown_query_ray.pipelines.quantiles as qmod

    monkeypatch.setattr(qmod, "VBUCKET_BITS", 2)
    monkeypatch.setattr(qmod, "SMALL_HIST_ROWS", 0)
    rng = np.random.default_rng(3)
    groups = ["a"] * 5000 + ["b"] * 5000
    values = rng.integers(0, 64, 10000).astype(np.int64).tolist()
    assert _run(groups, values, QS) == _duck(groups, values, QS)

"""HyperLogLog registers + estimate (pipelines/sketches.py). The
register-table oracle itself runs in tests/test_driver_contract.py
(hll_user_registers is an oracle-backed extra entry); here: merge
semantics, estimate accuracy, and the exactness claims."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from markdown_query_ray.pipelines.sketches import (
    _rho_trailing,
    hll_estimate,
    hll_hash_u64,
    hll_partial_batch,
    hll_registers,
)


def _ds(keys, parts=4):
    t = pa.table({"k": pa.array(np.asarray(keys, np.int64))})
    return ray.data.from_arrow(t).repartition(parts)


def test_rho_trailing_exact():
    w = np.array([0, 1, 2, 3, 4, 8, 6, (1 << 51), (1 << 52) - 1],
                 np.uint64)
    # 1 + trailing zeros; 0 -> width+1
    assert _rho_trailing(w, 52).tolist() == [53, 1, 2, 1, 3, 4, 2, 52, 1]


def test_partials_merge_to_single_pass(ray_session):
    rng = np.random.Generator(np.random.PCG64(7))
    keys = rng.integers(0, 5000, size=40_000)
    one = hll_partial_batch(pa.table({"k": pa.array(keys)}), "k", 12)
    multi = hll_registers(_ds(keys, parts=9), "k", p=12).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    assert multi["bucket"].tolist() == one.column("bucket").to_pylist()
    assert multi["maxrho"].tolist() == one.column("rho_part").to_pylist()


def test_parallelism_invariant(ray_session):
    keys = np.arange(100_000) % 31_337
    a = hll_registers(_ds(keys, 3), "k").to_pandas().sort_values("bucket")
    b = hll_registers(_ds(keys, 17), "k").to_pandas().sort_values("bucket")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_estimate_accuracy(ray_session):
    for n, tol in [(150, 0.08), (5_000, 0.05), (200_000, 0.05)]:
        keys = np.arange(n, dtype=np.int64) * 2_654_435_761 % (1 << 40)
        regs = hll_registers(_ds(np.repeat(keys, 2), 6), "k") \
            .to_pandas()
        t = pa.table({"bucket": pa.array(regs["bucket"], pa.int64()),
                      "maxrho": pa.array(regs["maxrho"], pa.int64())})
        est = hll_estimate(t)
        n_exact = len(np.unique(keys))
        assert abs(est - n_exact) / n_exact < tol, (n, est)


def test_hash_matches_bytes_reference():
    from markdown_query_ray.functions.hashing import fnv1a_bytes

    keys = np.array([0, 1, -1, 123456789, -987654321], np.int64)
    got = hll_hash_u64(keys)
    want = [fnv1a_bytes(int(np.uint64(k)).to_bytes(8, "little"))
            for k in keys.view(np.uint64)]
    assert got.tolist() == want


def test_empty_input(ray_session):
    regs = hll_registers(_ds([], 2), "k").to_pandas()
    assert len(regs) == 0
    assert hll_estimate(pa.table({"bucket": pa.array([], pa.int64()),
                                  "maxrho": pa.array([], pa.int64())})) \
        >= 0.0

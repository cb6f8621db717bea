"""Deterministic sampling & mixture weighting for training-data curation.

Two operators a 100 TB pipeline runs between cleaning and packing:

``weighted_repeat`` — domain/language mixture weighting (the DoReMi /
Pile recipe): each doc is emitted ``floor(w)`` times plus one more with
probability ``frac(w)``, where ``w`` is its group's mixture weight. The
Bernoulli draw is a PURE FUNCTION of doc_id — ``FNV-1a64(LE bytes of
doc_id + SALT) % 10^6 < frac(w) * 10^6`` — so the realized mix is
identical under re-runs, resume, repartitioning and cluster size, and
the DuckDB oracle re-derives it exactly (same FNV fold the split/
fingerprint oracles already use). Zero shuffles: repetition happens
map-side with ``np.repeat`` on batch indices.

``stratified_sample`` — k docs per stratum, uniform within stratum:
rank by the same deterministic id hash inside each group and keep the
k smallest. Composes the existing group-wise top-k operator
(``topk.groupwise_topk``: map-side per-batch combine, then one small
per-key exact pass), so only candidate rows (<= k per batch per key)
ever shuffle. SQL oracle = ``row_number() OVER (PARTITION BY stratum
ORDER BY fnv(id), id)``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

_MOD = 1_000_000
# distinct salt from the split fold (which hashes the raw id) so the
# sampling draw is independent of train/val/test assignment
MIX_SALT = 0x9E3779B97F4A7C15


def _draw_u(ids: np.ndarray, salt: int = MIX_SALT) -> np.ndarray:
    """Deterministic uniform draw in [0, 1e6) per id: FNV-1a64 over the
    8 LE bytes of (id + salt) mod 2^64."""
    from .dedup import _fnv1a_u64_rows

    keyed = ids.astype(np.uint64) + np.uint64(salt)
    return (_fnv1a_u64_rows(keyed[:, None]) % np.uint64(_MOD)) \
        .astype(np.int64)


def weighted_repeat_batch(batch: pa.Table, weights: dict[str, float],
                          group_col: str = "lang",
                          id_col: str = "doc_id",
                          default: float = 1.0) -> pa.Table:
    """Emit each row ``floor(w)`` + deterministic-Bernoulli(frac(w))
    times; adds an ``n_copies`` column (constant within the repeats of
    one row) so downstream stages can audit the realized mix."""
    groups = batch.column(group_col).to_pylist()
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    w = np.array([float(weights.get(g, default)) for g in groups],
                 np.float64)
    base = np.floor(w).astype(np.int64)
    # frac(w) scaled to integer thresholds so Python and SQL agree
    thresh = np.round((w - base) * _MOD).astype(np.int64)
    extra = (_draw_u(ids) < thresh).astype(np.int64)
    n_copies = base + extra
    idx = np.repeat(np.arange(batch.num_rows), n_copies)
    out = batch.take(pa.array(idx))
    # copy_idx = 0..n_copies-1 within each doc's run: downstream stages
    # use it as an epoch seed, and aggregates can count distinct docs as
    # count(copy_idx == 0) even if Ray re-batches across a doc's copies
    excl = np.concatenate(([0], np.cumsum(n_copies)[:-1]))
    copy_idx = np.arange(idx.size, dtype=np.int64) - \
        np.repeat(excl, n_copies)
    out = out.append_column(
        "n_copies", pa.array(np.repeat(n_copies, n_copies), pa.int64()))
    return out.append_column("copy_idx", pa.array(copy_idx, pa.int64()))


def weighted_repeat(ds, weights: dict[str, float],
                    group_col: str = "lang", id_col: str = "doc_id",
                    default: float = 1.0):
    """Dataset -> Dataset with rows repeated per mixture weight
    (zero-shuffle, deterministic)."""
    return ds.map_batches(
        partial(weighted_repeat_batch, weights=weights,
                group_col=group_col, id_col=id_col, default=default),
        batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, k: int,
                      id_col: str = "doc_id"):
    """k uniform-without-replacement docs per stratum, deterministic:
    keep the k smallest id-hashes within each stratum (ties broken by
    id). Returns rows with a 1-based ``rank`` column."""
    from .topk import groupwise_topk

    def add_key(batch: pa.Table) -> pa.Table:
        u = _draw_u(batch.column(id_col).to_numpy().astype(np.int64))
        return batch.append_column("sample_key", pa.array(u, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return groupwise_topk(keyed, key=stratum_col,
                          order=[("sample_key", "ascending"),
                                 (id_col, "ascending")], k=k)

"""Deterministic hash-based dataset splits (train/val/test).

Training pipelines need splits that are (a) a pure function of the
document id — stable under re-runs, resumes, repartitioning and cluster
size, never of row order — and (b) computable map-side with zero
shuffles. The split label is ``FNV-1a64(doc_id LE bytes) % 1_000_000``
bucketed by cumulative fraction thresholds; the same fold exists in
DuckDB SQL (the driver oracle) and in the C tokenizer kernel.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

_SPLIT_MOD = 1_000_000
DEFAULT_SPLITS = (("train", 0.9), ("val", 0.05), ("test", 0.05))


def _thresholds(fractions) -> tuple[list[str], np.ndarray]:
    names = [n for n, _ in fractions]
    fr = np.array([f for _, f in fractions], np.float64)
    if not np.isclose(fr.sum(), 1.0):
        raise ValueError(f"split fractions sum to {fr.sum()}, not 1")
    cum = np.round(np.cumsum(fr) * _SPLIT_MOD).astype(np.int64)
    cum[-1] = _SPLIT_MOD  # absorb rounding
    return names, cum


def assign_split_batch(batch: pa.Table, id_col: str = "doc_id",
                       fractions=DEFAULT_SPLITS) -> pa.Table:
    """Append a ``split`` dictionary-free string column keyed purely on
    the id hash."""
    from .dedup import _fnv1a_u64_rows

    names, cum = _thresholds(fractions)
    ids = batch.column(id_col).to_numpy().astype(np.uint64)
    b = (_fnv1a_u64_rows(ids[:, None]) % np.uint64(_SPLIT_MOD)) \
        .astype(np.int64)
    lab = np.searchsorted(cum, b, side="right")
    arr = pa.array(np.array(names, object)[lab], pa.string())
    return batch.append_column("split", arr)


def hash_split(ds, id_col: str = "doc_id", fractions=DEFAULT_SPLITS):
    """Dataset -> Dataset with a deterministic ``split`` column; pure
    map_batches, no shuffle, stable at any parallelism."""
    return ds.map_batches(
        partial(assign_split_batch, id_col=id_col, fractions=fractions),
        batch_format="pyarrow")

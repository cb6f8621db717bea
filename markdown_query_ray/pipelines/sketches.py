"""Mergeable sketches with SQL-replayable registers: HyperLogLog
(cardinality) and Count-Min (frequency).

COUNT DISTINCT at 10^12 rows is the canonical sketch use case (Flajolet,
Fusy, Gandouet & Meunier 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" — public literature): m =
2^p registers, register j = max over hashed values routed to j of a
geometric bit statistic, mergeable by element-wise max — i.e. exactly a
map-side-combined ``groupby(bucket).max()`` in Ray Data, with 2^p
registers of state total regardless of corpus size.

Everything DETERMINISTIC is data; the float estimate is a driver-side
helper. The register table itself is the pipeline output, reproducible
bit-for-bit by a SQL oracle:

- hash = FNV-1a64 (functions/hashing.py — the engine's canonical hash,
  with an existing DuckDB fold verified bit-identical);
- bucket = top ``p`` hash bits;
- rho = 1 + (number of trailing zero bits of the remaining 64-p bits),
  pinned to 64-p+1 when they are all zero. The TRAILING-zero convention
  (Flajolet's analysis only needs the statistic to be geometric over
  independent bits) is chosen deliberately: both engines can compute it
  EXACTLY — numpy as log2(w & -w) (log2 of an exact power of two is
  exact in IEEE), DuckDB as bit_count((w & -w) - 1) (pure integer).
  The leading-zero variant would need floor(log2(w)) on arbitrary w,
  which rounds wrong near powers of two (log2(2^52 - 1) rounds to
  exactly 52.0).

``hll_estimate`` applies the standard alpha_m * m^2 / sum(2^-M) formula
with the small-range linear-counting correction; accuracy is
pytest-asserted against exact distinct counts (~1.04/sqrt(m) relative
error at m=4096 ≈ 1.6%).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa


def _rho_trailing(w: np.ndarray, width: int) -> np.ndarray:
    """1 + trailing-zero-count of ``w`` over ``width`` bits (w == 0 ->
    width + 1), exact: log2 runs only on exact powers of two."""
    w = w.astype(np.uint64)
    lsb = w & (~w + np.uint64(1))
    out = np.full(len(w), width + 1, np.int64)
    nz = w != 0
    out[nz] = 1 + np.log2(lsb[nz].astype(np.float64)).astype(np.int64)
    return out


def hll_hash_u64(keys: np.ndarray) -> np.ndarray:
    """FNV-1a64 over the 8 little-endian bytes of each int64/uint64 key
    (the engine's canonical u64 hash — `_fnv_u64le_sql` replays it)."""
    from .dedup import _fnv1a_u64_rows

    return _fnv1a_u64_rows(
        keys.astype(np.int64).view(np.uint64)[:, None])


def hll_partial_batch(batch: pa.Table, col: str, p: int) -> pa.Table:
    """Map-side combine: this batch's non-zero registers (bucket,
    rho_part). At most 2^p rows leave the task however large the
    batch."""
    k = batch.column(col).to_numpy().astype(np.int64)
    h = hll_hash_u64(k)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = _rho_trailing(w, 64 - p)
    regs = np.zeros(1 << p, np.int64)
    np.maximum.at(regs, bucket, rho)
    nz = np.flatnonzero(regs)
    return pa.table({"bucket": pa.array(nz),
                     "rho_part": pa.array(regs[nz])})


def hll_registers(ds, col: str, p: int = 12):
    """Dataset of the sketch's non-zero registers (bucket, maxrho) —
    one tiny exchange of <= 2^p rows per block."""
    from ray.data.aggregate import Max

    return ds.map_batches(partial(hll_partial_batch, col=col, p=p),
                          batch_format="pyarrow") \
        .groupby("bucket").aggregate(Max("rho_part", alias_name="maxrho"))


_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_estimate(registers: pa.Table, p: int = 12) -> float:
    """Standard HLL estimate from a (bucket, maxrho) table (absent
    buckets are zero registers): alpha_m m^2 / sum 2^-M, with the
    small-range linear-counting correction E <= 2.5m."""
    m = 1 << p
    alpha = _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    rho = np.zeros(m, np.int64)
    b = registers.column("bucket").to_numpy().astype(np.int64)
    rho[b] = registers.column("maxrho").to_numpy().astype(np.int64)
    est = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int(np.sum(rho == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications" — public
# literature): depth x width counter matrix, cell (r, c) = number of
# stream items whose r-th hash lands on c. Every cell is an
# ORDER-INDEPENDENT SUM, so the sketch is mergeable by element-wise
# addition — exactly a map-side-combined ``groupby(row, cell).sum()``
# in Ray Data, with depth*width counters of state total regardless of
# corpus size. Point estimate = min over rows (one-sided overestimate,
# error <= e/width * N with prob 1 - e^-depth).
#
# Like the HLL above, the DETERMINISTIC register table is the pipeline
# output, replayable bit-for-bit by SQL: the r-th hash is
# FNV-1a64(FNV-1a64(token_utf8) XOR r) over the 8 LE bytes — both
# folds already have verified DuckDB replays (_fnv_str_sql /
# _fnv_u64le_sql), and XOR + modulo are exact in both engines.
# ---------------------------------------------------------------------------

def cms_hash_cells(tokens, depth: int, width: int) -> np.ndarray:
    """(depth, n) cell indices for a pyarrow string array of tokens:
    row r uses FNV-1a64(base XOR r) % width with base =
    FNV-1a64(token bytes)."""
    from ..functions.hashing import fnv1a64_strings
    from .dedup import _fnv1a_u64_rows

    base = fnv1a64_strings(tokens)
    cells = np.empty((depth, len(base)), np.int64)
    for r in range(depth):
        hr = _fnv1a_u64_rows((base ^ np.uint64(r))[:, None])
        cells[r] = (hr % np.uint64(width)).astype(np.int64)
    return cells


def cms_partial_batch(batch: pa.Table, col: str, depth: int,
                      width: int) -> pa.Table:
    """Map-side combine over the batch's whitespace tokens: non-zero
    cells (row, cell, cnt_part). At most depth*width rows leave the
    task however large the batch."""
    import pyarrow.compute as pc

    # single-space split, matching the term_df/oracle convention
    # (string_split(text, ' ') with empties filtered)
    toks = pc.list_flatten(pc.split_pattern(
        pc.fill_null(batch.column(col), ""), " "))
    toks = toks.filter(pc.not_equal(toks, ""))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    cells = cms_hash_cells(toks, depth, width)
    regs = np.zeros((depth, width), np.int64)
    ones = np.ones(cells.shape[1], np.int64)
    for r in range(depth):
        np.add.at(regs[r], cells[r], ones)
    rr, cc = np.nonzero(regs)
    return pa.table({"row": pa.array(rr.astype(np.int64)),
                     "cell": pa.array(cc.astype(np.int64)),
                     "cnt_part": pa.array(regs[rr, cc])})


def cms_registers(ds, col: str = "text", depth: int = 4,
                  width: int = 2048):
    """Dataset of the sketch's non-zero counters (row, cell, cnt) —
    one tiny exchange of <= depth*width rows per block."""
    from ray.data.aggregate import Sum

    return ds.map_batches(
        partial(cms_partial_batch, col=col, depth=depth, width=width),
        batch_format="pyarrow") \
        .groupby(["row", "cell"]).aggregate(Sum("cnt_part",
                                                alias_name="cnt"))


def cms_estimate(registers: pa.Table, tokens: list[str],
                 depth: int = 4, width: int = 2048) -> dict[str, int]:
    """Point-estimate counts for ``tokens`` from a (row, cell, cnt)
    register table: min over rows (the CMS guarantee: >= true count,
    <= true + N*e/width w.h.p.)."""
    regs = np.zeros((depth, width), np.int64)
    rr = registers.column("row").to_numpy().astype(np.int64)
    cc = registers.column("cell").to_numpy().astype(np.int64)
    regs[rr, cc] = registers.column("cnt").to_numpy().astype(np.int64)
    cells = cms_hash_cells(pa.array(tokens, pa.string()), depth, width)
    return {t: int(regs[np.arange(depth), cells[:, i]].min())
            for i, t in enumerate(tokens)}

"""Exact per-group discrete quantiles of int64 / float64 columns, by
histogram.

Percentile gates (drop the shortest 5% of docs per language, cap at the
99th length percentile, report p50/p90 dashboards) need quantiles over
corpus-scale groups. Sorting each group (``map_groups`` over a whole
language) would pull a corpus-scale group into one worker; instead,
columns with countable value sets (lengths, token counts, fixed-point
metrics — and float64 via the IEEE-754 order isomorphism below) admit
an EXACT quantile via value histograms whose size is bounded by the
number of DISTINCT VALUES, not the corpus:

1. map-side combine: each batch emits (group, value, count) partials —
   one lexicographic sort pass, already deduplicated within the batch;
2. one ``groupby(group, value).sum`` shuffle (at most
   |groups| x |distinct values| rows total, independent of row count);
3. rank selection. Below ``SMALL_HIST_ROWS`` distinct (group, value)
   pairs the histogram is a driver-trivial table and is collected
   directly (one bounded collect beats two more distributed passes —
   the explicit, logged resolution threshold); above it, DISTRIBUTED
   rank selection keeps the histogram in the object store and the
   driver never sees the (group, value) rows themselves:

   a. an ADAPTIVE coarse bucketing — bucket = (value - min) >> shift
      with shift chosen from the observed [min, max] span so at most
      ~2^15 buckets exist — folds the histogram into per-(group,
      bucket) totals; the driver collects those (<= |groups| x 2^16
      rows REGARDLESS of how many distinct values exist), computes
      each group's exclusive prefix over buckets, and locates for
      every quantile the bucket holding its rank plus the residual
      rank within that bucket;
   b. one filtered pass over the histogram keeps only targeted
      (group, bucket) rows; a per-(group, bucket) ``map_groups`` sorts
      that bucket's values on a worker and reads the answers off the
      local cumulative sum. Only |groups| x |qs| result rows reach the
      driver.

   The discrete quantile is ``q_disc(q) = smallest v with cum_count >=
   max(1, ceil(q * n))`` — bit-identical to DuckDB's ``quantile_disc``
   (verified: n=10 gives q.25->3rd, q.5->5th, q.75->8th, q.9->9th
   element; q=0 -> 1st, q=1 -> nth).

Value domain: the FULL int64 range (negatives included — arithmetic
order is preserved through an XOR-2^63 unsigned view for the bucket
math). ``group_quantiles_float`` extends the same machinery to float64
EXACTLY: finite IEEE-754 doubles map to int64 keys that preserve
ordering (positive floats are their own bit patterns; negative floats
flip the magnitude bits), -0.0 normalizes to +0.0 so SQL comparison
semantics match, and NaNs raise (DuckDB's quantile ignores NULLs but
orders NaN last — callers filter them explicitly).

At 100 TB the only driver state is the coarse-bucket table plus the
|groups| x |qs| answers — independent of both corpus size and
distinct-value count (the round-4 watch item: a high-resolution metric
at 10^12 docs could push the distinct-value histogram toward ~10^8
rows, which now stays in the object store).
"""

from __future__ import annotations

from fractions import Fraction
from functools import partial

import numpy as np
import pyarrow as pa

DEFAULT_QS = (Fraction(1, 4), Fraction(1, 2), Fraction(3, 4),
              Fraction(9, 10), Fraction(99, 100))

MAX_COARSE_BITS = 15  # target <= ~2^15 coarse buckets over the span
SMALL_HIST_ROWS = 200_000  # driver-collect threshold (~5 MB table)

_SIGN = np.uint64(1 << 63)


def _to_u(v: np.ndarray) -> np.ndarray:
    """Order-preserving int64 -> uint64 view (x + 2^63 mod 2^64)."""
    return v.astype(np.uint64) + _SIGN


def _hist_partials(batch: pa.Table, group_col: str,
                   value_col: str) -> pa.Table:
    g = batch.column(group_col).to_pylist()
    v = batch.column(value_col).to_numpy().astype(np.int64)
    codes, ginv = np.unique(np.asarray(g, object), return_inverse=True)
    order = np.lexsort((v, ginv))
    gs, vs = ginv[order], v[order]
    new = np.empty(len(vs), bool)
    if len(vs):
        new[0] = True
        new[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(vs)))
    return pa.table({
        group_col: pa.array(codes[gs[starts]].tolist(), pa.string()),
        value_col: pa.array(vs[starts]),
        "cnt_part": pa.array(cnt),
    })


def _ranks_for(n: int, qs, k: int | None) -> list:
    """[(label, 1-based rank)] to select for a group of size n: the
    quantile_disc ranks of ``qs``, or — when ``k`` is given — the
    single k-th-smallest rank clamped to n (the per-group cap / order
    statistic used by domain quota selection)."""
    if k is not None:
        return [(float(k), min(k, n))]
    return [(float(q), max(1, -((-q.numerator * n) // q.denominator)))
            for q in qs]


def group_quantiles(ds, group_col: str, value_col: str,
                    qs=DEFAULT_QS, k: int | None = None) -> pa.Table:
    """pa.Table of (group, q, quantile) — exact ``quantile_disc``
    semantics per group over an int64 column (full range). ``qs`` are
    Fractions so the rank computation ``max(1, ceil(q*n))`` is exact
    integer arithmetic. ``k`` switches to ORDER-STATISTIC mode: one row
    per group holding the k-th smallest value (clamped to the group
    size; the q column carries float(k)) — same machinery, rank fixed
    instead of quantile-derived."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    qs = list(qs)
    hist = ds.map_batches(
        partial(_hist_partials, group_col=group_col, value_col=value_col),
        batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(Sum("cnt_part", alias_name="cnt")) \
        .materialize()  # bounded by distinct values; consumed below

    # explicit small-histogram fast path: below SMALL_HIST_ROWS the
    # whole (group, value) histogram is a driver-trivial table and one
    # collect beats two more distributed passes (count() on the
    # materialized histogram is metadata-only). The bound is what makes
    # this scale-safe: above it, the distributed selection keeps driver
    # state at the coarse-bucket table regardless of distinct values.
    if hist.count() <= SMALL_HIST_ROWS:
        t = hist.sort([group_col, value_col]).to_pandas()
        rows = []
        for grp, sub in t.groupby(group_col, sort=True):
            vals = sub[value_col].to_numpy(np.int64)
            cum = np.cumsum(sub["cnt"].to_numpy(np.int64))
            n = int(cum[-1])
            for lbl, rank in _ranks_for(n, qs, k):
                i = int(np.searchsorted(cum, rank, side="left"))
                rows.append((str(grp), lbl, int(vals[i])))
        return pa.table({
            group_col: pa.array([r[0] for r in rows], pa.string()),
            "q": pa.array([r[1] for r in rows], pa.float64()),
            "quantile": pa.array([r[2] for r in rows], pa.int64()),
        })

    # adaptive coarse granularity from the observed span: shift such
    # that (max - min) >> shift < 2^MAX_COARSE_BITS
    mm = hist.aggregate(Min(value_col), Max(value_col))
    vmin = np.int64(mm[f"min({value_col})"])
    span = int(_to_u(np.asarray([mm[f"max({value_col})"]],
                                np.int64))[0]) \
        - int(_to_u(np.asarray([vmin], np.int64))[0])
    shift = np.uint64(max(0, span.bit_length() - MAX_COARSE_BITS))
    uvmin = _to_u(np.asarray([vmin], np.int64))[0]

    def vbucket_of(v: np.ndarray) -> np.ndarray:
        return ((_to_u(v) - uvmin) >> shift).astype(np.int64)

    def coarse_part(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy().astype(np.int64)
        return pa.table({
            group_col: b.column(group_col),
            "vbucket": pa.array(vbucket_of(v)),
            "cnt_part": b.column("cnt"),
        })

    ct = hist.map_batches(coarse_part, batch_format="pyarrow") \
        .groupby([group_col, "vbucket"]) \
        .aggregate(Sum("cnt_part", alias_name="cnt")) \
        .sort([group_col, "vbucket"]).to_pandas()

    # driver: per group, exclusive prefix over <=2^16 coarse buckets;
    # locate each quantile's bucket + residual in-bucket rank
    targets: dict[tuple[str, int], list[tuple[float, int]]] = {}
    for grp, sub in ct.groupby(group_col, sort=True):
        vb = sub["vbucket"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        below = cum - c
        n = int(cum[-1])
        for lbl, rank in _ranks_for(n, qs, k):
            i = int(np.searchsorted(cum, rank, side="left"))
            targets.setdefault((str(grp), int(vb[i])), []).append(
                (lbl, int(rank - below[i])))
    buckets_by_group = {}
    for (grp, vb) in targets:
        buckets_by_group.setdefault(grp, []).append(vb)
    buckets_by_group = {g: np.asarray(sorted(bs), np.int64)
                        for g, bs in buckets_by_group.items()}
    targets_ref = ray.put((targets, buckets_by_group))

    def keep_targeted(b: pa.Table) -> pa.Table:
        _, by_group = ray.get(targets_ref)
        g = np.asarray(b.column(group_col).to_pylist(), object)
        v = b.column(value_col).to_numpy().astype(np.int64)
        vb = vbucket_of(v)
        keep = np.zeros(len(v), bool)
        codes, inv = np.unique(g, return_inverse=True)
        for ci, gg in enumerate(codes):
            tb = by_group.get(gg)
            if tb is not None:
                sel = inv == ci
                keep[sel] = np.isin(vb[sel], tb)
        out = b.filter(pa.array(keep))
        ov = out.column(value_col).to_numpy().astype(np.int64)
        return out.append_column("vbucket", pa.array(vbucket_of(ov)))

    empty = pa.schema([(group_col, pa.string()), ("q", pa.float64()),
                       ("quantile", pa.int64())]).empty_table()

    def pick(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        tg, _ = ray.get(targets_ref)
        grp = group.column(group_col)[0].as_py()
        vb = int(group.column("vbucket")[0].as_py())
        wanted = tg.get((grp, vb))
        if not wanted:
            return empty
        v = group.column(value_col).to_numpy().astype(np.int64)
        c = group.column("cnt").to_numpy().astype(np.int64)
        order = np.argsort(_to_u(v))  # unsigned == value order
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        ranks = np.asarray([r for _, r in wanted], np.int64)
        idx = np.searchsorted(cum, ranks, side="left")
        return pa.table({
            group_col: pa.array([grp] * len(wanted), pa.string()),
            "q": pa.array([q for q, _ in wanted], pa.float64()),
            "quantile": pa.array(v[idx], pa.int64()),
        })

    got = hist.map_batches(keep_targeted, batch_format="pyarrow") \
        .groupby([group_col, "vbucket"]) \
        .map_groups(pick, batch_format="pyarrow") \
        .take_all()  # |groups| x |qs| rows

    # deterministic output order: groups sorted, qs in caller order
    qpos = {}
    for i, q in enumerate(qs):
        qpos.setdefault(float(q), i)
    rows = sorted(((r[group_col], float(r["q"]), int(r["quantile"]))
                   for r in got),
                  key=lambda r: (r[0], qpos.get(r[1], len(qs)), r[1]))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "q": pa.array([r[1] for r in rows], pa.float64()),
        "quantile": pa.array([r[2] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# float64 quantiles via the IEEE-754 order isomorphism
# ---------------------------------------------------------------------------

_MAG = np.int64(0x7FFFFFFFFFFFFFFF)


def float_order_key(x: np.ndarray) -> np.ndarray:
    """Finite float64 -> int64 key, strictly order-preserving: positive
    floats (and +0.0) keep their bit pattern; negative floats flip the
    magnitude bits so larger-magnitude negatives sort lower. -0.0
    normalizes to +0.0 first (SQL comparison treats them equal). NaNs
    raise — filter them before asking for quantiles."""
    x = np.asarray(x, np.float64)
    if np.isnan(x).any():
        raise ValueError("NaN values have no quantile order; filter "
                         "them first")
    x = x + 0.0  # -0.0 -> +0.0
    b = x.view(np.int64)
    return np.where(b >= 0, b, b ^ _MAG)


def float_from_key(k: np.ndarray) -> np.ndarray:
    """Inverse of ``float_order_key``."""
    k = np.asarray(k, np.int64)
    b = np.where(k >= 0, k, k ^ _MAG)
    return b.view(np.float64)


def group_quantiles_float(ds, group_col: str, value_col: str,
                          qs=DEFAULT_QS) -> pa.Table:
    """Exact per-group ``quantile_disc`` over a float64 column: maps
    values to order-isomorphic int64 keys, runs the integer machinery,
    and maps the answers back — bit-exact vs DuckDB on finite inputs
    (every returned quantile is an element of the input)."""

    def to_key(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            group_col: b.column(group_col),
            "__qkey": pa.array(float_order_key(v)),
        })

    keyed = ds.map_batches(to_key, batch_format="pyarrow")
    t = group_quantiles(keyed, group_col, "__qkey", qs=qs)
    return pa.table({
        group_col: t.column(group_col),
        "q": t.column("q"),
        "quantile": pa.array(float_from_key(
            t.column("quantile").to_numpy().astype(np.int64))),
    })

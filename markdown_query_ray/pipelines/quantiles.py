"""Exact per-group discrete quantiles of an integer column, by histogram.

Percentile gates (drop the shortest 5% of docs per language, cap at the
99th length percentile, report p50/p90 dashboards) need quantiles over
corpus-scale groups. Sorting each group (``map_groups`` over a whole
language) would pull a corpus-scale group into one worker; instead,
integer-valued columns (lengths, token counts) admit an EXACT quantile
via value histograms whose size is bounded by the VALUE DOMAIN, not the
corpus:

1. map-side combine: each batch emits (group, value, count) partials —
   one ``np.unique`` pass, already deduplicated within the batch;
2. one small ``groupby(group, value).sum`` shuffle (at most
   |groups| x |distinct values| rows total, independent of row count);
3. rank selection. Below ``SMALL_HIST_ROWS`` distinct (group, value)
   pairs the histogram is a driver-trivial table and is collected
   directly (one bounded collect beats two more distributed passes —
   the explicit, logged resolution threshold); above it, DISTRIBUTED
   rank selection keeps the histogram in the object store and the
   driver never sees the (group, value) rows themselves:

   a. a second tiny ``groupby(group, value >> 25).sum`` folds the
      histogram into coarse buckets; the driver collects at most
      |groups| x 2^15 bucket totals (the 2^40 value domain / 2^25-wide
      buckets) REGARDLESS of how many distinct values exist, computes
      each group's exclusive prefix over buckets, and locates for
      every quantile the bucket holding its rank plus the residual
      rank within that bucket;
   b. one filtered pass over the histogram keeps only targeted
      (group, bucket) rows; a per-(group, bucket) ``map_groups`` sorts
      that bucket's values (<= 2^25 distinct, on a worker) and reads
      the answers off the local cumulative sum. Only |groups| x |qs|
      result rows reach the driver.

   The discrete quantile is ``q_disc(q) = smallest v with cum_count >=
   max(1, ceil(q * n))`` — bit-identical to DuckDB's ``quantile_disc``
   (verified: n=10 gives q.25->3rd, q.5->5th, q.75->8th, q.9->9th
   element; q=0 -> 1st, q=1 -> nth).

At 100 TB the only driver state is the coarse-bucket table (e.g.
5 langs x <=32k buckets) plus the |groups| x |qs| answers — independent
of both corpus size and distinct-value count (the round-4 watch item:
a high-resolution metric at 10^12 docs could push the distinct-value
histogram toward ~10^8 rows, which now stays in the object store).
"""

from __future__ import annotations

from fractions import Fraction
from functools import partial

import numpy as np
import pyarrow as pa

DEFAULT_QS = (Fraction(1, 4), Fraction(1, 2), Fraction(3, 4),
              Fraction(9, 10), Fraction(99, 100))

VBUCKET_BITS = 25  # coarse buckets of 2^25 values -> <=2^15 per group
SMALL_HIST_ROWS = 200_000  # driver-collect threshold (~5 MB table)


def _hist_partials(batch: pa.Table, group_col: str,
                   value_col: str) -> pa.Table:
    g = batch.column(group_col).to_pylist()
    v = batch.column(value_col).to_numpy().astype(np.int64)
    if len(v) and (v.min() < 0 or v.max() >= (1 << 40)):
        raise ValueError("histogram quantiles need values in [0, 2^40)")
    # one lexicographic unique over (group code, value)
    codes, ginv = np.unique(np.asarray(g, object), return_inverse=True)
    key = ginv.astype(np.int64) * (np.int64(1) << 40) + v
    uk, inv = np.unique(key, return_inverse=True)
    cnt = np.zeros(len(uk), np.int64)
    np.add.at(cnt, inv, 1)
    return pa.table({
        group_col: pa.array(codes[(uk >> 40)].tolist(), pa.string()),
        value_col: pa.array(uk & ((np.int64(1) << 40) - 1)),
        "cnt_part": pa.array(cnt),
    })


def group_quantiles(ds, group_col: str, value_col: str,
                    qs=DEFAULT_QS) -> pa.Table:
    """pa.Table of (group, q, quantile) — exact ``quantile_disc``
    semantics per group. ``qs`` are Fractions so the rank computation
    ``max(1, ceil(q*n))`` is exact integer arithmetic."""
    import ray
    from ray.data.aggregate import Sum

    qs = list(qs)
    hist = ds.map_batches(
        partial(_hist_partials, group_col=group_col, value_col=value_col),
        batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(Sum("cnt_part", alias_name="cnt")) \
        .materialize()  # bounded by value domain; consumed twice below

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
            for q in qs:
                rank = max(1, -((-q.numerator * n) // q.denominator))
                i = int(np.searchsorted(cum, rank, side="left"))
                rows.append((str(grp), float(q), int(vals[i])))
        return pa.table({
            group_col: pa.array([r[0] for r in rows], pa.string()),
            "q": pa.array([r[1] for r in rows], pa.float64()),
            "quantile": pa.array([r[2] for r in rows], pa.int64()),
        })

    def coarse_part(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy().astype(np.int64)
        return pa.table({
            group_col: b.column(group_col),
            "vbucket": pa.array(v >> VBUCKET_BITS),
            "cnt_part": b.column("cnt"),
        })

    ct = hist.map_batches(coarse_part, batch_format="pyarrow") \
        .groupby([group_col, "vbucket"]) \
        .aggregate(Sum("cnt_part", alias_name="cnt")) \
        .sort([group_col, "vbucket"]).to_pandas()

    # driver: per group, exclusive prefix over <=2^15 coarse buckets;
    # locate each quantile's bucket + residual in-bucket rank
    targets: dict[tuple[str, int], list[tuple[float, int]]] = {}
    for grp, sub in ct.groupby(group_col, sort=True):
        vb = sub["vbucket"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        below = cum - c
        n = int(cum[-1])
        for q in qs:
            rank = max(1, -((-q.numerator * n) // q.denominator))
            i = int(np.searchsorted(cum, rank, side="left"))
            targets.setdefault((str(grp), int(vb[i])), []).append(
                (float(q), int(rank - below[i])))
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
        vb = v >> VBUCKET_BITS
        keep = np.zeros(len(v), bool)
        codes, inv = np.unique(g, return_inverse=True)
        for ci, gg in enumerate(codes):
            tb = by_group.get(gg)
            if tb is not None:
                sel = inv == ci
                keep[sel] = np.isin(vb[sel], tb)
        out = b.filter(pa.array(keep))
        ov = out.column(value_col).to_numpy().astype(np.int64)
        return out.append_column("vbucket", pa.array(ov >> VBUCKET_BITS))

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
        order = np.argsort(v)
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

"""Temporal joins Ray Data lacks natively: AS-OF and bounded RANGE joins.

Both are compositions over ONE co-partitioning shuffle: left and right
rows tag their side, union (one shared schema — each side null-fills the
other's payload columns with correctly-typed nulls), shuffle on
``hash(key) % num_buckets`` (equal key => equal bucket, so every match is
local to one group), and the per-group match is fully vectorized — dense
(key, ts) rank composites turn the as-of lookup into a single
``np.searchsorted`` over the group's right rows, and the range expansion
into two searchsorteds plus one repeat/arange. The shuffle payload is only
the projected join columns; partitioning assumption: one bucket's rows fit
one group task (same assumption as the sessionize pipeline; raise
num_buckets — or salt a pathological key upstream — if not).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NUM_BUCKETS = 64


def _key_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    from .dedup import _fnv1a_u64_rows

    h = _fnv1a_u64_rows(ids.astype(np.uint64)[:, None])
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _tag_batch(batch: pa.Table, side: int, key: str, ts: str,
               my_payload: list[str], other_types: list[pa.DataType],
               num_buckets: int) -> pa.Table:
    """One side's rows -> the shared union schema
    (bucket, side, k, t, lp0.., rp0..); the other side's payload columns
    are typed nulls so every block has the identical schema."""
    ids = batch.column(key).to_numpy().astype(np.int64)
    n = len(ids)
    cols: dict[str, object] = {
        "bucket": pa.array(_key_bucket(ids, num_buckets)),
        "side": pa.array(np.full(n, side, np.int8)),
        "k": pa.array(ids, pa.int64()),
        "t": batch.column(ts).cast(pa.timestamp("us")),
    }
    mine = "lp" if side == 0 else "rp"
    other = "rp" if side == 0 else "lp"
    for i, c in enumerate(my_payload):
        cols[f"{mine}{i}"] = batch.column(c)
    for i, typ in enumerate(other_types):
        cols[f"{other}{i}"] = pa.nulls(n, typ)
    # canonical column order so both sides' blocks agree
    names = (["bucket", "side", "k", "t"]
             + [f"lp{i}" for i in range(len(my_payload if side == 0
                                          else other_types))]
             + [f"rp{i}" for i in range(len(other_types if side == 0
                                            else my_payload))])
    return pa.table({nm: cols[nm] for nm in names})


def _composites(pairs: list[tuple[np.ndarray, np.ndarray]]
                ) -> list[np.ndarray]:
    """Collision-free int64 (key, ts) composites via dense ranks SHARED
    across all inputs — no overflow however wide the raw domains are, and
    equal (key, ts) always maps to equal composite."""
    uk = np.unique(np.concatenate([k for k, _ in pairs]))
    ut = np.unique(np.concatenate([t for _, t in pairs]))
    span = np.int64(len(ut) + 1)
    return [np.searchsorted(uk, k).astype(np.int64) * span
            + np.searchsorted(ut, t) for k, t in pairs]


def _split_sides(group: pa.Table):
    side = group.column("side").to_numpy()
    lmask = side == 0
    left = group.filter(pa.array(lmask))
    right = group.filter(pa.array(~lmask))
    return (left, right,
            left.column("k").to_numpy().astype(np.int64),
            left.column("t").cast(pa.int64()).to_numpy(),
            right.column("k").to_numpy().astype(np.int64),
            right.column("t").cast(pa.int64()).to_numpy())


def _asof_group(group: pa.Table, n_lp: int, n_rp: int) -> pa.Table:
    """One bucket: for every left row, the right row with the same key and
    the greatest t <= left.t (ASOF >= semantics; equal timestamps match;
    ties among identical right (key, t) resolve to the last in input
    order). Left rows with no prior right row emit typed nulls."""
    left, right, k_l, t_l, k_r, t_r = _split_sides(group)
    n_left = len(k_l)
    have_r = len(k_r) > 0
    if have_r and n_left:
        kd_l, kd_r = _composites([(k_l, t_l), (k_r, t_r)])
        rord = np.argsort(kd_r, kind="stable")
        idx = np.searchsorted(kd_r[rord], kd_l, side="right") - 1
        ok = idx >= 0
        src = rord[np.where(ok, idx, 0)]
        # composite spaces are per-key disjoint, so a hit in range implies
        # the key matches; guard anyway for clarity
        ok &= k_r[src] == k_l
    else:
        ok = np.zeros(n_left, bool)
        src = np.zeros(n_left, np.int64)
    ok_arr = pa.array(ok)
    src_arr = pa.array(src)
    out: dict[str, object] = {"k": left.column("k"), "t": left.column("t")}
    for i in range(n_lp):
        out[f"lp{i}"] = left.column(f"lp{i}")

    def _gather(col, typ):
        if have_r and n_left:
            taken = col.take(src_arr)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            return pc.if_else(ok_arr, taken, pa.nulls(n_left, typ))
        return pa.nulls(n_left, typ)

    for i in range(n_rp):
        col = right.column(f"rp{i}")
        out[f"rp{i}"] = _gather(col, col.type)
    out["rt"] = _gather(right.column("t"), pa.timestamp("us"))
    return pa.table(out)


def _range_group(group: pa.Table, n_lp: int, n_rp: int, lo_us: int,
                 hi_us: int) -> pa.Table:
    """One bucket: every same-key (left, right) pair with
    left.t + lo_us <= right.t < left.t + hi_us."""
    left, right, k_l, t_l, k_r, t_r = _split_sides(group)
    if len(k_r) and len(k_l):
        kd_lo, kd_hi, kd_r = _composites([
            (k_l, t_l + lo_us), (k_l, t_l + hi_us), (k_r, t_r)])
        rord = np.argsort(kd_r, kind="stable")
        kd_r_s = kd_r[rord]
        lo = np.searchsorted(kd_r_s, kd_lo, side="left")
        hi = np.searchsorted(kd_r_s, kd_hi, side="left")
        n_out = hi - lo
        total = int(n_out.sum())
        li = np.repeat(np.arange(len(k_l)), n_out)
        offs = np.arange(total) - np.repeat(np.cumsum(n_out) - n_out, n_out)
        ri = rord[np.repeat(lo, n_out) + offs]
        # composites are per-key disjoint: [lo, hi) never crosses keys
    else:
        li = np.empty(0, np.int64)
        ri = np.empty(0, np.int64)
    li_arr = pa.array(li)
    ri_arr = pa.array(ri)
    out: dict[str, object] = {
        "k": left.column("k").take(li_arr),
        "t": left.column("t").take(li_arr),
    }
    for i in range(n_lp):
        out[f"lp{i}"] = left.column(f"lp{i}").take(li_arr)
    for i in range(n_rp):
        out[f"rp{i}"] = right.column(f"rp{i}").take(ri_arr)
    out["rt"] = right.column("t").take(ri_arr)
    return pa.table(out)


def _prep(left_ds, right_ds, key, ts, left_payload, right_payload,
          num_buckets):
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    ltypes = [lschema.base_schema.field(c).type for c in left_payload]
    rtypes = [rschema.base_schema.field(c).type for c in right_payload]
    lt = left_ds.map_batches(
        partial(_tag_batch, side=0, key=key, ts=ts, my_payload=left_payload,
                other_types=rtypes, num_buckets=num_buckets),
        batch_format="pyarrow")
    rt = right_ds.map_batches(
        partial(_tag_batch, side=1, key=key, ts=ts,
                my_payload=right_payload, other_types=ltypes,
                num_buckets=num_buckets),
        batch_format="pyarrow")
    return lt.union(rt)


def asof_join(left_ds, right_ds, key: str = "user_id", ts: str = "ts",
              left_payload: list[str] | None = None,
              right_payload: list[str] | None = None,
              num_buckets: int = _NUM_BUCKETS):
    """AS-OF LEFT join: every left row picks the same-key right row with
    the greatest right.ts <= left.ts (DuckDB ``ASOF LEFT JOIN ... ON
    l.key = r.key AND l.ts >= r.ts`` semantics). Returns a Dataset with
    columns (k, t, lp0.., rp0.., rt); rp/rt are null when no prior right
    row exists."""
    left_payload = left_payload or []
    right_payload = right_payload or []
    both = _prep(left_ds, right_ds, key, ts, left_payload, right_payload,
                 num_buckets)
    return both.groupby("bucket").map_groups(
        partial(_asof_group, n_lp=len(left_payload),
                n_rp=len(right_payload)),
        batch_format="pyarrow")


def range_join(left_ds, right_ds, key: str = "user_id", ts: str = "ts",
               lo_us: int = -3_600_000_000, hi_us: int = 0,
               left_payload: list[str] | None = None,
               right_payload: list[str] | None = None,
               num_buckets: int = _NUM_BUCKETS):
    """Bounded range join: all same-key (left, right) pairs with
    left.ts + lo_us <= right.ts < left.ts + hi_us (default: right events
    in the hour BEFORE each left event, exclusive of the left instant)."""
    left_payload = left_payload or []
    right_payload = right_payload or []
    both = _prep(left_ds, right_ds, key, ts, left_payload, right_payload,
                 num_buckets)
    return both.groupby("bucket").map_groups(
        partial(_range_group, n_lp=len(left_payload),
                n_rp=len(right_payload), lo_us=lo_us, hi_us=hi_us),
        batch_format="pyarrow")

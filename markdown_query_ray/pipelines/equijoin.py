"""General equi-joins: broadcast hash join and shuffle hash join.

Ray Data 2.49 has no native joins, and the temporal joins in joins.py
key on (id, time). Relational pipelines need plain key-equality joins
with two scale regimes:

``broadcast_inner_join`` — dimension-table side fits comfortably in the
object store (TPC-H customer/part/supplier shape; at 100 TB fact scale
the dimensions are GBs). The small side is sorted once, published with
``ray.put``, fetched ONCE PER ACTOR (zero-copy numpy/Arrow views from
the local object store), and probed with a vectorized ``searchsorted``
per batch — the fact side streams with ZERO shuffle. Small-side keys
must be unique (asserted): that's the dimension-join contract, and it
keeps output row counts equal to the surviving fact rows.

``shuffle_hash_join`` — both sides large: each side maps into a shared
union schema tagged with ``side`` and ``jb = FNV(key) % num_buckets``
(absent columns are typed nulls, the joins.py trick, so every block has
one schema), then ONE ``groupby(jb).map_groups`` co-locates equal keys
and a sorted-``searchsorted`` expansion emits the M x N pairs per key —
full inner-join semantics with duplicates on both sides. Only the
projected payload columns ride the shuffle; skewed keys salt the same
way the index build's doc-range salting does (hash of the key, not the
raw value, decides the bucket).

Both return Datasets and never materialize corpus-scale state on the
driver.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 64

# arrow aggregate output type per op (for empty-schema pinning)
_AGG_TYPE = {
    "sum": lambda t: t,
    "min": lambda t: t,
    "max": lambda t: t,
    "mean": lambda t: pa.float64(),
    "count": lambda t: pa.int64(),
}


def _key_u64(keys: np.ndarray) -> np.ndarray:
    from .dedup import _fnv1a_u64_rows

    return _fnv1a_u64_rows(keys.astype(np.int64).view(np.uint64)[:, None])


def _broadcast_probe(batch: pa.Table, small_ref, big_key: str,
                     small_key: str) -> pa.Table:
    """Task-based probe: ``ray.get`` on an object already resident in
    the node's object store is a zero-copy view, so per-task fetch costs
    microseconds after the first pull per node (and avoids actor-pool
    spin-up entirely for this stateless, cheap kernel)."""
    import ray

    small: pa.Table = ray.get(small_ref) if not isinstance(
        small_ref, pa.Table) else small_ref
    keys = small.column(small_key).to_numpy().astype(np.int64)
    payload = small.drop_columns([small_key])
    bk = batch.column(big_key).to_numpy().astype(np.int64)
    if not len(keys):
        # empty dimension side: emit a 0-row table with the full joined
        # schema so downstream blocks unify
        out = batch.slice(0, 0)
        for name in payload.column_names:
            out = out.append_column(name, payload.column(name))
        return out
    pos = np.searchsorted(keys, bk)
    pos_c = np.minimum(pos, len(keys) - 1)
    hit = keys[pos_c] == bk
    out = batch.filter(pa.array(hit))
    gathered = payload.take(pa.array(pos_c[hit]))
    for name in gathered.column_names:
        out = out.append_column(name, gathered.column(name))
    return out


def broadcast_inner_join(big_ds, small: pa.Table, big_key: str,
                         small_key: str, small_cols=None):
    """Inner-join ``big_ds`` against a small in-memory dimension table;
    appends ``small_cols`` (default: all non-key columns). Small-side
    keys must be unique."""
    import ray

    cols = [small_key] + list(
        small_cols if small_cols is not None else
        [c for c in small.column_names if c != small_key])
    small = small.select(cols)
    idx = pc.sort_indices(small, sort_keys=[(small_key, "ascending")])
    small = small.take(idx)
    k = small.column(small_key).to_numpy()
    if len(k) and (np.diff(k) == 0).any():
        raise ValueError("broadcast join requires unique small-side keys")
    small_ref = ray.put(small)
    return big_ds.map_batches(
        partial(_broadcast_probe, small_ref=small_ref, big_key=big_key,
                small_key=small_key),
        batch_format="pyarrow")


def _union_fields(key_out: str, left_schema: list, right_schema: list):
    return ([pa.field(key_out, pa.int64()), pa.field("side", pa.int8()),
             pa.field("jb", pa.int64())]
            + [pa.field(n, t) for n, t in left_schema]
            + [pa.field(n, t) for n, t in right_schema])


def _tag_batch(batch: pa.Table, side: int, key: str, key_out: str,
               own: list, other: list, num_buckets: int) -> pa.Table:
    keys = batch.column(key).to_numpy().astype(np.int64)
    jb = (_key_u64(keys) % np.uint64(num_buckets)).astype(np.int64)
    n = batch.num_rows
    cols = {key_out: pa.array(keys),
            "side": pa.array(np.full(n, side, np.int8)),
            "jb": pa.array(jb)}
    for name, typ in (own if side == 0 else other):
        cols[name] = batch.column(name).cast(typ) if side == 0 \
            else pa.nulls(n, typ)
    for name, typ in (other if side == 0 else own):
        cols[name] = pa.nulls(n, typ) if side == 0 \
            else batch.column(name).cast(typ)
    fields = _union_fields(key_out, *(own, other) if side == 0
                           else (other, own))
    return pa.table({f.name: cols[f.name] for f in fields})


def _join_group(group: pa.Table, key_out: str, left_names: list,
                right_names: list, left_combine=None) -> pa.Table:
    lmask = pc.equal(group.column("side"), pa.scalar(0, pa.int8()))
    left = group.filter(lmask).select([key_out] + left_names)
    right = group.filter(pc.invert(lmask)).select([key_out] + right_names)
    if left_combine:
        # fold the left side's per-key aggregation into this (already
        # key-partitioned) bucket: equal keys all land in this group, so
        # a local TableGroupBy is the EXACT global aggregate — the
        # dedicated groupby shuffle disappears
        left = pa.TableGroupBy(left, [key_out]).aggregate(
            [(c, op) for c, op, _ in left_combine])
        left = left.rename_columns([key_out] + [out for _, _, out
                                                in left_combine])
        left_names = [out for _, _, out in left_combine]
    lk = left.column(key_out).to_numpy()
    rk = right.column(key_out).to_numpy()
    r_order = np.argsort(rk, kind="stable")
    rk_s = rk[r_order]
    lo = np.searchsorted(rk_s, lk, side="left")
    hi = np.searchsorted(rk_s, lk, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    out_names = [key_out] + left_names + right_names
    if total == 0:
        empty = pa.array([], pa.int64())
        cols = {key_out: left.column(key_out).take(empty)}
        for name in left_names:
            cols[name] = left.column(name).take(empty)
        for name in right_names:
            cols[name] = right.column(name).take(empty)
        return pa.table({n: cols[n] for n in out_names})
    l_idx = np.repeat(np.arange(len(lk)), cnt)
    excl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    r_idx = np.repeat(lo, cnt) + (np.arange(total) - np.repeat(excl, cnt))
    take_l = pa.array(l_idx)
    take_r = pa.array(r_order[r_idx])
    cols = {key_out: pa.array(lk[l_idx])}
    for name in left_names:
        cols[name] = left.column(name).take(take_l)
    for name in right_names:
        cols[name] = right.column(name).take(take_r)
    return pa.table({n: cols[n] for n in out_names})


def shuffle_hash_join(left_ds, right_ds, left_key: str, right_key: str,
                      left_cols: dict, right_cols: dict,
                      key_out: str | None = None,
                      num_buckets: int = DEFAULT_BUCKETS,
                      left_combine=None):
    """Distributed inner equi-join of two Datasets. ``left_cols`` /
    ``right_cols`` map payload column name -> pyarrow type (the
    projection that rides the shuffle; keep it narrow). Output columns:
    ``key_out`` (int64) + left payloads + right payloads, M x N rows per
    duplicated key.

    ``left_combine=[(col, op, out_name), ...]`` aggregates the left
    side per key INSIDE the join's own exchange (the bucket already
    co-locates equal keys, so the local aggregate is globally exact) —
    the fused form of ``left.groupby(key).agg(...)`` followed by the
    join, one shuffle instead of two. Left payload columns then emerge
    as ``out_name``."""
    key_out = key_out or left_key
    ls = sorted(left_cols.items())
    rs = sorted(right_cols.items())
    tagged_l = left_ds.map_batches(
        partial(_tag_batch, side=0, key=left_key, key_out=key_out,
                own=ls, other=rs, num_buckets=num_buckets),
        batch_format="pyarrow")
    tagged_r = right_ds.map_batches(
        partial(_tag_batch, side=1, key=right_key, key_out=key_out,
                own=rs, other=ls, num_buckets=num_buckets),
        batch_format="pyarrow")
    both = tagged_l.union(tagged_r)
    joined = both.groupby("jb").map_groups(
        partial(_join_group, key_out=key_out,
                left_names=[n for n, _ in ls],
                right_names=[n for n, _ in rs],
                left_combine=left_combine),
        batch_format="pyarrow")

    # CAVEAT: Ray's map_groups leaves a ZERO-COLUMN empty block behind
    # for each partition that held no groups; map_batches/filter skip
    # empty blocks, so no stage can repair them, and Dataset.to_pandas
    # may nondeterministically promote int64 -> float64 when such a
    # block leads the concat. Ray-native consumers (map_batches,
    # write_parquet, iter_batches) are unaffected — collect results via
    # collect_arrow() below, which iterates batches (empties skipped).
    return joined


def join_output_schema(key_out: str, left_cols: dict, right_cols: dict,
                       left_combine=None) -> pa.Schema:
    """The schema ``shuffle_hash_join`` emits (for empty-result
    fallbacks)."""
    ls = sorted(left_cols.items())
    rs = sorted(right_cols.items())
    if left_combine:
        ltypes = dict(ls)
        lfields = [(out, _AGG_TYPE.get(op, lambda t: t)(ltypes[c]))
                   for c, op, out in left_combine]
    else:
        lfields = ls
    return pa.schema([pa.field(key_out, pa.int64())]
                     + [pa.field(n, t) for n, t in lfields]
                     + [pa.field(n, t) for n, t in rs])


def collect_arrow(ds, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a small Dataset to one pa.Table via the batch
    iterator — skips the zero-column empty blocks map_groups leaves
    behind (see shuffle_hash_join) without a pandas round-trip."""
    batches = [b for b in ds.iter_batches(batch_size=None,
                                          batch_format="pyarrow")
               if b.num_columns > 0]
    if not batches:
        if empty_schema is None:
            raise ValueError("empty result and no fallback schema")
        return empty_schema.empty_table()
    return pa.concat_tables(batches)


def hash_anti_join(rows_ds, ids_ds, key: str, rows_schema: pa.Schema,
                   num_buckets: int = 64):
    """Distributed NOT IN: drop the rows of ``rows_ds`` whose ``key``
    value appears in ``ids_ds`` (a Dataset with a ``key`` column), with
    neither side ever collecting. Both sides co-shuffle ONCE on
    ``FNV(key) % num_buckets`` (equal key => equal bucket) and the
    filter is a vectorized searchsorted inside ``map_groups`` — the
    same semi-join shape as dedup.exact_dedup_rows, inverted.
    ``rows_schema`` pins the row side's column types so the id side can
    union in as typed nulls (one Dataset, one exchange)."""
    names = [f.name for f in rows_schema]

    def tag_rows(b: pa.Table) -> pa.Table:
        b = b.select(names)
        k = b.column(key).to_numpy().astype(np.int64)
        bucket = (_key_u64(k) % np.uint64(num_buckets)).astype(np.int32)
        b = b.append_column("__side", pa.array(
            np.zeros(len(b), np.int8)))
        return b.append_column("__bucket", pa.array(bucket))

    def tag_ids(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy().astype(np.int64)
        bucket = (_key_u64(k) % np.uint64(num_buckets)).astype(np.int32)
        cols = {}
        for f in rows_schema:
            cols[f.name] = (pa.array(k, pa.int64()) if f.name == key
                            else pa.nulls(len(k), f.type))
        t = pa.table(cols)
        t = t.append_column("__side", pa.array(np.ones(len(k), np.int8)))
        return t.append_column("__bucket", pa.array(bucket))

    def drop(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy()
        keys = group.column(key).to_numpy().astype(np.int64)
        flagged = np.unique(keys[side == 1])
        rows_mask = side == 0
        if len(flagged):
            pos = np.minimum(np.searchsorted(flagged, keys),
                             len(flagged) - 1)
            rows_mask &= flagged[pos] != keys
        return group.filter(pa.array(rows_mask)).drop_columns(
            ["__side", "__bucket"])

    tagged = rows_ds.map_batches(tag_rows, batch_format="pyarrow").union(
        ids_ds.map_batches(tag_ids, batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(
        drop, batch_format="pyarrow")

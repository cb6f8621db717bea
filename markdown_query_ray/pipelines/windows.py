"""Stream-shaped operators over the events table (event_id, ts, user_id,
event_type, value, props).

Ray Data has no watermarks; the reference has no streaming either (batch
walk, SURVEY.md §1.1). These implement the batch forms a training-data
pipeline needs, with the partitioning assumption stated: events are
processed per-key (user_id / event_type), sorted by ts inside the group —
``groupby(key).map_groups(fn)`` — which holds at scale as long as one key's
events fit a worker (they shuffle to the same group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# explicit partial schema: an EMPTY batch's pandas object columns would
# otherwise become Arrow null-typed and conflict with non-empty blocks at
# the groupby (Ray Data legitimately emits empty blocks)
_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()),
    ("window_start", pa.timestamp("us")),
    ("n_part", pa.int64()),
    ("sum_part", pa.float64()),
])


def tumbling_counts(ds, minutes: int = 60):
    """Tumbling-window (event_type, window_start) -> n, total value.
    Pre-aggregates per batch before the groupby — partial/combiner shape."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy()
        win = ts.astype("datetime64[s]")
        win = (win.astype("int64") // (minutes * 60)) * (minutes * 60)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "window_start": win.astype("datetime64[s]").astype(
                "datetime64[us]"),
            "value": batch.column("value").to_numpy(),
        })
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n_part=("value", "size"), sum_part=("value", "sum"))
        return pa.Table.from_pandas(g, schema=_PARTIAL_SCHEMA,
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_part", alias_name="n_events"),
        Sum("sum_part", alias_name="sum_value"))


def hopping_counts(ds, size_minutes: int = 60, hop_minutes: int = 30):
    """Hopping (sliding) window counts: each event lands in every window of
    ``size_minutes`` whose start is a multiple of ``hop_minutes`` covering
    its ts. Map-side the event expands to its size/hop window starts (a
    flat_map as arithmetic, no row loop), then the same partial/combiner
    groupby as tumbling — the expansion factor (size/hop) is the only cost
    over tumbling, and it happens before the shuffle so the combiner still
    collapses it."""
    size_s = size_minutes * 60
    hop_s = hop_minutes * 60
    k = -(-size_s // hop_s)  # ceil: windows possibly covering one event

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[s]") \
            .astype("int64")
        last_start = (ts // hop_s) * hop_s
        starts = last_start[:, None] - np.arange(k)[None, :] * hop_s
        starts = starts.ravel()
        keep = starts > (np.repeat(ts, k) - size_s)
        df = pd.DataFrame({
            "event_type": np.repeat(
                np.asarray(batch.column("event_type").to_pylist(),
                           dtype=object), k)[keep],
            "window_start": starts[keep].astype("datetime64[s]").astype(
                "datetime64[us]"),
            "value": np.repeat(batch.column("value").to_numpy(), k)[keep],
        })
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n_part=("value", "size"), sum_part=("value", "sum"))
        return pa.Table.from_pandas(g, schema=_PARTIAL_SCHEMA,
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_part", alias_name="n_events"),
        Sum("sum_part", alias_name="sum_value"))


def sessionize(ds, gap_minutes: int = 30, buckets: int = 64):
    """Per-user session assignment: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Returns
    (event_id, user_id, session_id) where session_id numbers a user's
    sessions from 1 in ts order — expressible in SQL as a windowed cumulative
    sum over a lag comparison (the oracle).

    Shape: the shuffle key is a HASH BUCKET of user_id, not user_id itself
    — ``groupby(user_id).map_groups`` pays one Python call per user, which
    collapses at millions of users. Each bucket frame sessionizes ALL its
    users in one vectorized pass (sort by user/ts, gap-or-user-change flag,
    per-user cumsum). Same per-user semantics; only the group granularity
    changes."""
    gap_us = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        # multiply-shift over the int64 id: deterministic, spreads
        # consecutive ids across buckets
        with np.errstate(over="ignore"):
            h = uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return batch.append_column(
            "bucket", pa.array((h >> np.uint64(40)).astype(np.int64)
                               % buckets))

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = g.take(idx)
        ts = g.column("ts").to_numpy()
        uid = g.column("user_id").to_numpy()
        new = np.ones(len(ts), bool)
        if len(ts) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        # per-user session numbering: global cumsum minus the user's offset
        csum = np.cumsum(new)
        user_change = np.zeros(len(ts), bool)
        if len(ts):
            user_change[0] = True
        if len(ts) > 1:
            user_change[1:] = uid[1:] != uid[:-1]
        base = np.zeros(len(ts), np.int64)
        base[user_change] = csum[user_change] - 1
        np.maximum.accumulate(base, out=base)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "session_id": pa.array((csum - base).astype(np.int64)),
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

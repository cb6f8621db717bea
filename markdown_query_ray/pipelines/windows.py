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


def tumbling_counts(ds, minutes: int = 60):
    """Tumbling-window (event_type, window_start) -> n, total value.
    Pre-aggregates per batch before the groupby — partial/combiner shape."""
    step = np.timedelta64(minutes * 60, "s")

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
        return pa.Table.from_pandas(g, preserve_index=False)

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
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_part", alias_name="n_events"),
        Sum("sum_part", alias_name="sum_value"))


def sessionize(ds, gap_minutes: int = 30):
    """Per-user session assignment: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Returns
    (event_id, user_id, session_id) where session_id numbers a user's
    sessions from 1 in ts order — expressible in SQL as a windowed cumulative
    sum over a lag comparison (the oracle)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        g["session_id"] = new.cumsum().astype("int64")
        return g[["event_id", "user_id", "session_id"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

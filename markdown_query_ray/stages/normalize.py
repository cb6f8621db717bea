"""Per-record normalization operators (SURVEY.md §2.2 M3-M6).

Rebuilds of the reference's field shims as stateless, vectorized
``map_batches`` stages:

- M3 date normalizer   — src/date.rs:36-50 (RFC3339 | "%Y-%m-%dT%T%z" |
  raw integer -> epoch seconds i64) and :23-34 (epoch -> RFC3339 display).
- M4 scalar-or-list    — src/document.rs:194-232 (``tag: x`` vs
  ``tags: [x,y]``, ``author`` vs ``authors`` -> one list<string> column).
- M5 deterministic id  — src/document.rs:148-151 assigns a random UUID when
  missing; random ids would break retry/parallelism reproducibility on a
  cluster, so the rebuild derives id = sha1(url) (stable surrogate).
- M6 serialization modes — src/document.rs:15-28,234-285: Storage keeps
  everything, Human/Preview project the body only.

All are pure per-row functions of the batch => plain stateless tasks, no
actor pool needed.
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

# RFC3339 / ISO-8601 with offset, e.g. 2021-05-01T12:00:00+00:00 / ...Z
_RFC3339 = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})"
    r"(?:\.(\d+))?\s*(Z|z|[+-]\d{2}:?\d{2})?$")


def parse_date(value) -> int | None:
    """One date value -> epoch seconds (i64), reference coercion order:
    RFC3339 string, then ``%Y-%m-%dT%T%z``-style (covered by the same
    pattern with required offset), then raw integer (src/date.rs:36-50,
    53-103). None/unparseable -> None."""
    if value is None:
        return None
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return int(value)
    s = str(value).strip()
    if not s:
        return None
    m = _RFC3339.match(s)
    if m:
        y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
        off = m.group(8)
        dt = datetime(y, mo, d, h, mi, sec, tzinfo=timezone.utc)
        epoch = int(dt.timestamp())
        if off and off not in ("Z", "z"):
            sign = 1 if off[0] == "+" else -1
            oh, om = int(off[1:3]), int(off[-2:])
            epoch -= sign * (oh * 3600 + om * 60)
        return epoch
    try:
        return int(s)
    except ValueError:
        return None


def format_date(epoch: int | None) -> str | None:
    """Epoch seconds -> RFC3339 display string (src/date.rs:23-34). The
    reference renders in the local zone; the rebuild fixes UTC so output is
    machine-independent (cluster nodes may have different zones)."""
    if epoch is None:
        return None
    return datetime.fromtimestamp(int(epoch), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S+00:00")


def normalize_dates_batch(batch: pa.Table, col: str = "date",
                          out: str | None = None) -> pa.Table:
    """map_batches body: coerce a string-or-int date column to epoch i64."""
    out = out or col
    vals = [parse_date(v) for v in batch.column(col).to_pylist()]
    arr = pa.array(vals, pa.int64())
    if out in batch.column_names:
        return batch.set_column(batch.column_names.index(out), out, arr)
    return batch.append_column(out, arr)


def coerce_scalar_or_list(batch: pa.Table, singular: str, plural: str,
                          out: str | None = None) -> pa.Table:
    """map_batches body for the reference's string-or-list shim: merge a
    scalar column (``tag``) and a list column (``tags``) into one
    list<string> column, list wins when both present, missing -> []."""
    out = out or plural
    n = len(batch)
    sing = (batch.column(singular).to_pylist()
            if singular in batch.column_names else [None] * n)
    plur = (batch.column(plural).to_pylist()
            if plural in batch.column_names else [None] * n)
    merged = []
    for s, p in zip(sing, plur):
        if p is not None:
            merged.append([str(x) for x in p])
        elif s is not None:
            merged.append([str(s)])
        else:
            merged.append([])
    arr = pa.array(merged, pa.list_(pa.string()))
    keep = [c for c in batch.column_names if c not in (singular, out)]
    cols = {c: batch.column(c) for c in keep}
    cols[out] = arr
    return pa.table(cols)


def surrogate_id_batch(batch: pa.Table, key: str = "url",
                       out: str = "id") -> pa.Table:
    """Deterministic id = sha1(key) hex — replaces the reference's random
    UUID (src/document.rs:148-151) so task retries produce identical rows."""
    ids = [hashlib.sha1(str(v).encode("utf-8")).hexdigest()
           for v in batch.column(key).to_pylist()]
    arr = pa.array(ids, pa.string())
    if out in batch.column_names:
        return batch.set_column(batch.column_names.index(out), out, arr)
    return batch.append_column(out, arr)


_MODE_COLUMNS = {
    # Storage keeps the full record incl. fullpath/epoch date/body
    # (src/document.rs:248-284); Disk drops the storage-internal fields;
    # Human/Preview render body only (src/document.rs:234-245).
    "storage": None,             # all columns
    "disk": "__not_fullpath__",  # all except fullpath-ish internals
    "human": ("body",),
    "preview": ("body",),
}


def serialize_mode(batch: pa.Table, mode: str,
                   body_col: str = "body") -> pa.Table:
    """M6 mode-dependent projection of a parsed-document batch."""
    mode = mode.lower()
    if mode not in _MODE_COLUMNS:
        raise ValueError(f"unknown serialization mode {mode!r}")
    sel = _MODE_COLUMNS[mode]
    if sel is None:
        return batch
    if sel == "__not_fullpath__":
        keep = [c for c in batch.column_names if c != "fullpath"]
        return batch.select(keep)
    keep = [c if c != "body" else body_col for c in sel]
    return batch.select([c for c in keep if c in batch.column_names])


def filter_hidden_and_ext(batch: pa.Table, path_col: str = "path",
                          ext: str = ".md") -> pa.Table:
    """M1+M2: drop dot-files and non-``ext`` paths (src/main.rs:86-97) —
    vectorized on the path column."""
    paths = batch.column(path_col)
    base = pc.replace_substring_regex(paths, r"^.*/", "")
    keep = pc.and_(
        pc.invert(pc.starts_with(base, ".")),
        pc.ends_with(paths, ext))
    return batch.filter(keep)

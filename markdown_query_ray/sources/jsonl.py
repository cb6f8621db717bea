"""JSONL source: newline-delimited JSON corpora (the Dolma/RedPajama/C4
distribution format — one document object per line, plain or gzip) into
the pages/documents schema.

Same shape as the WARC source: one Ray task per file over
``read_binary_files``-style whole-file reads, a cheap metadata pass
counting records per file, and prefix-sum doc_ids so ids are
deterministic at any parallelism. Field mapping is configurable
(``text_key``/``url_key``/``ts_key``) because jsonl corpora disagree on
names ("text"/"content", "url"/"uri", ...)."""

from __future__ import annotations

import gzip
import json

import numpy as np
import pyarrow as pa


def _read_lines(path: str) -> list[bytes]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return [ln for ln in data.split(b"\n") if ln.strip()]


def read_jsonl(paths: list[str], id_base: int = 0,
               text_key: str = "text", url_key: str = "url",
               ts_key: str | None = "ts"):
    """Ray Dataset of (doc_id, url, warc_ts, text) from JSONL files.
    doc_id = id_base + prefix-sum(file line counts) + in-file order.
    Missing url fields synthesize a deterministic ``jsonl://<path>#<line>``
    key (upsert/dedup still need a stable per-row identity)."""
    import ray.data

    paths = sorted(paths)

    def count_batch(batch: pa.Table) -> pa.Table:
        ns = [len(_read_lines(p))
              for p in batch.column("path").to_pylist()]
        return pa.table({"path": batch.column("path"),
                         "n": pa.array(ns, pa.int64())})

    counts = ray.data.from_items(
        [{"path": p} for p in paths]).map_batches(
        count_batch, batch_format="pyarrow").to_pandas()
    counts = counts.set_index("path")["n"].to_dict()
    bases = {}
    acc = id_base
    for p in paths:
        bases[p] = acc
        acc += counts[p]

    def parse_batch(batch: pa.Table) -> pa.Table:
        ids, urls, tss, texts = [], [], [], []
        for p in batch.column("path").to_pylist():
            base = bases[p]
            for j, ln in enumerate(_read_lines(p)):
                row = json.loads(ln)
                ids.append(base + j)
                urls.append(str(row.get(url_key) or f"jsonl://{p}#{j}"))
                ts = row.get(ts_key) if ts_key else None
                # strip a trailing Z (Dolma/CC jsonl timestamps are
                # Z-suffixed ISO; np.datetime64 on tz-aware strings is
                # deprecated and will hard-error) — same as warc.py
                tss.append(np.datetime64(str(ts).rstrip("Z"), "us")
                           if ts else None)
                texts.append(str(row.get(text_key) or ""))
        return pa.table({
            "doc_id": pa.array(ids, pa.uint64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "text": pa.array(texts, pa.large_string()),
        })

    return ray.data.from_items(
        [{"path": p} for p in paths]).map_batches(
        parse_batch, batch_format="pyarrow", batch_size=1)

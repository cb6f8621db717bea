"""WARC source: read Common-Crawl-style WARC files into the pages schema
(url, warc_ts, html) — the crawl-native input format, so a user can point
the engine at raw crawl output instead of pre-converted parquet.

Format notes (ISO 28500, the public WARC 1.0/1.1 spec):
- a WARC file is a sequence of records: a header block of CRLF-terminated
  ``Name: value`` lines starting with ``WARC/1.x``, a blank line, exactly
  ``Content-Length`` payload bytes, then CRLF CRLF;
- Common Crawl compresses each record as its own gzip MEMBER so records
  are individually seekable; Python's gzip handles multi-member streams
  transparently, so both per-record-gzip, whole-file-gzip, and plain
  files decode through one path (``.warc`` / ``.warc.gz``);
- only ``WARC-Type: response`` records carry pages; their payload is an
  HTTP response — headers up to the first CRLF CRLF, then the html body.

Scale shape: one Ray task per WARC file (``read_binary_files`` keeps the
file bytes in the object store, parsing is a zero-copy-in scan);
doc_ids are assigned by the same per-file prefix-sum scheme read_pages
uses (a cheap metadata pass counts records per file), so ids are
deterministic at any parallelism."""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)  # handles concatenated members
    return data


def parse_warc_records(data: bytes) -> list[dict]:
    """All records of one WARC file as dicts with ``headers`` (dict,
    lower-cased names) and ``payload`` (bytes)."""
    data = _maybe_gunzip(data)
    out = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record blank lines
        while i < n and data[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            raise ValueError(f"malformed WARC: no version line at {i}")
        hdr_end = data.find(_CRLF2, i)
        if hdr_end < 0:
            raise ValueError("malformed WARC: unterminated header block")
        headers: dict[str, str] = {}
        lines = data[i:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii").lower()] = \
                v.strip().decode("utf-8", "replace")
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        out.append({"headers": headers, "payload": payload})
        i = body_start + length
    return out


def response_rows(data: bytes) -> tuple[list[str], list, list[bytes]]:
    """(urls, warc_ts, htmls) of the response records in one WARC file.
    The HTTP response headers are stripped from each payload; a payload
    that does not look like HTTP is taken as the body verbatim."""
    urls, tss, htmls = [], [], []
    for rec in parse_warc_records(data):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        payload = rec["payload"]
        if payload[:5] in (b"HTTP/",):
            split = payload.find(_CRLF2)
            body = payload[split + 4:] if split >= 0 else payload
        else:
            body = payload
        urls.append(h.get("warc-target-uri", ""))
        ts = h.get("warc-date", "")
        tss.append(np.datetime64(ts.rstrip("Z"), "us") if ts else None)
        htmls.append(body)
    return urls, tss, htmls


def _count_responses(data: bytes) -> int:
    return len(response_rows(data)[0])


def read_warc(paths: list[str], id_base: int = 0):
    """Ray Dataset of (doc_id, url, warc_ts, html) from WARC files.
    doc_id = id_base + prefix-sum(file record counts) + in-file order —
    deterministic and parallelism-invariant (SURVEY §1.2 scheme)."""
    import ray.data

    paths = sorted(paths)

    # metadata pass: records per file (tiny output; one task per file)
    def count_batch(batch: pa.Table) -> pa.Table:
        ns = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                ns.append(_count_responses(f.read()))
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
        t_urls, t_ts, t_html, t_ids = [], [], [], []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                urls, tss, htmls = response_rows(f.read())
            t_urls.extend(urls)
            t_ts.extend(tss)
            t_html.extend(htmls)
            base = bases[p]
            t_ids.extend(range(base, base + len(urls)))
        return pa.table({
            "doc_id": pa.array(t_ids, pa.uint64()),
            "url": pa.array(t_urls, pa.string()),
            "warc_ts": pa.array(t_ts, pa.timestamp("us")),
            "html": pa.array(t_html, pa.binary()),
        })

    return ray.data.from_items(
        [{"path": p} for p in paths]).map_batches(
        parse_batch, batch_format="pyarrow", batch_size=1)

"""Web-corpus normalization operators: URL canonicalization and per-domain
aggregation — the front door of a Common-Crawl-style training-data pipeline
(dedup by canonical url, per-domain quotas/quality gates).

Canonicalization rules (each reproducible in ANSI SQL, so the driver oracle
checks the math, not a reimplementation):

1. scheme and host lowercased
2. a leading ``www.`` label is dropped from the host
3. default ports stripped (``:443`` for https, ``:80`` for http)
4. the fragment is dropped
5. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``); the
   surviving query parameters are byte-wise sorted; an emptied query loses
   its ``?``
6. a single trailing ``/`` is stripped from non-root paths; an empty path
   becomes ``/``

Scale shape: one ``map_batches`` pass; component split is a single Arrow
``extract_regex`` kernel call per batch; only rows that actually carry a
query string pay the per-url parameter sort (bounded, typically a handful
of params). The domain aggregate pre-counts per batch before the (tiny)
``groupby(domain)`` shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
           r"(?P<path>[^?#]*)(?P<query>\?[^#]*)?(?P<frag>#.*)?$")

_TRACKING_EXACT = ("fbclid", "gclid")
_TRACKING_PREFIX = "utm_"


def _canon_query(q: str) -> str:
    """'?b=2&utm_source=x&a=1' -> '?a=1&b=2' ('' when nothing survives)."""
    if not q or q == "?":
        return ""
    parts = [p for p in q[1:].split("&") if p]
    keep = []
    for p in parts:
        key = p.split("=", 1)[0]
        if key.startswith(_TRACKING_PREFIX) or key in _TRACKING_EXACT:
            continue
        keep.append(p)
    if not keep:
        return ""
    keep.sort()
    return "?" + "&".join(keep)


def canonical_url_batch(batch: pa.Table,
                        url_col: str = "url",
                        out_col: str = "canon_url") -> pa.Table:
    """Append the canonical form of ``url_col``. One extract_regex kernel
    pass; scheme/host case-folding and port/fragment handling vectorized;
    the query-parameter sort touches only rows that have a query."""
    col = batch.column(url_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, _URL_RE)
    if ex.null_count == len(ex):
        # nothing parses: pass urls through untouched
        return batch.append_column(out_col, col)
    valid = pc.is_valid(ex).to_numpy(zero_copy_only=False)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme")).to_pylist()
    host = pc.utf8_lower(pc.struct_field(ex, "host")).to_pylist()
    path = pc.struct_field(ex, "path").to_pylist()
    query = pc.struct_field(ex, "query").to_pylist()
    urls = col.to_pylist()
    out = []
    for i, ok in enumerate(valid):
        if not ok:
            out.append(urls[i])  # unparseable: keep verbatim
            continue
        s, h, p, q = scheme[i], host[i], path[i] or "", query[i] or ""
        if h.startswith("www."):
            h = h[4:]
        if (s == "https" and h.endswith(":443")) or \
                (s == "http" and h.endswith(":80")):
            h = h.rsplit(":", 1)[0]
        if not p:
            p = "/"
        elif len(p) > 1 and p.endswith("/"):
            p = p[:-1]
        out.append(f"{s}://{h}{p}{_canon_query(q)}")
    return batch.append_column(out_col, pa.array(out, pa.string()))


def registered_domain_batch(batch: pa.Table,
                            url_col: str = "canon_url") -> pa.Table:
    """Append ``domain`` = last two host labels of the canonical url (a
    public-suffix list would slot in here; two labels is the deterministic,
    SQL-expressible stand-in)."""
    col = batch.column(url_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    hosts = pc.extract_regex(col, r"^[a-z][a-z0-9+.-]*://(?P<h>[^/?#:]*)")
    hs = [(h["h"] if h is not None else "") for h in hosts.to_pylist()]
    doms = [".".join(h.split(".")[-2:]) if h else "" for h in hs]
    return batch.append_column("domain", pa.array(doms, pa.string()))


def synth_messy_urls_batch(batch: pa.Table) -> pa.Table:
    """Deterministic messy url per doc_id (the driver's documents table has
    no url column): scheme/host case noise, www., default ports, tracking
    params, unsorted params, fragments, trailing slashes — every rule of
    the canonicalizer exercised, reconstructible in SQL from doc_id."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    urls = []
    for i in ids:
        scheme = "HTTPS" if i % 5 == 0 else "https"
        host = f"WWW.Site{i % 97}.Example{i % 11}.com" if i % 2 == 0 \
            else f"site{i % 97}.example{i % 11}.com"
        port = ":443" if i % 7 == 0 else ""
        path = f"/Docs/{i}/" if i % 3 == 0 else f"/Docs/{i}"
        query = "?b=2&utm_source=feed&a=1" if i % 2 == 0 else ""
        frag = "#section" if i % 4 == 0 else ""
        urls.append(f"{scheme}://{host}{port}{path}{query}{frag}")
    return batch.append_column("url", pa.array(urls, pa.string()))


def url_canonicalize(ds):
    """(doc_id, url, canon_url) over synthesized messy urls."""
    return ds.map_batches(synth_messy_urls_batch, batch_format="pyarrow") \
        .map_batches(canonical_url_batch, batch_format="pyarrow") \
        .map_batches(lambda b: b.select(["doc_id", "url", "canon_url"]),
                     batch_format="pyarrow")


def domain_stats(ds):
    """(domain, n_docs, sum_chars) per registered domain — the quota/quality
    gate aggregate. Partial counts per batch, then a tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = synth_messy_urls_batch(batch)
        b = canonical_url_batch(b)
        b = registered_domain_batch(b)
        t = pa.table({"domain": b.column("domain"),
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "chars": b.column("n_chars").cast(pa.int64())})
        agg = pa.TableGroupBy(t, "domain").aggregate(
            [("n", "sum"), ("chars", "sum")])
        return pa.table({"domain": agg.column("domain"),
                         "n_part": agg.column("n_sum"),
                         "chars_part": agg.column("chars_sum")})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("domain").aggregate(
        Sum("n_part", alias_name="n_docs"),
        Sum("chars_part", alias_name="sum_chars"))

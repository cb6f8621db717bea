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
    """Append the canonical form of ``url_col``. One extract_regex split,
    then Arrow string kernels end to end for the www./port/slash rules;
    Python touches ONLY the rows that actually carry a query string (the
    parameter drop+sort), so a query-free crawl batch never leaves C."""
    col = batch.column(url_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, _URL_RE)
    if ex.null_count == len(ex):
        # nothing parses: pass urls through untouched
        return batch.append_column(out_col, col)
    valid = pc.is_valid(ex)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    host = pc.replace_substring_regex(host, pattern=r"^www\.",
                                      replacement="")
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, pattern=r":443$", replacement=""),
        host)
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, pattern=r":80$", replacement=""),
        host)
    path = pc.struct_field(ex, "path")
    # empty path -> "/"; one trailing slash stripped from non-root paths
    # ((.)/$ needs a preceding char, so "/" itself is untouched)
    path = pc.if_else(
        pc.equal(path, ""), pa.scalar("/"),
        pc.replace_substring_regex(path, pattern=r"(.)/$",
                                   replacement=r"\1"))
    # query canonicalization: per-url param drop+sort, but only for the
    # rows that have one ("?x..." — len > 1)
    query = pc.struct_field(ex, "query")
    has_q = pc.fill_null(pc.greater(pc.utf8_length(query), 1), False) \
        .to_numpy(zero_copy_only=False)
    q_out = np.full(len(col), "", dtype=object)
    if has_q.any():
        q_np = query.to_numpy(zero_copy_only=False)
        # crawl query strings repeat heavily; canonicalize each distinct
        # value once
        uq, inv = np.unique(q_np[has_q].astype(str), return_inverse=True)
        canon_uq = np.array([_canon_query(q) for q in uq], dtype=object)
        q_out[has_q] = canon_uq[inv]
    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, path,
        pa.array(q_out, pa.string()), "")
    return batch.append_column(
        out_col, pc.if_else(valid, canon, col))


# Two-label public suffixes (a SUBSET of the public-suffix list at
# publicsuffix.org — the high-traffic ccTLD second-level registries a web
# crawl actually hits). A host ending in one of these registers at the
# THIRD label from the right (bbc.co.uk), everything else at the second
# (example.com). Deliberately excluded: wildcard (*.ck) and 3-label
# entries — rare, and each exclusion only coarsens grouping, never
# crashes. Swap in the full list file to widen coverage.
_PSL2 = (
    "co.uk org.uk ac.uk gov.uk net.uk me.uk ltd.uk plc.uk sch.uk "
    "co.jp ne.jp or.jp ac.jp go.jp ad.jp ed.jp gr.jp lg.jp "
    "com.au net.au org.au edu.au gov.au asn.au id.au "
    "com.br net.br org.br gov.br edu.br art.br blog.br "
    "co.in net.in org.in firm.in gen.in ind.in ac.in edu.in gov.in "
    "co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz "
    "com.mx org.mx gob.mx edu.mx net.mx "
    "com.ar net.ar org.ar edu.ar gob.ar "
    "com.cn net.cn org.cn gov.cn edu.cn ac.cn "
    "com.tw org.tw edu.tw gov.tw idv.tw "
    "com.hk org.hk edu.hk gov.hk net.hk "
    "com.sg org.sg edu.sg gov.sg net.sg "
    "com.my org.my edu.my gov.my net.my "
    "com.tr org.tr edu.tr gov.tr net.tr gen.tr web.tr "
    "com.sa org.sa edu.sa gov.sa net.sa med.sa "
    "co.za org.za net.za gov.za edu.za web.za "
    "co.kr or.kr ne.kr re.kr go.kr ac.kr pe.kr "
    "com.eg org.eg edu.eg gov.eg net.eg "
    "com.pk org.pk edu.pk gov.pk net.pk "
    "com.vn org.vn edu.vn gov.vn net.vn "
    "co.th or.th ac.th go.th in.th net.th "
    "co.id or.id ac.id go.id web.id net.id my.id "
    "com.ua org.ua edu.ua gov.ua net.ua in.ua "
    "com.pl net.pl org.pl edu.pl gov.pl waw.pl "
    "co.il org.il net.il gov.il ac.il muni.il "
    "com.ng org.ng edu.ng gov.ng net.ng "
    "co.ke or.ke ac.ke go.ke ne.ke info.ke "
    "com.ph org.ph edu.ph gov.ph net.ph "
    "com.bd org.bd edu.bd gov.bd net.bd ac.bd "
    "com.co org.co edu.co gov.co net.co "
    "com.pe org.pe edu.pe gob.pe net.pe "
    "com.ve org.ve edu.ve gob.ve net.ve co.ve "
    "com.ec org.ec edu.ec gob.ec net.ec "
    "co.ao it.ao og.ao co.mz org.mz co.tz or.tz ac.tz go.tz "
    "com.uy edu.uy gub.uy org.uy net.uy "
    "com.py org.py edu.py gov.py net.py "
    "com.bo org.bo edu.bo gob.bo net.bo "
    "co.cr or.cr ac.cr go.cr "
    "com.do org.do edu.do gob.do net.do "
    "com.gt org.gt edu.gt gob.gt net.gt "
    "com.sv org.sv edu.sv gob.sv "
    "com.ni org.ni edu.ni gob.ni "
    "com.hn org.hn edu.hn gob.hn "
    "com.pa org.pa edu.pa gob.pa "
).split()


def registered_domain_batch(batch: pa.Table,
                            url_col: str = "canon_url") -> pa.Table:
    """Append ``domain`` = the REGISTERED domain of the canonical url's
    host: the last two labels, or the last THREE when the two-label tail
    is a public suffix (the embedded ``_PSL2`` subset of the public-suffix
    list — ``bbc.co.uk``, not ``co.uk``). Fully vectorized: one host
    extract, anchored last-2/last-3 extracts, one ``is_in`` against the
    suffix set, if_else fallbacks."""
    col = batch.column(url_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    hosts = pc.extract_regex(col, r"^[a-z][a-z0-9+.-]*://(?P<h>[^/?#:]*)")
    h = pc.struct_field(hosts, "h")
    two = pc.struct_field(
        pc.extract_regex(h, r"(?P<d>[^.]*\.[^.]+)$"), "d")
    three = pc.struct_field(
        pc.extract_regex(h, r"(?P<d>[^.]*\.[^.]*\.[^.]+)$"), "d")
    is_psl = pc.fill_null(
        pc.is_in(two, value_set=pa.array(_PSL2, pa.string())), False)
    reg = pc.if_else(pc.and_(is_psl, pc.is_valid(three)), three, two)
    dom = pc.if_else(pc.is_valid(reg), reg,
                     pc.if_else(pc.is_valid(h), h, pa.scalar("")))
    return batch.append_column("domain", dom.cast(pa.string()))


def synth_messy_urls_batch(batch: pa.Table) -> pa.Table:
    """Deterministic messy url per doc_id (the driver's documents table has
    no url column): scheme/host case noise, www., default ports, tracking
    params, unsorted params, fragments, trailing slashes — every rule of
    the canonicalizer exercised, reconstructible in SQL from doc_id."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    i_s = pc.cast(pa.array(ids), pa.string())
    a_s = pc.cast(pa.array(ids % 97), pa.string())
    b_s = pc.cast(pa.array(ids % 11), pa.string())

    def _j(*parts):
        return pc.binary_join_element_wise(*parts, "")

    even = pa.array(ids % 2 == 0)
    scheme = pc.if_else(pa.array(ids % 5 == 0),
                        pa.scalar("HTTPS"), pa.scalar("https"))
    # a slice of PSL hosts so the public-suffix rule is oracle-visible:
    # registered domain must come out example{b}.co.uk, not co.uk
    tld = pc.if_else(pa.array(ids % 13 == 5),
                     pa.scalar(".co.uk"), pa.scalar(".com"))
    host = pc.if_else(
        even,
        _j(pa.scalar("WWW.Site"), a_s, pa.scalar(".Example"), b_s, tld),
        _j(pa.scalar("site"), a_s, pa.scalar(".example"), b_s, tld))
    port = pc.if_else(pa.array(ids % 7 == 0),
                      pa.scalar(":443"), pa.scalar(""))
    path = pc.if_else(pa.array(ids % 3 == 0),
                      _j(pa.scalar("/Docs/"), i_s, pa.scalar("/")),
                      _j(pa.scalar("/Docs/"), i_s))
    query = pc.if_else(even, pa.scalar("?b=2&utm_source=feed&a=1"),
                       pa.scalar(""))
    frag = pc.if_else(pa.array(ids % 4 == 0),
                      pa.scalar("#section"), pa.scalar(""))
    url = _j(scheme, pa.scalar("://"), host, port, path, query, frag)
    return batch.append_column("url", url.cast(pa.string()))


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

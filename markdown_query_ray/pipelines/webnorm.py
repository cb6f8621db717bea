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

import os
from functools import lru_cache

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


# Full public-suffix list (publicsuffix.org, MPL 2.0 data file) vendored at
# markdown_query_ray/data/public_suffix_list.dat — the Debian `publicsuffix`
# package's copy. Parsed once per process into per-label-count rule arrays
# (normal / wildcard `*.base` / exception `!rule`); matching follows the
# published algorithm: exception rule prevails, else the longest matching
# rule, else the implicit `*` default (suffix = last label). ICANN section
# only by default (registrar semantics); pass include_private=True for the
# PRIVATE section (github.io-style operator suffixes). Unicode rules are
# kept in their listed (non-punycode) form: unicode hosts match, punycode
# (`xn--`) spellings of those ~450 IDN rules don't — a documented
# coarsening for crawls that store punycode hosts.
_PSL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "public_suffix_list.dat")


@lru_cache(maxsize=2)
def _psl_rules(include_private: bool = False):
    """Parse the vendored list -> (normal, wildcard_base, exception), each
    a dict {label_count: pa.StringArray of rules}. Normal 1-label rules are
    dropped: the implicit `*` default already yields suffix length 1."""
    normal: dict[int, list[str]] = {}
    wild: dict[int, list[str]] = {}
    exc: dict[int, list[str]] = {}
    section = None
    with open(_PSL_PATH, encoding="utf-8") as f:
        for ln in f:
            s = ln.strip()
            if "===BEGIN ICANN DOMAINS===" in s:
                section = "icann"
                continue
            if "===BEGIN PRIVATE DOMAINS===" in s:
                section = "private"
                continue
            if not s or s.startswith("//") or section is None:
                continue
            if section == "private" and not include_private:
                continue
            if s.startswith("!"):
                r = s[1:]
                exc.setdefault(r.count(".") + 1, []).append(r)
            elif s.startswith("*."):
                r = s[2:]
                wild.setdefault(r.count(".") + 1, []).append(r)
            else:
                k = s.count(".") + 1
                if k > 1:
                    normal.setdefault(k, []).append(s)

    def arr(d: dict[int, list[str]]) -> dict[int, pa.Array]:
        return {k: pa.array(v, pa.string()) for k, v in sorted(d.items())}

    return arr(normal), arr(wild), arr(exc)




def _last_k_labels(h, k: int):
    """Arrow array of the last ``k`` dot-separated labels of each host
    (null where the host has fewer than ``k`` labels)."""
    pat = r"(?P<d>" + r"[^.]*\." * (k - 1) + r"[^.]+)$"
    return pc.struct_field(pc.extract_regex(h, pat), "d")


def registered_domain_batch(batch: pa.Table,
                            url_col: str = "canon_url",
                            include_private: bool = False) -> pa.Table:
    """Append ``domain`` = the REGISTERED domain of the canonical url's
    host per the full public-suffix list (vendored; see ``_psl_rules``):
    the public suffix is the prevailing rule's match (exception rule
    first, else longest of normal/wildcard matches, else the implicit
    ``*`` = last label) and the registered domain is that suffix plus one
    label — ``bbc.co.uk``, not ``co.uk``; ``foo.s3.amazonaws.com`` stays
    2-label under ICANN rules unless ``include_private``. Fully
    vectorized: one host extract, one anchored last-k extract + ``is_in``
    per rule width (k <= 4 ICANN), numpy max over the per-width matches,
    if_else selection. Hosts that ARE a bare public suffix (or don't
    parse) fall back to the whole host (grouping-safe)."""
    col = batch.column(url_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    hosts = pc.extract_regex(col, r"^[a-z][a-z0-9+.-]*://(?P<h>[^/?#:]*)")
    h = pc.struct_field(hosts, "h")
    n = len(h)
    normal, wild, exc = _psl_rules(include_private)
    reg_max = max([k + 1 for k in normal] + [kb + 2 for kb in wild]
                  + [k for k in exc] + [2])
    lastk = {k: _last_k_labels(h, k) for k in range(1, reg_max + 1)}

    def matches(k: int, rules) -> np.ndarray:
        return pc.fill_null(pc.is_in(lastk[k], value_set=rules),
                            False).to_numpy(zero_copy_only=False)

    suffix_len = np.ones(n, np.int64)  # implicit `*` default rule
    for k, rules in normal.items():
        m = matches(k, rules)
        np.maximum(suffix_len, np.where(m, k, 0), out=suffix_len)
    for kb, rules in wild.items():
        # `*.base` (base = kb labels) => the suffix spans kb+1 labels of
        # any host that has them; a host equal to the bare base falls
        # through to the default rule
        m = matches(kb, rules) & pc.fill_null(
            pc.is_valid(lastk[kb + 1]), False).to_numpy(
                zero_copy_only=False)
        np.maximum(suffix_len, np.where(m, kb + 1, 0), out=suffix_len)
    reg_len = suffix_len + 1
    for k, rules in exc.items():
        # exception rule prevails: the suffix is the rule minus its left
        # label, so the rule's own match IS the registered domain
        m = matches(k, rules)
        reg_len = np.where(m, k, reg_len)

    dom = pc.if_else(pc.is_valid(h), h, pa.scalar(""))  # fallback: host
    for k in range(1, reg_max + 1):
        sel = pa.array(reg_len == k)
        dom = pc.if_else(pc.and_(sel, pc.is_valid(lastk[k])),
                         lastk[k], dom)
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

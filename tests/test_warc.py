"""WARC source: record parsing, gzip-member handling, deterministic
doc_ids, and the full WARC -> extract -> index path producing ranks
identical to the parquet path over the same corpus."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from markdown_query_ray.fixtures import (
    write_pages_corpus,
    write_warc_corpus,
)
from markdown_query_ray.sources.warc import (
    parse_warc_records,
    read_warc,
    response_rows,
)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("warc")
    pq_paths = write_pages_corpus(str(root / "pq"), n_docs=120, n_files=3)
    warc_gz = write_warc_corpus(str(root / "gz"), n_docs=120, n_files=3)
    warc_plain = write_warc_corpus(str(root / "plain"), n_docs=120,
                                   n_files=3, gzip_members=False)
    return pq_paths, warc_gz, warc_plain


def test_parse_roundtrip_both_encodings(corpora):
    pq_paths, warc_gz, warc_plain = corpora
    want = []
    for p in pq_paths:
        t = pq.read_table(p, columns=["url", "warc_ts", "html"])
        want.extend(zip(t.column("url").to_pylist(),
                        t.column("warc_ts").to_pylist(),
                        t.column("html").to_pylist()))
    for paths in (warc_gz, warc_plain):
        got = []
        for p in paths:
            with open(p, "rb") as f:
                urls, tss, htmls = response_rows(f.read())
            got.extend(zip(urls, tss, htmls))
        assert len(got) == len(want)
        for (gu, gt, gh), (wu, wt, wh) in zip(got, want):
            assert gu == wu
            assert gh == wh
            assert gt.astype("datetime64[us]").item() == wt


def test_non_response_records_skipped(corpora):
    _, warc_gz, _ = corpora
    with open(warc_gz[0], "rb") as f:
        data = f.read()
    import gzip

    extra = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
             b"Content-Length: 4\r\n\r\nmeta\r\n\r\n")
    blob = gzip.compress(extra, mtime=0) + data
    n_all = len(parse_warc_records(blob))
    urls, _, _ = response_rows(blob)
    assert n_all == len(urls) + 1


def test_read_warc_ids_deterministic(ray_session, corpora):
    _, warc_gz, _ = corpora
    ds = read_warc(warc_gz)
    t = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(t["doc_id"]) == list(range(120))
    # ids must be a pure function of (sorted file, in-file order):
    t2 = read_warc(list(reversed(warc_gz))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(t2["url"]) == list(t["url"])


def test_warc_index_rank_identical_to_parquet_path(ray_session, corpora,
                                                   tmp_path):
    from markdown_query_ray.config import BM25Params, IndexConfig, QueryConfig
    from markdown_query_ray.index.build import build_index
    from markdown_query_ray.query import executor as qx
    from markdown_query_ray.query.compiler import parse_user_query

    pq_paths, warc_gz, _ = corpora
    cfg = IndexConfig(tokenizer="xapian", stem=True, num_term_parts=4,
                      num_doc_buckets=2, block_size=64)
    a = str(tmp_path / "from_warc")
    b = str(tmp_path / "from_parquet")
    build_index(a, dataset=read_warc(warc_gz), cfg=cfg, total_docs=120)
    build_index(b, paths=pq_paths, cfg=cfg)
    qcfg = QueryConfig(k=50, params=BM25Params.xapian())
    for q in ("the fast", "the AND fast", "fast craft mountain"):
        ra = qx.search(a, parse_user_query(q), qcfg, distributed=False)
        rb = qx.search(b, parse_user_query(q), qcfg, distributed=False)
        assert ra.column("doc_id").to_pylist() == \
            rb.column("doc_id").to_pylist(), q
        assert np.allclose(ra.column("score").to_numpy(),
                           rb.column("score").to_numpy(), rtol=1e-12), q


def test_warc_parse_roundtrip_property():
    """Random record payloads (incl. CRLF-looking bytes, empty bodies,
    binary) survive the write -> parse round trip in both encodings."""
    import gzip

    from hypothesis import given, settings
    from hypothesis import strategies as st

    payload = st.binary(min_size=0, max_size=200)
    urls = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1, max_size=40)

    @settings(max_examples=60, deadline=None)
    @given(recs=st.lists(st.tuples(urls, payload), min_size=0, max_size=6),
           gz=st.booleans())
    def run(recs, gz):
        blob = b""
        for u, body in recs:
            http = b"HTTP/1.1 200 OK\r\n\r\n" + body
            rec = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                   f"WARC-Target-URI: {u}\r\n"
                   f"WARC-Date: 2025-01-01T00:00:00Z\r\n"
                   f"Content-Length: {len(http)}\r\n\r\n"
                   ).encode() + http + b"\r\n\r\n"
            blob += gzip.compress(rec, mtime=0) if gz else rec
        got_urls, _, got_bodies = response_rows(blob)
        assert got_urls == [u for u, _ in recs]
        assert got_bodies == [b for _, b in recs]

    run()

"""JSONL source: field mapping, gzip handling, deterministic ids, and
index-path equivalence with the parquet pages corpus."""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from markdown_query_ray.fixtures import write_pages_corpus
from markdown_query_ray.sources.jsonl import read_jsonl
from markdown_query_ray.stages.extract import extract_text


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """pages parquet + the same docs as .jsonl and .jsonl.gz (text =
    extracted page text, matching what the parquet path indexes)."""
    root = tmp_path_factory.mktemp("jsonl")
    pq_paths = write_pages_corpus(str(root / "pq"), n_docs=90, n_files=3)
    jl_plain, jl_gz = [], []
    for i, p in enumerate(pq_paths):
        t = pq.read_table(p, columns=["url", "warc_ts", "html"])
        lines = []
        for u, ts, h in zip(t.column("url").to_pylist(),
                            t.column("warc_ts").to_pylist(),
                            t.column("html").to_pylist()):
            lines.append(json.dumps({
                "url": u, "ts": ts.isoformat(),
                "text": extract_text(h)}))
        blob = ("\n".join(lines) + "\n").encode()
        pp = str(root / f"part-{i:03d}.jsonl")
        gp = str(root / f"part-{i:03d}.jsonl.gz")
        with open(pp, "wb") as f:
            f.write(blob)
        with open(gp, "wb") as f:
            f.write(gzip.compress(blob, mtime=0))
        jl_plain.append(pp)
        jl_gz.append(gp)
    return pq_paths, jl_plain, jl_gz


def test_parse_plain_and_gz_equal(ray_session, corpora):
    _, jl_plain, jl_gz = corpora
    a = read_jsonl(jl_plain).to_pandas().sort_values("doc_id")
    b = read_jsonl(jl_gz).to_pandas().sort_values("doc_id")
    assert list(a["doc_id"]) == list(range(90))
    assert list(a["url"]) == list(b["url"])
    assert list(a["text"]) == list(b["text"])


def test_missing_url_synthesized(ray_session, tmp_path):
    p = str(tmp_path / "x.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"text": "hello"}) + "\n")
        f.write(json.dumps({"text": "world", "url": "u://1"}) + "\n")
    t = read_jsonl([p]).to_pandas().sort_values("doc_id")
    assert t["url"].iloc[0] == f"jsonl://{p}#0"
    assert t["url"].iloc[1] == "u://1"


def test_jsonl_index_rank_identical_to_parquet_path(ray_session, corpora,
                                                    tmp_path):
    from markdown_query_ray.config import BM25Params, IndexConfig, QueryConfig
    from markdown_query_ray.index.build import build_index
    from markdown_query_ray.query import executor as qx
    from markdown_query_ray.query.compiler import parse_user_query

    pq_paths, _, jl_gz = corpora
    cfg = IndexConfig(tokenizer="xapian", stem=True, num_term_parts=4,
                      num_doc_buckets=2, block_size=64)
    a = str(tmp_path / "from_jsonl")
    b = str(tmp_path / "from_parquet")
    build_index(a, dataset=read_jsonl(jl_gz), cfg=cfg, total_docs=90)
    build_index(b, paths=pq_paths, cfg=cfg)
    qcfg = QueryConfig(k=50, params=BM25Params.xapian())
    for q in ("the fast", "fast craft mountain"):
        ra = qx.search(a, parse_user_query(q), qcfg, distributed=False)
        rb = qx.search(b, parse_user_query(q), qcfg, distributed=False)
        assert ra.column("doc_id").to_pylist() == \
            rb.column("doc_id").to_pylist(), q
        assert np.allclose(ra.column("score").to_numpy(),
                           rb.column("score").to_numpy(), rtol=1e-12), q

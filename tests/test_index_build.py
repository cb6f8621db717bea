"""End-to-end index build correctness: docid determinism, posting/statistics
parity with the sequential oracle, resumability."""

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from markdown_query_ray.config import IndexConfig
from markdown_query_ray.index.build import build_index, term_part
from markdown_query_ray.index.codec import decode_blocks
from markdown_query_ray.index.reader import IndexReader

from .oracle import OracleIndex


@pytest.fixture(scope="module")
def oracle(pages_corpus):
    return OracleIndex(pages_corpus)


def test_global_stats(built_index, oracle):
    _, _, gstats = built_index
    assert gstats["n_docs"] == oracle.n_docs == 400
    assert gstats["avg_doclen"] == pytest.approx(oracle.avg_doclen)
    assert gstats["doclen_lb"] == min(oracle.doclen.values())
    assert gstats["doclen_ub"] == max(oracle.doclen.values())


def test_doclens_match_oracle(built_index, oracle):
    # tokenized/ doubles as the docs table (column-pruned reads)
    index_dir, _, _ = built_index
    docs = pq.read_table(os.path.join(index_dir, "tokenized"),
                         columns=["doc_id", "doclen"])
    got = dict(zip(docs.column("doc_id").to_pylist(),
                   docs.column("doclen").to_pylist()))
    assert got == oracle.doclen


def test_urls_and_docids_deterministic(built_index, oracle):
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    urls = reader.urls_for(list(range(0, 400, 37)))
    for d, u in urls.items():
        assert oracle.urls[d] == u


def test_term_stats_match_oracle(built_index, oracle):
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    probe = ["the", "Zthe", "xqzrareuno", "xqzrareduo", "xqzraretri",
             "at&t", "c++", "uncle"]
    stats = reader.term_stats(probe)
    for t in probe:
        odocs = oracle.postings.get(t, {})
        if not odocs:
            assert t not in stats, t
            continue
        assert stats[t]["termfreq"] == len(odocs), t
        assert stats[t]["collfreq"] == sum(odocs.values()), t
        assert stats[t]["wdf_ub"] == max(odocs.values()), t


def test_planted_rare_terms(built_index):
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    stats = reader.term_stats(["xqzrareuno", "xqzrareduo", "xqzraretri"])
    assert stats["xqzrareuno"]["termfreq"] == 1
    assert stats["xqzrareduo"]["termfreq"] == 2
    assert stats["xqzraretri"]["termfreq"] == 3


def test_postings_decode_match_oracle(built_index, oracle):
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    for term in ["the", "Zthe", "xqzraretri", "uncle"]:
        blocks = reader.load_blocks([term])
        ids, tfs, dls, _ = decode_blocks(blocks)
        expect = sorted(oracle.postings.get(term, {}).items())
        assert ids.tolist() == [d for d, _ in expect], term
        assert tfs.tolist() == [tf for _, tf in expect], term
        assert dls.tolist() == [oracle.doclen[d] for d, _ in expect], term


def test_salted_shuffle_layout(built_index):
    """Heavy terms must be split across S doc-bucket files; blocks within a
    term must be doc-ordered and disjoint after concatenation."""
    index_dir, cfg, _ = built_index
    part = term_part("the", cfg.num_term_parts)
    files = [
        f"part-{part * cfg.num_doc_buckets + b:06d}.parquet"
        for b in range(cfg.num_doc_buckets)]
    found = []
    for f in files:
        p = os.path.join(index_dir, "postings", f)
        if os.path.exists(p):
            t = pq.read_table(p, filters=[("term", "==", "the")])
            if len(t):
                found.append(t)
    assert len(found) == cfg.num_doc_buckets  # "the" appears in every bucket
    reader = IndexReader(index_dir)
    blocks = reader.load_blocks(["the"])
    ids, _, _, _ = decode_blocks(blocks)
    assert (np.diff(ids.astype(np.int64)) > 0).all()  # strictly increasing


def test_resume_skips_completed_partitions(ray_session, pages_corpus,
                                           tmp_path):
    """Second build over an existing output dir must reuse every partition
    (resumed=True) and leave files byte-identical."""
    out = str(tmp_path / "idx")
    cfg = IndexConfig(num_term_parts=2, num_doc_buckets=2)
    build_index(out, paths=pages_corpus, cfg=cfg)
    before = {p: open(p, "rb").read()
              for p in glob.glob(os.path.join(out, "postings", "*.parquet"))}
    build_index(out, paths=pages_corpus, cfg=cfg)
    man = [json.loads(line) for line in open(os.path.join(out,
                                                          "_manifest.jsonl"))]
    assert man and all(r["resumed"] for r in man)
    after = {p: open(p, "rb").read()
             for p in glob.glob(os.path.join(out, "postings", "*.parquet"))}
    assert before == after


def test_parallelism_invariance(ray_session, pages_corpus, tmp_path,
                                built_index, oracle):
    """A build with different partitioning (P=2, S=1 vs P=4, S=2) decodes to
    identical posting lists — the docid prefix-sum + deterministic encode
    make the index content partitioning-invariant."""
    out = str(tmp_path / "idx2")
    cfg = IndexConfig(num_term_parts=2, num_doc_buckets=1, block_size=32)
    build_index(out, paths=pages_corpus, cfg=cfg)
    r2 = IndexReader(out)
    r1 = IndexReader(built_index[0])
    for term in ["the", "Zthe", "xqzraretri"]:
        a = decode_blocks(r1.load_blocks([term]))
        b = decode_blocks(r2.load_blocks([term]))
        assert a[0].tolist() == b[0].tolist()
        assert a[1].tolist() == b[1].tolist()
        assert a[2].tolist() == b[2].tolist()


def test_bitpack_codec_equivalent(ray_session, pages_corpus, tmp_path,
                                  built_index):
    """An index built with codec="bitpack" must decode to identical posting
    lists and return identical search results (ranks AND scores) as the
    varint index over the same corpus."""
    out = str(tmp_path / "idx_bp")
    cfg = IndexConfig(num_term_parts=4, num_doc_buckets=2, block_size=32,
                      codec="bitpack")
    gstats = build_index(out, paths=pages_corpus, cfg=cfg)
    assert gstats["codec"] == "bitpack"
    rb = IndexReader(out)
    rv = IndexReader(built_index[0])
    for term in ["the", "Zthe", "xqzraretri", "uncle"]:
        a = decode_blocks(rv.load_blocks([term]), codec="varint")
        b = decode_blocks(rb.load_blocks([term]), codec="bitpack")
        for x, y in zip(a[:3], b[:3]):
            assert x.tolist() == y.tolist()
    assert rb.first_wdf(["the", "xqzraretri"]) == \
        rv.first_wdf(["the", "xqzraretri"])
    from markdown_query_ray.config import BM25Params, QueryConfig
    from markdown_query_ray.query import executor as qx
    from markdown_query_ray.query.compiler import parse_user_query

    qc = QueryConfig(k=20, params=BM25Params.xapian(), use_wand=True)
    for q in ["the quick merge", "merge AND sort", "xqzraretri"]:
        hv = qx.search(built_index[0], parse_user_query(q), qc)
        hb = qx.search(out, parse_user_query(q), qc)
        assert hv.column("doc_id").to_pylist() == \
            hb.column("doc_id").to_pylist(), q
        assert hv.column("score").to_pylist() == \
            pytest.approx(hb.column("score").to_pylist(), rel=1e-12), q


def test_staging_partial_write_cleared(ray_session, pages_corpus, tmp_path):
    """A crash mid-staging-write (parquet files present, no _SUCCESS) must
    NOT double the corpus on re-run: the rebuild clears stale staging
    output before re-tokenizing (Ray names output files per run, so a
    plain rewrite would leave both generations in the directory)."""
    import shutil

    from markdown_query_ray.config import IndexConfig
    from markdown_query_ray.index.build import build_index

    out = str(tmp_path / "idx")
    cfg = IndexConfig(num_term_parts=2, num_doc_buckets=1)
    g1 = build_index(out, paths=pages_corpus, cfg=cfg)
    # simulate the crash: staging files exist but the success marker and
    # downstream outputs do not
    os.remove(os.path.join(out, "tokenized", "_SUCCESS"))
    shutil.rmtree(os.path.join(out, "postings"))
    shutil.rmtree(os.path.join(out, "term_stats_parts"))
    shutil.rmtree(os.path.join(out, "term_stats"))
    g2 = build_index(out, paths=pages_corpus, cfg=cfg)
    assert g2["n_docs"] == g1["n_docs"]
    assert g2["total_doclen"] == g1["total_doclen"]


def test_staging_checkpoint_resume(ray_session, pages_corpus, tmp_path):
    """The tokenized/ staging checkpoint survives a lost shuffle output:
    deleting the postings tree and rebuilding skips extract+tokenize
    entirely (no _SUCCESS re-write) and re-encodes from staging."""
    import shutil

    from markdown_query_ray.config import IndexConfig
    from markdown_query_ray.index.build import build_index

    out = str(tmp_path / "idx")
    cfg = IndexConfig(num_term_parts=2, num_doc_buckets=1)
    build_index(out, paths=pages_corpus, cfg=cfg)
    tok_mtime = os.path.getmtime(os.path.join(out, "tokenized", "_SUCCESS"))
    shutil.rmtree(os.path.join(out, "postings"))
    shutil.rmtree(os.path.join(out, "term_stats_parts"))
    shutil.rmtree(os.path.join(out, "term_stats"))
    g = build_index(out, paths=pages_corpus, cfg=cfg)
    assert os.path.getmtime(
        os.path.join(out, "tokenized", "_SUCCESS")) == tok_mtime
    assert g["stage_metrics"]["extract_tokenize"] < 0.5  # skipped
    assert os.path.isdir(os.path.join(out, "postings"))


def test_bitpack_partial_codec_identical_index(ray_session, pages_corpus,
                                               tmp_path, built_index):
    """partial_codec="bitpack" changes only the merge-shuffle payload
    encoding; the resulting index must be POSTING-IDENTICAL to the varint
    partials build (same final blocks, same stats, same searches)."""
    out = str(tmp_path / "idx_bpp")
    cfg = IndexConfig(num_term_parts=4, num_doc_buckets=2, block_size=32,
                      partial_codec="bitpack")
    gstats = build_index(out, paths=pages_corpus, cfg=cfg)
    base_dir, base_cfg, base_g = built_index
    assert gstats["n_docs"] == base_g["n_docs"]
    assert gstats["total_doclen"] == base_g["total_doclen"]
    rb = IndexReader(out)
    rv = IndexReader(base_dir)
    for term in ["the", "Zthe", "xqzraretri", "uncle"]:
        a = decode_blocks(rv.load_blocks([term]))
        b = decode_blocks(rb.load_blocks([term]))
        for x, y in zip(a[:3], b[:3]):
            assert x.tolist() == y.tolist(), term
        assert rv.term_stats([term]) == rb.term_stats([term])
    from markdown_query_ray.config import BM25Params, QueryConfig
    from markdown_query_ray.query import executor as qx
    from markdown_query_ray.query.compiler import parse_user_query

    qc = QueryConfig(k=20, params=BM25Params.xapian(), use_wand=True)
    for q in ["the quick merge", "merge AND sort", "xqzraretri"]:
        hv = qx.search(base_dir, parse_user_query(q), qc)
        hb = qx.search(out, parse_user_query(q), qc)
        assert hv.column("doc_id").to_pylist() == \
            hb.column("doc_id").to_pylist(), q
        assert hv.column("score").to_pylist() == \
            pytest.approx(hb.column("score").to_pylist(), rel=1e-12), q

"""Robustness: empty inputs, missing terms, degenerate configs, and
error surfaces behave sanely (the reference logs-and-continues on bad
input, src/main.rs:101-106 — the rebuild should never be flakier)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from markdown_query_ray.config import BM25Params, IndexConfig, QueryConfig
from markdown_query_ray.index.build import build_index
from markdown_query_ray.query import executor as qx
from markdown_query_ray.query.ast import And, Or, Phrase, Term, Wildcard
from markdown_query_ray.query.compiler import MatchNothing, parse_user_query


@pytest.fixture(scope="module")
def tiny_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("tiny") / "idx")
    t = pa.table({
        "url": pa.array(["u0", "u1", "u2"]),
        "text": pa.array(["alpha beta", "", "alpha gamma delta"]),
        "doc_id": pa.array(np.arange(3, dtype=np.uint64)),
    })
    cfg = IndexConfig(tokenizer="simple", stem=False, num_term_parts=2,
                      num_doc_buckets=1, positions=True)
    build_index(out, dataset=ray.data.from_arrow(t), cfg=cfg, total_docs=3)
    return out


def test_empty_document_indexed(tiny_index):
    """A zero-token document exists (doclen 0) but matches nothing."""
    from markdown_query_ray.index.reader import IndexReader

    r = IndexReader(tiny_index)
    assert r.n_docs == 3
    assert r.doclen_lb == 0


def test_missing_term_queries(tiny_index):
    qcfg = QueryConfig(k=10)
    for node in [Term("zzz"), Or((Term("zzz"), Term("yyy"))),
                 And((Term("alpha"), Term("zzz"))),
                 Phrase(("zzz", "alpha"), window=2),
                 Wildcard("zzz")]:
        out = qx.search(tiny_index, node, qcfg, distributed=False)
        assert len(out) == 0


def test_empty_and_whitespace_queries(tiny_index):
    assert isinstance(parse_user_query(""), MatchNothing)
    assert isinstance(parse_user_query("   "), MatchNothing)
    assert isinstance(parse_user_query('""'), MatchNothing)
    out = qx.search(tiny_index, MatchNothing(), QueryConfig(k=10),
                    distributed=False)
    assert len(out) == 0


def test_operator_only_queries(tiny_index):
    # operators with empty sides must not crash
    for q in ["AND", "alpha AND", "AND alpha", "OR OR OR",
              "alpha AND NOT", "PHRASE"]:
        node = parse_user_query(q)
        out = qx.search(tiny_index, node, QueryConfig(k=10),
                        distributed=False)
        assert len(out) >= 0


def test_single_doc_single_term_index(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "one")
    t = pa.table({
        "url": pa.array(["u"]),
        "text": pa.array(["solo"]),
        "doc_id": pa.array([0], pa.uint64()),
    })
    cfg = IndexConfig(tokenizer="simple", stem=False, num_term_parts=1,
                      num_doc_buckets=1)
    build_index(out, dataset=ray.data.from_arrow(t), cfg=cfg, total_docs=1)
    hits = qx.search(out, Term("solo"), QueryConfig(k=5), distributed=False)
    assert hits.column("doc_id").to_pylist() == [0]
    # idf floor keeps the single-doc score finite and positive
    assert hits.column("score")[0].as_py() > 0


def test_k_larger_than_corpus(tiny_index):
    out = qx.search(tiny_index, Term("alpha"),
                    QueryConfig(k=10_000), distributed=False)
    assert len(out) == 2


def test_query_longer_than_depth_cap(tiny_index):
    from markdown_query_ray.query.compiler import QueryError

    q = " AND ".join(["alpha"] * 60)
    with pytest.raises(QueryError):
        parse_user_query(q)


def test_wqf_repeated_terms(tiny_index):
    """Repeated tokens OR-join as separate children (mdq parses each
    individually) — the score doubles rather than erroring."""
    one = qx.search(tiny_index, parse_user_query("alpha"),
                    QueryConfig(k=5, params=BM25Params.xapian()),
                    distributed=False)
    two = qx.search(tiny_index, parse_user_query("alpha alpha"),
                    QueryConfig(k=5, params=BM25Params.xapian()),
                    distributed=False)
    assert two.column("score")[0].as_py() == \
        pytest.approx(2 * one.column("score")[0].as_py())


def test_reader_missing_dir_raises(tmp_path):
    from markdown_query_ray.index.reader import IndexReader

    with pytest.raises(FileNotFoundError):
        IndexReader(str(tmp_path / "nope"))


def test_boolean_terms_lookup_and_facet(ray_session, tmp_path):
    """Q<url> id terms and L<lang> facet terms: wdf 0 -> score 0, absent
    from doclen, usable for exact lookup and FILTER facets."""
    import ray.data

    from markdown_query_ray.index.reader import IndexReader
    from markdown_query_ray.query.ast import Filter

    out = str(tmp_path / "bool")
    t = pa.table({
        "url": pa.array(["u0", "u1", "u2"]),
        "text": pa.array(["alpha beta", "alpha", "alpha beta gamma"]),
        "lang": pa.array(["en", "de", "en"]),
        "doc_id": pa.array(np.arange(3, dtype=np.uint64)),
    })
    cfg = IndexConfig(tokenizer="simple", stem=False, num_term_parts=2,
                      num_doc_buckets=1)
    build_index(out, dataset=ray.data.from_arrow(t), cfg=cfg, total_docs=3)

    # exact lookup by id term
    hits = qx.search(out, Term("Qu1"), QueryConfig(k=5), distributed=False)
    assert hits.column("doc_id").to_pylist() == [1]
    assert hits.column("score")[0].as_py() == 0.0

    # facet filter: alpha restricted to lang=en
    hits = qx.search(out, Filter(Term("alpha"), Term("Len")),
                     QueryConfig(k=5), distributed=False)
    assert set(hits.column("doc_id").to_pylist()) == {0, 2}

    # doclen unaffected by boolean terms (u1: one token)
    r = IndexReader(out)
    st = r.term_stats(["Qu1", "Len"])
    assert st["Qu1"]["termfreq"] == 1 and st["Qu1"]["collfreq"] == 0
    assert st["Len"]["termfreq"] == 2
    assert r.gstats["total_doclen"] == 6  # 2 + 1 + 3 body tokens only


def test_tumbling_counts_survives_empty_blocks(ray_session):
    """Ray Data legitimately emits empty blocks; the window partials must
    produce a TYPED empty table (a pandas round-trip would type the empty
    event_type column null and clash with string blocks at the groupby)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from markdown_query_ray.pipelines.windows import tumbling_counts

    ts = pa.array(np.array([0, 600, 3900], dtype="datetime64[s]").astype(
        "datetime64[us]"))
    full = pa.table({
        "ts": ts,
        "event_type": pa.array(["a", "a", "b"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    empty = full.slice(0, 0)
    ds = ray.data.from_arrow([empty, full, empty])
    out = tumbling_counts(ds, minutes=60).to_pandas()
    got = {(r.event_type, r.n_events, r.sum_value)
           for r in out.itertuples()}
    assert got == {("a", 2, 3.0), ("b", 1, 3.0)}

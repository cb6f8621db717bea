"""Markdown source end-to-end: frontmatter parsing/coercions and the
field-prefix index build (title:/author:/tag: queries actually match)."""

from __future__ import annotations

import os

import pytest

from markdown_query_ray.config import BM25Params, IndexConfig, QueryConfig
from markdown_query_ray.sources.markdown import (
    build_markdown_index,
    parse_markdown_doc,
    split_frontmatter,
)

DOCS = {
    "alpha.md": """---
title: Alpha merge notes
subtitle: fast sorting
author: ada
tags: [query, index]
date: 2024-03-01T00:00:00+00:00
---
body about merge strategies and windows
""",
    "beta.md": """---
title: Beta windows
authors: [bob, carol]
tag: query
date: 1709251200
---
body about sorting only
""",
    "gamma.md": """---
title: Gamma
date: 2024-03-01T12:00:00+00:00
---
merge appears only in the body here
""",
    "nofront.md": "no frontmatter at all\n",
    "notitle.md": "---\ndate: 1709251200\n---\nbody\n",
    ".hidden.md": "---\ntitle: H\ndate: 1709251200\n---\nsecret\n",
}


@pytest.fixture(scope="module")
def md_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("md")
    for name, content in DOCS.items():
        (d / name).write_text(content)
    return str(d)


@pytest.fixture(scope="module")
def md_index(ray_session, md_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mdidx") / "idx")
    paths = sorted(os.path.join(md_dir, n) for n in DOCS
                   if n.endswith(".md") and not n.startswith(".")
                   and n not in ("nofront.md",))
    cfg = IndexConfig(num_term_parts=4, num_doc_buckets=1, positions=True,
                      store_payload=True)
    gstats = build_markdown_index(out, paths, cfg)
    return out, paths, gstats


def _ids(table):
    return set(table.column("doc_id").to_pylist())


def _doc_rank(paths, name):
    return sorted(paths).index(
        next(p for p in paths if p.endswith(name)))


def test_parse_coercions():
    d = parse_markdown_doc("x.md", DOCS["alpha.md"])
    assert d["title"] == "Alpha merge notes"
    assert d["authors"] == ["ada"] and d["tags"] == ["query", "index"]
    assert d["date"] == 1709251200
    b = parse_markdown_doc("y.md", DOCS["beta.md"])
    assert b["authors"] == ["bob", "carol"] and b["tags"] == ["query"]
    assert b["date"] == 1709251200
    assert parse_markdown_doc("z.md", DOCS["nofront.md"]) is None
    assert parse_markdown_doc("w.md", DOCS["notitle.md"]) is None
    assert split_frontmatter("no") is None


def test_invalid_docs_dropped(md_index):
    _, paths, gstats = md_index
    # notitle.md parses to None; only alpha/beta/gamma survive
    assert gstats["n_docs"] == 3


def test_title_field_query(md_index):
    from markdown_query_ray.query.session import SearchSession

    idx, paths, _ = md_index
    s = SearchSession(idx, QueryConfig(k=10, params=BM25Params.xapian()))
    # 'merge' in title only for alpha; gamma has it in body only
    hits = s.search("title:merge")
    assert _ids(hits) == {_doc_rank(paths, "alpha.md")}
    # free-text query reaches bodies (gamma) AND the S-prefixed title term
    # does not leak into the unprefixed body postings
    body = s.search("merge")
    assert _doc_rank(paths, "gamma.md") in _ids(body)


def test_author_and_tag_queries(md_index):
    from markdown_query_ray.query.session import SearchSession

    idx, paths, _ = md_index
    s = SearchSession(idx, QueryConfig(k=10, params=BM25Params.xapian()))
    assert _ids(s.search("author:carol")) == {_doc_rank(paths, "beta.md")}
    both = {_doc_rank(paths, "alpha.md"), _doc_rank(paths, "beta.md")}
    assert _ids(s.search("tag:query")) == both
    assert _ids(s.search("author:ada")) == {_doc_rank(paths, "alpha.md")}


def test_date_term_indexed(md_index):
    """mdq indexes the RFC3339 rendering of the date (src/date.rs:23-34):
    2024-03-01T00:00:00+00:00 tokenizes to D2024 / D03 / D01t00 / D00."""
    from markdown_query_ray.query.ast import Term
    from markdown_query_ray.query.session import SearchSession

    idx, paths, _ = md_index
    s = SearchSession(idx, QueryConfig(k=10, params=BM25Params.xapian()))
    all3 = {_doc_rank(paths, n) for n in ("alpha.md", "beta.md", "gamma.md")}
    assert _ids(s.search_node(Term("D2024"))) == all3
    # hour-bearing token separates gamma (12:00) from alpha/beta (00:00)
    assert _ids(s.search_node(Term("D01t00"))) == \
        {_doc_rank(paths, "alpha.md"), _doc_rank(paths, "beta.md")}
    assert _ids(s.search_node(Term("D01t12"))) == \
        {_doc_rank(paths, "gamma.md")}


def test_cross_field_phrase_positions(md_index):
    """Positions continue across fields: the last title token and the first
    subtitle token of alpha.md are adjacent in the shared position stream
    ('notes' then 'fast' with prefixes S/XS; body tokens follow)."""
    from markdown_query_ray.query.ast import Phrase
    from markdown_query_ray.query.session import SearchSession

    idx, paths, _ = md_index
    s = SearchSession(idx, QueryConfig(k=10, params=BM25Params.xapian()))
    hits = s.search_node(Phrase(("body", "about", "merge"), window=3))
    assert _ids(hits) == {_doc_rank(paths, "alpha.md")}


def test_payload_storage_and_preview(md_index):
    """The Document::set_data analog: Storage-mode JSON payloads retrieve
    per hit (xapian_utils.rs:670-684) and drive the TUI-style preview."""
    import json

    from markdown_query_ray.query.session import SearchSession

    idx, paths, _ = md_index
    s = SearchSession(idx, QueryConfig(k=10, params=BM25Params.xapian()))
    alpha = _doc_rank(paths, "alpha.md")
    docs = s.get_documents([alpha])
    payload = json.loads(docs[alpha])
    assert payload["title"] == "Alpha merge notes"
    assert payload["authors"] == ["ada"]
    assert payload["tags"] == ["query", "index"]
    assert payload["date"] == 1709251200
    assert "merge strategies" in payload["body"]
    # preview centers on the first query-term hit in the body
    pv = s.preview(alpha, "strategies")
    assert pv is not None and "strategies" in pv
    # positionless/payloadless doc_id -> None
    assert s.preview(999999) is None


def test_doclen_counts_prefixed_and_stems(md_index):
    """Xapian doclen = sum wdf over ALL terms incl. prefixed + Z-stems
    (glass_database.cc:1121-1131)."""
    import json

    idx, _, gstats = md_index
    assert gstats["n_docs"] == 3
    with open(os.path.join(idx, "global_stats.json")) as f:
        g = json.load(f)
    # each body token contributes ~2 (unstemmed + Z-stem) plus field terms:
    # doclen must exceed the raw token counts by a wide margin
    assert g["total_doclen"] > 3 * 10


def test_invalid_counter_and_null_subtitle():
    """Non-numeric weight drops the one file (never fails the batch task);
    a present-but-null subtitle stays empty instead of the string 'None'."""
    bad = "---\ntitle: t\ndate: 5\nweight: heavy\n---\nbody"
    assert parse_markdown_doc("a.md", bad) is None
    nulled = "---\ntitle: t\ndate: 5\nsubtitle:\n---\nbody"
    d = parse_markdown_doc("b.md", nulled)
    assert d is not None and d["subtitle"] == ""


def test_build_markdown_index_accepts_directory(ray_session, tmp_path):
    """read_markdown supports directory discovery; doc_id assignment must
    cover the discovered files, not KeyError on them."""
    from markdown_query_ray.config import QueryConfig
    from markdown_query_ray.query import executor as qx
    from markdown_query_ray.query.ast import Term

    d = tmp_path / "docs"
    d.mkdir()
    for name in ("alpha.md", "beta.md"):
        (d / name).write_text(DOCS[name])
    out = str(tmp_path / "idx")
    gstats = build_markdown_index(out, [str(d)])
    assert gstats["n_docs"] == 2
    hits = qx.search(out, Term("Zmerg"), QueryConfig(k=10),
                     distributed=False)
    assert len(hits) >= 1
